"""Theory-tooling tests: braking deceleration against analytic cases, the
polynomial surrogate pipeline, and r_tilde properties."""

import numpy as np
import pytest

from sdf_nmpc_tpu.math import GRAVITY, polynomial_3variate
from sdf_nmpc_tpu.theory import (
    fit_poly,
    get_r_tilde_max,
    max_braking_accel,
    min_braking_accel,
    r_tilde_value,
)


def test_max_braking_accel_analytic(cfg):
    """For horizontal velocity +x the max deceleration is g*tan(pitch_max)
    (tilt fully, thrust balancing gravity); for downward velocity (-z) it is
    gamma_max - g (full thrust up)."""
    lim = cfg.robot.limits
    dirs = np.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, -1.0]])
    amax = max_braking_accel(dirs, cfg)
    np.testing.assert_allclose(amax[0], GRAVITY * np.tan(lim.pitch), rtol=0.05)
    np.testing.assert_allclose(amax[1], GRAVITY * np.tan(lim.roll), rtol=0.05)
    np.testing.assert_allclose(amax[2], lim.gamma - GRAVITY, rtol=0.05)


def test_braking_poly_pipeline(cfg):
    """Small grid -> poly fit -> surrogate reproduces bdist reasonably."""
    from sdf_nmpc_tpu.theory.braking import braking_grid, eval_surrogate

    vel, bdist, amax = braking_grid(cfg, vmax=2.0, step=0.5)
    assert (amax > 0).all()
    a_min = min_braking_accel(vel, bdist)
    assert 0 < a_min < cfg.robot.limits.gamma
    coeffs = fit_poly(vel, bdist, degree=4)
    assert coeffs.shape == (35,)
    poly, _ = polynomial_3variate(4, coeffs)
    rmse, max_err = eval_surrogate(poly, vel, bdist)
    assert rmse < 0.08, f"poly surrogate rmse {rmse}"


def test_r_tilde_closed_form():
    """At hover (T=g, angles 0) r_tilde -> num/denom -> 0/0 handled; away from
    hover the closed form is positive and finite."""
    v = float(
        r_tilde_value(
            np.array(12.0), np.array(0.3), np.array(-0.2), g=9.81, dt=0.075,
            r1=0.05, r2=50.0, r3=50.0,
        )
    )
    assert np.isfinite(v) and v > 0


def test_get_r_tilde_max_deterministic(cfg):
    a = get_r_tilde_max(cfg)
    b = get_r_tilde_max(cfg)
    assert a == b  # deterministic (reference used a random SLSQP start)
    assert np.isfinite(a) and a > 0
