"""Riccati (stage-wise) QP backend: equivalence against the condensed backend
and long-horizon operation.

The condensed backend is validated against direct-NLP oracles elsewhere
(test_qp.py, test_sqp.py); here the stage-structured solve must reproduce it —
both backends solve the SAME barrier-smoothed QP, so at a converged iteration
budget in f64 their RTI steps agree to tight tolerance."""

import jax
import numpy as np
import pytest

from sdf_nmpc_tpu.nn import init_neural_df, make_sdf_fn
from sdf_nmpc_tpu.ocp import build_ocp
from sdf_nmpc_tpu.solver import init_state, make_rti_step
from tests.test_sdf_nmpc import LAT, build_inputs, hover_x0, sdf_setup  # noqa: F401


def _step_pair(cfg, sdf_fn=None):
    kw = dict(sdf_fn=sdf_fn, sdf_max_df=1.0) if sdf_fn else {}
    cfg_c = cfg.replace(solver=dict(qp_backend="condensed", qp_iters=40))
    cfg_r = cfg.replace(solver=dict(qp_backend="riccati", qp_iters=40))
    ocp_c = build_ocp(cfg_c, **kw)
    ocp_r = build_ocp(cfg_r, **kw)
    return ocp_c, jax.jit(make_rti_step(ocp_c, cfg_c)), jax.jit(make_rti_step(ocp_r, cfg_r))


def _random_scenarios(cfg, ocp, n, seed=0, flag=1.0):
    rng = np.random.default_rng(seed)
    for _ in range(n):
        x0 = hover_x0()
        x0[:3] = rng.normal(size=3) * 0.6
        x0[7:] = rng.normal(size=3) * 0.6
        latent = rng.normal(size=LAT) * 0.2 if flag else None
        yield x0, build_inputs(cfg, ocp, x0, flag=flag, latent=latent)


def test_riccati_matches_condensed_unconstrained(cfg_nosdf):
    """No general rows: pure tracking + du box.  u0/X/U must coincide."""
    cfg = cfg_nosdf.replace(solver=dict(dtype="float64"))
    ocp, step_c, step_r = _step_pair(cfg)
    for x0, inp in _random_scenarios(cfg, ocp, 4, seed=1, flag=0.0):
        st = init_state(ocp, x0, np.float64)
        rc = step_c(st, inp)
        rr = step_r(st, inp)
        assert int(rc.status) == 0 and int(rr.status) == 0
        np.testing.assert_allclose(np.asarray(rr.u0), np.asarray(rc.u0), atol=2e-6)
        np.testing.assert_allclose(
            np.asarray(rr.state.X), np.asarray(rc.state.X), atol=2e-5
        )


def test_riccati_matches_condensed_sdf(sdf_setup):  # noqa: F811
    """Active neural-SDF + FoV soft rows: both backends, same RTI step."""
    cfg, sdf_fn = sdf_setup
    ocp, step_c, step_r = _step_pair(cfg, sdf_fn)
    assert ocp.nh > 0  # constraint rows really present
    for x0, inp in _random_scenarios(cfg, ocp, 4, seed=2, flag=1.0):
        st = init_state(ocp, x0, np.float64)
        rc = step_c(st, inp)
        rr = step_r(st, inp)
        assert int(rc.status) == 0 and int(rr.status) == 0
        np.testing.assert_allclose(np.asarray(rr.u0), np.asarray(rc.u0), atol=5e-5)


def test_riccati_warm_ticks_match(cfg_nosdf):
    """Multi-tick agreement: warm-started trajectories stay together."""
    cfg = cfg_nosdf.replace(solver=dict(dtype="float64"))
    ocp, step_c, step_r = _step_pair(cfg)
    x0, inp = next(_random_scenarios(cfg, ocp, 1, seed=3, flag=0.0))
    st_c = st_r = init_state(ocp, x0, np.float64)
    for _ in range(5):
        rc = step_c(st_c, inp)
        rr = step_r(st_r, inp)
        st_c, st_r = rc.state, rr.state
        np.testing.assert_allclose(np.asarray(rr.u0), np.asarray(rc.u0), atol=1e-5)


def test_riccati_long_horizon(cfg_nosdf):
    """N=60 (3x the reference horizon): the stage-wise backend solves and
    tracks; this is the regime full condensing is not built for."""
    cfg = cfg_nosdf.replace(
        solver=dict(dtype="float64", qp_backend="riccati", qp_iters=20),
        mpc=dict(N=60, T=4.5),
    )
    ocp = build_ocp(cfg)
    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()
    inp = build_inputs(cfg, ocp, x0, flag=0.0)
    st = init_state(ocp, x0, np.float64)
    for _ in range(8):
        res = step(st, inp)
        assert int(res.status) == 0
        st = res.state
    # reference target in build_inputs is p=[2,0,0]: the open-loop plan must
    # make real progress toward it within the 4.5 s horizon (LM reg damps the
    # per-iteration step, so 8 RTI iterations land partway)
    X = np.asarray(st.X)
    assert X[-1, 0] > 1.0
    assert np.isfinite(X).all()


def test_riccati_f32_meets_contract():
    """qp_backend=riccati at production f32 defaults meets the <=1e-3 u0
    contract on the canonical 32-cold-start accuracy workload vs the
    checked-in f64 golden (VERDICT r1 item 4).  The stiff-row Woodbury split
    carries it: without the split the same workload lands at ~7e-3
    (docs/performance.md)."""
    from sdf_nmpc_tpu.utils import accuracy

    ref = np.load(accuracy.REF_NPZ)["u0"]
    u0, status = accuracy.solve_batch(dict(qp_backend="riccati", dtype="float32"))
    assert (status == 0).all()
    err = np.abs(u0 - ref).max()
    assert err <= 1e-3, f"riccati f32 u0 max err {err:.2e}"


def test_riccati_batched_vmap(cfg_nosdf):
    """Backend is vmappable over scenarios like the condensed one."""
    from sdf_nmpc_tpu.parallel import stack_tree

    cfg = cfg_nosdf.replace(solver=dict(dtype="float64", qp_backend="riccati"))
    ocp = build_ocp(cfg)
    step = jax.jit(jax.vmap(make_rti_step(ocp, cfg)))
    pairs = list(_random_scenarios(cfg, ocp, 6, seed=4, flag=0.0))
    states = stack_tree([init_state(ocp, x0, np.float64) for x0, _ in pairs])
    inputs = stack_tree([inp for _, inp in pairs])
    res = step(states, inputs)
    assert np.asarray(res.status == 0).all()
    assert np.isfinite(np.asarray(res.u0)).all()
