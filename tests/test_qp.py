"""Unit tests for the batched interior-point QP (solver/qp.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from sdf_nmpc_tpu.solver.qp import QpData, solve_qp

RNG = np.random.default_rng(1)


def _qp(H, g, C=None, c0=None, lh=None, uh=None, z1=None, z2=None, lb=None, ub=None):
    nz = len(g)
    nc = 0 if C is None else C.shape[0]
    zeros = np.zeros(nc)
    return QpData(
        H=jnp.asarray(H, jnp.float64),
        g=jnp.asarray(g, jnp.float64),
        C=jnp.asarray(C if C is not None else np.zeros((0, nz))),
        c0=jnp.asarray(c0 if c0 is not None else np.zeros(0)),
        lh=jnp.asarray(lh if lh is not None else np.zeros(0)),
        uh=jnp.asarray(uh if uh is not None else np.zeros(0)),
        z1=jnp.asarray(z1 if z1 is not None else zeros[:0]),
        z2=jnp.asarray(z2 if z2 is not None else zeros[:0]),
        lb=jnp.asarray(lb if lb is not None else -1e3 * np.ones(nz)),
        ub=jnp.asarray(ub if ub is not None else 1e3 * np.ones(nz)),
    )


def random_spd(n, cond=10.0):
    A = RNG.normal(size=(n, n))
    Q, _ = np.linalg.qr(A)
    eig = np.linspace(1.0, cond, n)
    return Q @ np.diag(eig) @ Q.T


def test_unconstrained_interior():
    n = 8
    H = random_spd(n)
    g = RNG.normal(size=n)
    res = solve_qp(_qp(H, g), iters=30)
    np.testing.assert_allclose(np.asarray(res.dz), -np.linalg.solve(H, g), atol=1e-6)


def test_box_active():
    H = np.eye(2)
    g = np.array([-5.0, 0.3])  # unconstrained optimum (5, -0.3)
    res = solve_qp(_qp(H, g, lb=-np.ones(2), ub=np.ones(2)), iters=40)
    np.testing.assert_allclose(np.asarray(res.dz), [1.0, -0.3], atol=1e-5)


def test_soft_penalty_matches_scipy():
    """Penalty-QP objective solved by scipy must agree with the IP solution."""
    n, nc = 6, 4
    H = random_spd(n)
    g = RNG.normal(size=n)
    C = RNG.normal(size=(nc, n))
    c0 = RNG.normal(size=nc)
    lh = -0.2 * np.ones(nc)
    uh = 0.2 * np.ones(nc)
    z1 = np.array([5.0, 5.0, 0.0, 2.0])
    z2 = np.array([50.0, 0.0, 40.0, 30.0])
    lb, ub = -0.8 * np.ones(n), 0.8 * np.ones(n)

    def obj(z):
        w = c0 + C @ z
        vl = np.maximum(lh - w, 0)
        vu = np.maximum(w - uh, 0)
        pen = np.sum(z1 * (vl + vu) + 0.5 * z2 * (vl**2 + vu**2))
        return 0.5 * z @ H @ z + g @ z + pen

    # oracle: the SMOOTH explicit-slack QP over (z, s_l, s_u) — equivalent to
    # the penalty program by exact slack elimination (ocp.py docstring)
    def obj_slack(v):
        z, sl, su = v[:n], v[n : n + nc], v[n + nc :]
        return (
            0.5 * z @ H @ z
            + g @ z
            + np.sum(z1 * (sl + su) + 0.5 * z2 * (sl**2 + su**2))
        )

    cons = [
        {"type": "ineq", "fun": lambda v: (c0 + C @ v[:n]) + v[n : n + nc] - lh},
        {"type": "ineq", "fun": lambda v: uh + v[n + nc :] - (c0 + C @ v[:n])},
    ]
    ref = minimize(
        obj_slack,
        np.zeros(n + 2 * nc),
        bounds=list(zip(lb, ub)) + [(0, np.inf)] * (2 * nc),
        constraints=cons,
        method="SLSQP",
        options={"ftol": 1e-14, "maxiter": 1000},
    )
    res = solve_qp(_qp(H, g, C, c0, lh, uh, z1, z2, lb, ub), iters=60)
    assert obj(np.asarray(res.dz)) <= ref.fun + 1e-6
    np.testing.assert_allclose(np.asarray(res.dz), ref.x[:n], atol=2e-3)


def test_l2_soft_constraint_equals_slack_qp():
    """Exact-penalty elimination == explicit slack QP (HPIPM's formulation).

    min 0.5 z'Hz + g'z + z1*s + 0.5*z2*s^2  s.t.  C z + s >= lh, s >= 0.
    """
    H = np.eye(2)
    g = np.array([1.0, 1.0])
    C = np.array([[1.0, 1.0]])
    c0 = np.zeros(1)
    lh = np.array([0.5])
    uh = np.array([np.inf])
    z1, z2 = np.array([3.0]), np.array([20.0])

    # explicit slack QP via scipy over (z, s)
    def obj(v):
        z, s = v[:2], v[2]
        return 0.5 * z @ H @ z + g @ z + z1[0] * s + 0.5 * z2[0] * s**2

    cons = [{"type": "ineq", "fun": lambda v: C[0] @ v[:2] - lh[0] + v[2]}]
    ref = minimize(
        obj,
        np.zeros(3),
        bounds=[(-10, 10)] * 2 + [(0, 10)],
        constraints=cons,
        method="SLSQP",
        options={"ftol": 1e-14, "maxiter": 500},
    )
    res = solve_qp(_qp(H, g, C, c0, lh, uh, z1, z2), iters=60)
    np.testing.assert_allclose(np.asarray(res.dz), ref.x[:2], atol=1e-4)


def test_batched_vmap():
    import jax

    n = 10
    Hs = np.stack([random_spd(n) for _ in range(16)])
    gs = RNG.normal(size=(16, n))
    qp = _qp(Hs[0], gs[0])
    batch = QpData(
        H=jnp.asarray(Hs),
        g=jnp.asarray(gs),
        C=jnp.zeros((16, 0, n)),
        c0=jnp.zeros((16, 0)),
        lh=jnp.zeros((16, 0)),
        uh=jnp.zeros((16, 0)),
        z1=jnp.zeros((16, 0)),
        z2=jnp.zeros((16, 0)),
        lb=jnp.tile(qp.lb, (16, 1)),
        ub=jnp.tile(qp.ub, (16, 1)),
    )
    res = jax.vmap(lambda q: solve_qp(q, iters=30))(batch)
    expect = np.stack([-np.linalg.solve(H, g) for H, g in zip(Hs, gs)])
    np.testing.assert_allclose(np.asarray(res.dz), expect, atol=1e-6)


def test_stiff_rows_f32_accuracy():
    """The stiff-row Woodbury split + noise-aware gap floors + best-iterate
    tracking keep f32 accurate on QPs with huge penalty weights and many
    active rows — the regime where a capped-Schur f32 IP loses ~1e-2
    (docs/performance.md)."""
    rng = np.random.default_rng(7)
    n, nc = 12, 10
    A = rng.normal(size=(n, n))
    Q, _ = np.linalg.qr(A)
    H = Q @ np.diag(np.linspace(1.0, 100.0, n)) @ Q.T
    g = rng.normal(size=n) * 3
    C = rng.normal(size=(nc, n))
    c0 = rng.normal(size=nc)
    lh = -0.05 * np.ones(nc)
    uh = 0.05 * np.ones(nc)
    z1 = np.full(nc, 1e3)
    z2 = np.full(nc, 1e4)
    lb, ub = -0.6 * np.ones(n), 0.6 * np.ones(n)

    qp64 = _qp(H, g, C, c0, lh, uh, z1, z2, lb, ub)
    ref = np.asarray(solve_qp(qp64, iters=40).dz)
    qp32 = QpData(*[jnp.asarray(v, jnp.float32) for v in qp64])
    res32 = solve_qp(qp32, iters=24, k_stiff=8)
    err = np.abs(np.asarray(res32.dz, np.float64) - ref).max()
    # without the split (everything capped into the Schur matrix): must still
    # run (backstop path) but loses precision on this stiff instance
    res_ns = solve_qp(qp32, iters=24, k_stiff=0)
    err_ns = np.abs(np.asarray(res_ns.dz, np.float64) - ref).max()
    assert np.all(np.isfinite(np.asarray(res_ns.dz)))
    assert err < 5e-3, err
    assert err < err_ns / 3, (err, err_ns)


def test_best_iterate_monotone_in_budget():
    """Extra iterations can only help (best-merit iterate is returned)."""
    n, nc = 8, 6
    H = random_spd(n)
    g = RNG.normal(size=n)
    C = RNG.normal(size=(nc, n))
    c0 = RNG.normal(size=nc)
    qp = _qp(H, g, C, c0, -0.1 * np.ones(nc), 0.1 * np.ones(nc),
             np.full(nc, 1e3), np.full(nc, 1e4))
    qp32 = QpData(*[jnp.asarray(v, jnp.float32) for v in qp])
    ref = np.asarray(solve_qp(qp, iters=40).dz)
    errs = [
        np.abs(np.asarray(solve_qp(qp32, iters=it).dz, np.float64) - ref).max()
        for it in (24, 48)
    ]
    assert errs[1] <= errs[0] * 2 + 1e-5, errs  # no late-iteration blowup
