"""SQP-RTI engine tests: hover fixed point, direct-NLP parity, warm-start API.

The parity oracle is a scipy single-shooting NLP over the identical discrete
OCP (same ERK4, residuals, weights, cost scaling, box bounds) solved to high
accuracy in f64 — the stand-in for the acados cross-check of SURVEY.md §4
(acados is not installable here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import minimize

from sdf_nmpc_tpu.ocp import build_ocp
from sdf_nmpc_tpu.params import ParamLayout
from sdf_nmpc_tpu.ref_gen import Ref
from sdf_nmpc_tpu.solver import (
    SolveInputs,
    SolverState,
    init_state,
    make_rti_step,
    shift_state,
)
from sdf_nmpc_tpu.solver.integrator import erk4


def f64_cfg(cfg_nosdf, lm=None):
    c = cfg_nosdf.replace(solver=dict(dtype="float64", qp_iters=15))
    # the fixed point of the SQP iteration is independent of the LM damping;
    # a small LM lets the to-convergence parity tests converge quadratically
    # (the reference's lm_reg=10 matches acados per-tick RTI behavior instead)
    return c if lm is None else c.replace(mpc=dict(lm_reg=lm))


def make_inputs(ocp, cfg, x0, ref):
    N = ocp.N
    layout = ParamLayout.from_cfg(cfg)
    p = np.zeros((N + 1, layout.np_total))
    layout.set_q_d(p, ref.q)
    yr, W = ocp.pack_ref(ref)
    return SolveInputs(
        x0=jnp.asarray(x0),
        yref=jnp.tile(jnp.asarray(yr)[None], (N, 1)),
        W=jnp.tile(jnp.asarray(W)[None], (N, 1)),
        yrefN=jnp.asarray(yr[: ocp.nyN]),
        WN=jnp.asarray(W[: ocp.nyN]),
        p=jnp.asarray(p),
    )


def hover_x0(nx=10):
    x = np.zeros(nx)
    x[3] = 1.0
    return x


def test_hover_fixed_point(cfg_nosdf):
    """Hovering at the reference: the RTI step returns (nearly) hover input."""
    cfg = f64_cfg(cfg_nosdf)
    ocp = build_ocp(cfg)
    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()
    ref = Ref(cfg).hover_at_state(x0)
    inputs = make_inputs(ocp, cfg, x0, ref)
    state = init_state(ocp, x0, jnp.float64)
    res = step(state, inputs)
    assert int(res.status) == 0
    np.testing.assert_allclose(np.asarray(res.u0), ocp.u_hover, atol=1e-6)
    # trajectory stays at hover
    np.testing.assert_allclose(np.asarray(res.state.X[-1][:3]), 0.0, atol=1e-6)


def test_rti_converges_and_matches_direct_nlp(cfg_nosdf):
    """Iterated RTI at a fixed (x0, ref) must converge to the direct-NLP
    solution of the same OCP within 1e-3 (BASELINE control-accuracy target)."""
    cfg = f64_cfg(cfg_nosdf, lm=0.01)
    ocp = build_ocp(cfg)
    step = jax.jit(make_rti_step(ocp, cfg))

    x0 = hover_x0()
    x0[:3] = [-1.5, 0.6, 0.4]  # offset from target -> aggressive maneuver
    x0[7:] = [0.5, -0.2, 0.1]
    ref = Ref(cfg)
    ref.p = np.zeros(3)
    ref.v = np.zeros(3)
    inputs = make_inputs(ocp, cfg, x0, ref)

    state = init_state(ocp, x0, jnp.float64)
    for _ in range(60):
        res = step(state, inputs)
        state = res.state
    assert int(res.status) == 0

    # ---- direct single-shooting NLP oracle ----
    N, nu = ocp.N, ocp.nu
    dt = jnp.asarray(ocp.dt)
    scale = jnp.asarray(ocp.cost_scaling)
    yr = inputs.yref[0]
    W = inputs.W[0]
    p0 = inputs.p[0]

    def objective(U_flat):
        U = U_flat.reshape(N, nu)

        def body(x, k):
            resk = ocp.y(x, U[k], p0) - yr
            ck = 0.5 * scale[k] * jnp.sum(W * resk**2)
            return erk4(ocp.model.f, x, U[k], dt[k]), ck

        xN, cs = jax.lax.scan(body, jnp.asarray(x0), jnp.arange(N))
        resN = ocp.yN(xN, p0) - inputs.yrefN
        return jnp.sum(cs) + 0.5 * jnp.sum(inputs.WN * resN**2)

    val_grad = jax.jit(jax.value_and_grad(objective))
    fun = lambda u: tuple(np.asarray(v, dtype=np.float64) for v in val_grad(jnp.asarray(u)))
    bounds = [(lo, hi) for lo, hi in zip(np.tile(ocp.lbu, N), np.tile(ocp.ubu, N))]
    sol = minimize(
        fun,
        np.asarray(state.U).flatten(),
        jac=True,
        bounds=bounds,
        method="L-BFGS-B",
        options={"ftol": 1e-16, "gtol": 1e-12, "maxiter": 3000},
    )
    u_direct = sol.x.reshape(N, nu)

    err_u0 = np.abs(np.asarray(res.u0) - u_direct[0]).max()
    assert err_u0 < 1e-6, f"u0 differs from direct NLP by {err_u0}"
    # objective of our solution not worse than oracle beyond tolerance
    ours = float(objective(jnp.asarray(np.asarray(state.U).flatten())))
    assert ours <= sol.fun * (1 + 1e-5) + 1e-8


def test_input_bounds_respected(cfg_nosdf):
    """Saturating maneuver: returned inputs stay inside [lbu, ubu]."""
    cfg = f64_cfg(cfg_nosdf)
    ocp = build_ocp(cfg)
    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()
    x0[:3] = [-8.0, 8.0, -5.0]
    ref = Ref(cfg)
    inputs = make_inputs(ocp, cfg, x0, ref)
    state = init_state(ocp, x0, jnp.float64)
    for _ in range(5):
        res = step(state, inputs)
        state = res.state
    U = np.asarray(state.U)
    assert (U >= ocp.lbu - 1e-7).all() and (U <= ocp.ubu + 1e-7).all()
    # thrust channel should saturate for this maneuver at some node
    assert U[:, 0].max() > 0.9


def test_shift_and_init():
    from sdf_nmpc_tpu.config import default_config

    cfg = default_config().replace(flags=dict(enable_sdf=False))
    ocp = build_ocp(cfg)
    st = init_state(ocp, hover_x0())
    assert st.X.shape == (ocp.N + 1, ocp.nx)
    np.testing.assert_allclose(np.asarray(st.U), np.tile(ocp.u_hover, (ocp.N, 1)))
    st2 = SolverState(X=st.X.at[5].set(7.0), U=st.U.at[5].set(3.0))
    sh = shift_state(st2, 1)
    np.testing.assert_allclose(np.asarray(sh.X[4]), 7.0)
    np.testing.assert_allclose(np.asarray(sh.U[4]), 3.0)


def test_closed_loop_reaches_waypoint(cfg_nosdf):
    """Closed-loop rollout: controller drives the quad to a 2m-away target."""
    cfg = f64_cfg(cfg_nosdf)
    ocp = build_ocp(cfg)
    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()
    ref = Ref(cfg)
    ref.p = np.array([2.0, 0.0, 1.0])
    state = init_state(ocp, x0, jnp.float64)
    x = jnp.asarray(x0)
    dt_ctrl = cfg.mpc.T / cfg.mpc.N
    for _ in range(200):
        inputs = make_inputs(ocp, cfg, np.asarray(x), ref)
        res = step(state, inputs)
        state = res.state
        x = erk4(ocp.model.f, x, res.u0, dt_ctrl)  # plant == model
    pos = np.asarray(x[:3])
    np.testing.assert_allclose(pos, ref.p, atol=0.05)
    vel = np.asarray(x[7:])
    np.testing.assert_allclose(vel, 0.0, atol=0.05)  # residual settle motion


def test_nonuniform_grid_solves(cfg_nosdf):
    """Front-dense shooting grid (reference ocp.py:21-27): 2 short nodes at
    the control period, then uniform to T."""
    cfg = cfg_nosdf.replace(
        solver=dict(dtype="float64"), mpc=dict(uniform_dt=False)
    )
    ocp = build_ocp(cfg)
    # dt vector: first interval = control period, last intervals longer
    assert ocp.dt.shape == (cfg.mpc.N,)
    np.testing.assert_allclose(ocp.dt[0], cfg.mpc.control_loop_time * 1e-3)
    assert ocp.dt[-1] > ocp.dt[0]
    np.testing.assert_allclose(ocp.dt.sum(), cfg.mpc.T)

    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()
    ref = Ref(cfg)
    ref.p = np.array([1.0, 0.0, 0.0])
    res = step(init_state(ocp, x0, jnp.float64), make_inputs(ocp, cfg, x0, ref))
    assert int(res.status) == 0


def test_multi_sqp_iters_improves(cfg_nosdf):
    """cfg.solver.sqp_iters > 1: more Gauss-Newton iterations per call move
    the iterate further toward the fixed point than one RTI iteration."""
    cfg1 = cfg_nosdf.replace(solver=dict(dtype="float64"), mpc=dict(lm_reg=0.01))
    cfg3 = cfg1.replace(solver=dict(sqp_iters=3))
    ocp = build_ocp(cfg1)
    step1 = jax.jit(make_rti_step(ocp, cfg1))
    step3 = jax.jit(make_rti_step(build_ocp(cfg3), cfg3))

    x0 = hover_x0()
    x0[:3] = [-1.0, 0.5, 0.3]
    ref = Ref(cfg1)
    inputs = make_inputs(ocp, cfg1, x0, ref)

    res1 = step1(init_state(ocp, x0, jnp.float64), inputs)
    res3 = step3(init_state(ocp, x0, jnp.float64), inputs)
    # three inner iterations from the same start == three chained single steps
    st = init_state(ocp, x0, jnp.float64)
    for _ in range(3):
        r = step1(st, inputs)
        st = r.state
    np.testing.assert_allclose(np.asarray(res3.u0), np.asarray(r.u0), atol=1e-12)
    assert not np.allclose(np.asarray(res1.u0), np.asarray(res3.u0))


def test_kkt_tol_status(cfg_nosdf):
    """cfg.solver.kkt_tol flags soft non-convergence as status 2 while still
    updating the iterate (acados QP-status analogue)."""
    cfg = cfg_nosdf.replace(solver=dict(dtype="float64", qp_iters=1, kkt_tol=1e-9))
    ocp = build_ocp(cfg)
    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()
    x0[:3] = [-3.0, 2.0, 1.0]
    ref = Ref(cfg)
    res = step(init_state(ocp, x0, jnp.float64), make_inputs(ocp, cfg, x0, ref))
    # one IP iteration from an aggressive start cannot reach 1e-9 stationarity
    assert int(res.status) == 2
    assert np.isfinite(np.asarray(res.state.U)).all()

    cfg_ok = cfg.replace(solver=dict(qp_iters=30, kkt_tol=1e3))
    step2 = jax.jit(make_rti_step(build_ocp(cfg_ok), cfg_ok))
    res2 = step2(init_state(ocp, x0, jnp.float64), make_inputs(ocp, cfg_ok, x0, ref))
    assert int(res2.status) == 0
