"""End-to-end SDF-NMPC: the neural distance field inside the constraint
pipeline (BASELINE config 2 shape — single solve, fixed latent).

Shipped reference weights are git-LFS stubs in this mount, so a freshly
initialized NeuralDF stands in; the *mechanics* under test (flag gating,
constraint activation, Jacobians through the MLP, rec-feas/stability wiring)
do not depend on trained weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_nmpc_tpu.math import polynomial_3variate_exponents
from sdf_nmpc_tpu.nn import init_neural_df, make_sdf_fn
from sdf_nmpc_tpu.ocp import build_ocp
from sdf_nmpc_tpu.params import ParamLayout
from sdf_nmpc_tpu.ref_gen import Ref
from sdf_nmpc_tpu.solver import SolveInputs, init_state, make_rti_step


LAT = 8


@pytest.fixture(scope="module")
def sdf_setup():
    from sdf_nmpc_tpu.config import default_config

    cfg = default_config().replace(
        nn=dict(size_latent=LAT), solver=dict(dtype="float64", qp_iters=12)
    )
    module, params = init_neural_df(size_latent=LAT, layer_sizes=(32, 32, 32, 32), seed=3)
    sdf_fn = make_sdf_fn(module, params)
    return cfg, sdf_fn


def build_inputs(cfg, ocp, x0, flag=1.0, latent=None, ref_v=None, constrained_weights=None):
    layout = ParamLayout.from_cfg(cfg)
    N = ocp.N
    p = np.zeros((N + 1, layout.np_total))
    layout.set_flag(p, flag)
    layout.set_camera(p, W_p_Co=np.zeros(3), W_R_Co=np.eye(3))
    layout.set_q_d(p, [1, 0, 0, 0])
    if latent is not None:
        layout.set_latent(p, latent)
    cw = bool(flag) if constrained_weights is None else constrained_weights
    ref = Ref(cfg).use_constrained_weights(cw)
    ref.p = np.array([2.0, 0.0, 0.0])
    if ref_v is not None:
        ref.v = np.asarray(ref_v, dtype=float)
    yr, W = ocp.pack_ref(ref)
    return SolveInputs(
        x0=jnp.asarray(x0),
        yref=jnp.tile(jnp.asarray(yr)[None], (N, 1)),
        W=jnp.tile(jnp.asarray(W)[None], (N, 1)),
        yrefN=jnp.asarray(yr[: ocp.nyN]),
        WN=jnp.asarray(W[: ocp.nyN]),
        p=jnp.asarray(p),
    )


def hover_x0():
    x = np.zeros(10)
    x[3] = 1.0
    return x


def test_sdf_ocp_dims(sdf_setup):
    cfg, sdf_fn = sdf_setup
    ocp = build_ocp(cfg, sdf_fn=sdf_fn, sdf_max_df=1.0)
    # hfov + vfov + sdf stage rows; terminal adds the same set
    assert ocp.nh == 3 and ocp.nhN == 3
    assert ocp.eval_names == ("sdf",)
    # slack weights from config
    np.testing.assert_allclose(ocp.zl, [20.0, 20.0, 200.0])
    np.testing.assert_allclose(ocp.Zl, [0.0, 0.0, 50.0])


def test_sdf_solve_runs_and_flag_gates(sdf_setup):
    cfg, sdf_fn = sdf_setup
    ocp = build_ocp(cfg, sdf_fn=sdf_fn, sdf_max_df=1.0)
    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()
    latent = np.random.default_rng(0).normal(size=LAT) * 0.1

    # flag off: constraints inert (sdf row pinned at max_df), solve == nominal
    st = init_state(ocp, x0, jnp.float64)
    res_off = step(st, build_inputs(cfg, ocp, x0, flag=0.0, latent=latent))
    assert int(res_off.status) == 0

    # flag on: constrained solve still succeeds and diagnostics flow
    st = init_state(ocp, x0, jnp.float64)
    res_on = step(st, build_inputs(cfg, ocp, x0, flag=1.0, latent=latent))
    assert int(res_on.status) == 0
    assert res_on.evals.shape == (ocp.N + 1, 1)
    assert np.all(np.isfinite(np.asarray(res_on.evals)))
    # the two solves must differ (constraints active vs inert)
    assert not np.allclose(np.asarray(res_on.u0), np.asarray(res_off.u0), atol=1e-9)


def test_sdf_constraint_shapes_behavior(sdf_setup):
    """With a wall-like SDF (distance to a plane at x=1.2 in camera frame),
    the constrained controller must keep the open-loop trajectory out of the
    wall while the unconstrained one drives through it."""
    cfg, _ = sdf_setup

    def wall_sdf(pos, latent):
        return 1.2 - pos[0]  # signed distance to the x=1.2 plane (trunc-free)

    ocp = build_ocp(cfg, sdf_fn=wall_sdf, sdf_max_df=1.0)
    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()

    st = init_state(ocp, x0, jnp.float64)
    inputs_on = build_inputs(cfg, ocp, x0, flag=1.0)
    for _ in range(30):
        res = step(st, inputs_on)
        st = res.state
    margin = cfg.robot.size.xy + cfg.mpc.bound_margin
    xs = np.asarray(st.X[:, 0])
    assert xs.max() < 1.2 - margin + 0.02, f"trajectory penetrates wall: {xs.max()}"

    st = init_state(ocp, x0, jnp.float64)
    inputs_off = build_inputs(cfg, ocp, x0, flag=0.0)
    for _ in range(30):
        res = step(st, inputs_off)
        st = res.state
    assert np.asarray(st.X[:, 0]).max() > 1.5  # drives to the target unimpeded


def test_recursive_feasibility_and_stability_build(sdf_setup):
    """rec-feas + stability wiring compiles and solves (gen_model.py:73-149)."""
    cfg, sdf_fn = sdf_setup
    cfg2 = cfg.replace(flags=dict(recursive_feasibility=True, stability=True))
    n_coeff = polynomial_3variate_exponents(cfg.mpc.braking_dist.degree).shape[0]
    coeffs = np.zeros(n_coeff)
    coeffs[0] = 0.3  # constant braking distance 0.3 m
    ocp = build_ocp(cfg2, sdf_fn=sdf_fn, sdf_max_df=1.0, bdist_coeffs=coeffs, r_tilde=1.0)
    # terminal rows: hfov, vfov, rec-feas, brake-endpoint fovs, 3 vel bounds
    assert ocp.nhN == 3 + 2 + 3
    # stability adds a gated terminal cost row
    assert ocp.nyN == ocp.model.nyN + 1
    assert "braking_dist" in ocp.eval_names and "rec_feas_margin" in ocp.eval_names

    step = jax.jit(make_rti_step(ocp, cfg2))
    x0 = hover_x0()
    st = init_state(ocp, x0, jnp.float64)
    res = step(st, build_inputs(cfg2, ocp, x0, flag=1.0))
    assert int(res.status) == 0
    assert np.all(np.isfinite(np.asarray(res.state.U)))


@pytest.mark.parametrize("model_name,nx", [("props", 13), ("rates", 10)])
def test_recursive_feasibility_other_models(sdf_setup, model_name, nx):
    """rec-feas is wired through ModelSpec.vel_world (not an att-only state
    assumption): a world-frame-v model (props) and a BODY-frame-v model
    (rates, velocity rotated by the state quaternion) both build and solve
    (reference wires it generically through model hooks, gen_model.py:73-121)."""
    cfg, sdf_fn = sdf_setup
    cfg2 = cfg.replace(
        mpc=dict(model=model_name),
        flags=dict(recursive_feasibility=True, stability=False),
    )
    n_coeff = polynomial_3variate_exponents(cfg.mpc.braking_dist.degree).shape[0]
    coeffs = np.zeros(n_coeff)
    coeffs[0] = 0.3
    ocp = build_ocp(cfg2, sdf_fn=sdf_fn, sdf_max_df=1.0, bdist_coeffs=coeffs)
    assert ocp.nx == nx
    # terminal rows: hfov, vfov, rec-feas + brake-endpoint fovs
    assert ocp.nhN == 2 + 1 + 2
    x0 = np.zeros(nx)
    x0[3] = 1.0
    x0[7] = 0.5  # moving: the braking-endpoint rows see a non-trivial v
    step = jax.jit(make_rti_step(ocp, cfg2))
    st = init_state(ocp, x0, jnp.float64)
    res = step(st, build_inputs(cfg2, ocp, x0, flag=1.0))
    assert int(res.status) == 0
    assert np.all(np.isfinite(np.asarray(res.state.U)))
    # vel_world: world == body rotated for identity attitude; sanity on values
    vw = np.asarray(ocp.model.vel_world(jnp.asarray(x0)))
    np.testing.assert_allclose(vw, [0.5, 0.0, 0.0], atol=1e-12)


def test_batched_vmap_sdf_solve(sdf_setup):
    """Scenario axis: vmapped solves with different x0/latents (config 4 shape)."""
    cfg, sdf_fn = sdf_setup
    ocp = build_ocp(cfg, sdf_fn=sdf_fn, sdf_max_df=1.0)
    step = make_rti_step(ocp, cfg)
    B = 8
    rng = np.random.default_rng(5)

    x0s = np.tile(hover_x0(), (B, 1))
    x0s[:, :3] += rng.normal(size=(B, 3)) * 0.3
    latents = rng.normal(size=(B, LAT)) * 0.1

    def one_inputs(x0, latent):
        return build_inputs(cfg, ocp, x0, flag=1.0, latent=latent)

    inputs = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[one_inputs(x0s[i], latents[i]) for i in range(B)]
    )
    states = jax.tree.map(
        lambda *xs: jnp.stack(xs), *[init_state(ocp, x0s[i], jnp.float64) for i in range(B)]
    )
    batched = jax.jit(jax.vmap(step))
    res = batched(states, inputs)
    assert res.u0.shape == (B, ocp.nu)
    assert np.asarray(res.status).sum() == 0
    # scenarios actually differ
    assert np.std(np.asarray(res.u0), axis=0).max() > 1e-4


def test_sdf_cost_config(sdf_setup):
    """sdf_cost=True appends the (1-0.5*sdf)^4 cost row at weight 20
    (gen_model.py:65-66) and the solve still runs."""
    cfg, sdf_fn = sdf_setup
    cfg2 = cfg.replace(flags=dict(sdf_cost=True))
    ocp = build_ocp(cfg2, sdf_fn=sdf_fn, sdf_max_df=1.0)
    assert ocp.ny == ocp.model.ny + 1
    np.testing.assert_allclose(ocp.extra_W_stage, [20.0])
    # the fast path must be disabled (the MLP also sits in the cost residual)
    assert ocp.sdf_row_batch is None
    ref = __import__("sdf_nmpc_tpu.ref_gen", fromlist=["Ref"]).Ref(cfg2)
    yr, W = ocp.pack_ref(ref)
    assert W[-1] == 20.0 and yr[-1] == 0.0

    step = jax.jit(make_rti_step(ocp, cfg2))
    x0 = hover_x0()
    res = step(init_state(ocp, x0, jnp.float64), build_inputs(cfg2, ocp, x0, flag=1.0))
    assert int(res.status) == 0


def test_no_vfov_and_wide_hfov(sdf_setup):
    """vfov_constraint=False drops the vertical rows; hfov >= 3.14 (360-deg
    lidar) drops the horizontal rows too (gen_model.py:42)."""
    cfg, sdf_fn = sdf_setup
    cfg2 = cfg.replace(flags=dict(vfov_constraint=False))
    ocp = build_ocp(cfg2, sdf_fn=sdf_fn, sdf_max_df=1.0)
    assert ocp.nh == 2  # hfov + sdf only

    cfg3 = cfg2.replace(
        sensor=dict(hfov=3.2, vfov=1.0, aspect_ratio=3.2, is_spherical=True)
    )
    from sdf_nmpc_tpu.config import load_config  # revalidate derived fields

    ocp3 = build_ocp(cfg3, sdf_fn=sdf_fn, sdf_max_df=1.0)
    assert ocp3.nh == 1  # sdf row only
    step = jax.jit(make_rti_step(ocp3, cfg3))
    x0 = hover_x0()
    res = step(init_state(ocp3, x0, jnp.float64), build_inputs(cfg3, ocp3, x0, flag=1.0))
    assert int(res.status) == 0
