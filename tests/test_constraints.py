"""Extension-row builders (constraints.py) + build_ocp extra_* hooks."""

import jax
import jax.numpy as jnp
import numpy as np

from sdf_nmpc_tpu.constraints import (
    fov_const_normals,
    pitch_const,
    roll_const,
    vel_const,
    yxvel_cost,
)
from sdf_nmpc_tpu.ocp import build_ocp
from sdf_nmpc_tpu.solver import init_state, make_rti_step
from tests.test_sdf_nmpc import build_inputs, hover_x0


def test_extra_rows_wire_into_ocp(cfg_nosdf):
    cfg = cfg_nosdf.replace(solver=dict(dtype="float64"))
    stage_v, term_v = vel_const(cfg, stage=True, term=True, slack=(5.0, 10.0))
    stage_r, term_r = roll_const(cfg)
    stage_p, term_p = pitch_const(cfg)
    ocp = build_ocp(
        cfg,
        extra_cost_stage=yxvel_cost(cfg, 2.0, 3.0),
        extra_const_stage=stage_v + stage_r + stage_p,
        extra_const_term=term_v + term_r + term_p,
        extra_eval=[("vz", lambda x, u, p: x[9])],
    )
    assert ocp.nh == 5 and ocp.nhN == 5
    assert ocp.ny == ocp.model.ny + 2
    np.testing.assert_allclose(ocp.extra_W_stage, [2.0, 3.0])
    assert ocp.eval_names == ("vz",)

    # the extended OCP still solves
    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()
    res = step(init_state(ocp, x0, jnp.float64), build_inputs(cfg, ocp, x0, flag=0.0))
    assert int(res.status) == 0
    assert res.evals.shape == (ocp.N + 1, 1)


def test_vel_const_limits_speed(cfg_nosdf):
    """Tight velocity bound actually limits the planned speed."""
    cfg = cfg_nosdf.replace(solver=dict(dtype="float64"))
    tight = cfg.replace(robot=dict(limits=dict(vx=0.5, vy=0.5, vz=0.5)))
    stage_v, term_v = vel_const(tight, stage=True, term=True, slack=None)
    ocp = build_ocp(cfg, extra_const_stage=stage_v, extra_const_term=term_v)
    step = jax.jit(make_rti_step(ocp, cfg))
    x0 = hover_x0()
    st = init_state(ocp, x0, jnp.float64)
    inputs = build_inputs(cfg, ocp, x0, flag=0.0)  # target 2 m ahead
    for _ in range(25):
        res = step(st, inputs)
        st = res.state
    vmax = np.abs(np.asarray(st.X[:, 7:10])).max()
    assert vmax < 0.6, f"velocity bound violated: {vmax}"


def test_fov_normals_rows(cfg):
    rows = fov_const_normals(cfg, slack=cfg.mpc.weights.slack_fov)
    assert len(rows) == 4
    fn, lo, hi, z1, z2 = rows[0]
    p = np.zeros(145)
    p[0] = 1.0  # flag
    p[[4, 8, 12]] = 1.0  # identity W_R_Co
    val = fn(jnp.asarray(hover_x0()), None, jnp.asarray(p))
    assert np.isfinite(float(val))
