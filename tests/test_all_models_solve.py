"""Every dynamics model solves: one RTI step from hover with the full OCP
pipeline (the reference can only run acc/att/att_tau/props — rates and wrench
are unreachable in its factory, SURVEY.md §7.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_nmpc_tpu.models import available_models
from sdf_nmpc_tpu.ocp import build_ocp
from sdf_nmpc_tpu.params import ParamLayout
from sdf_nmpc_tpu.ref_gen import Ref
from sdf_nmpc_tpu.solver import SolveInputs, init_state, make_rti_step


@pytest.mark.parametrize("name", available_models())
def test_model_solves_one_step(cfg_nosdf, name):
    cfg = cfg_nosdf.replace(mpc=dict(model=name), solver=dict(dtype="float64"))
    ocp = build_ocp(cfg)
    step = jax.jit(make_rti_step(ocp, cfg))

    x0 = np.zeros(ocp.nx)
    x0[3] = 1.0
    layout = ParamLayout.from_cfg(cfg)
    p = np.zeros((ocp.N + 1, layout.np_total))
    layout.set_q_d(p, [1, 0, 0, 0])
    ref = Ref(cfg)
    ref.p = np.array([1.0, 0.5, 0.2])
    yr, W = ocp.pack_ref(ref)
    inputs = SolveInputs(
        x0=jnp.asarray(x0),
        yref=jnp.tile(jnp.asarray(yr)[None], (ocp.N, 1)),
        W=jnp.tile(jnp.asarray(W)[None], (ocp.N, 1)),
        yrefN=jnp.asarray(yr[: ocp.nyN]),
        WN=jnp.asarray(W[: ocp.nyN]),
        p=jnp.asarray(p),
    )
    st = init_state(ocp, x0, jnp.float64)
    res = step(st, inputs)
    assert int(res.status) == 0
    U = np.asarray(res.state.U)
    assert np.isfinite(U).all()
    assert (U >= ocp.lbu - 1e-8).all() and (U <= ocp.ubu + 1e-8).all()
    # the solve actually moves toward the target (nonzero input deviation)
    assert np.abs(U - ocp.u_hover).max() > 1e-4
