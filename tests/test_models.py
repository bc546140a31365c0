"""Model-layer tests: shapes, hover equilibria, command maps, ref packing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_nmpc_tpu.models import available_models, make_model
from sdf_nmpc_tpu.ref_gen import Ref

MODELS = available_models()


def hover_state(nx):
    x = np.zeros(nx)
    x[3] = 1.0  # identity quaternion
    return x


@pytest.mark.parametrize("name", MODELS)
def test_shapes(cfg, name):
    c = cfg.replace(mpc=dict(model=name))
    model = make_model(c)
    x = jnp.asarray(hover_state(model.nx))
    u = jnp.asarray(model.u_hover)
    p = jnp.zeros(17 + c.nn.size_latent).at[13].set(1.0)  # q_d = identity
    assert model.f(x, u).shape == (model.nx,)
    assert model.y(x, u, p).shape == (model.ny,)
    assert model.yN(x, p).shape == (model.nyN,)
    assert model.lbu.shape == (model.nu,)
    assert model.u_hover.shape == (model.nu,)


@pytest.mark.parametrize("name", MODELS)
def test_hover_equilibrium(cfg, name):
    """At hover state + hover input, translational dynamics are (near) zero."""
    c = cfg.replace(mpc=dict(model=name))
    model = make_model(c)
    x = jnp.asarray(hover_state(model.nx))
    xdot = np.asarray(model.f(x, jnp.asarray(model.u_hover)))
    if name == "acc":
        np.testing.assert_allclose(xdot, 0.0, atol=1e-6)
    else:
        # wrench included: its hover is normalized g/gamma now (the raw-g
        # reference quirk of quad_wrench.py:28 is intent-fixed like props)
        np.testing.assert_allclose(xdot, 0.0, atol=1e-5)


@pytest.mark.parametrize("name", MODELS)
def test_dynamics_differentiable(cfg, name):
    c = cfg.replace(mpc=dict(model=name))
    model = make_model(c)
    x = jnp.asarray(hover_state(model.nx)) + 0.01
    u = jnp.asarray(model.u_hover) + 0.01
    A = jax.jacfwd(model.f, argnums=0)(x, u)
    B = jax.jacfwd(model.f, argnums=1)(x, u)
    assert A.shape == (model.nx, model.nx)
    assert B.shape == (model.nx, model.nu)
    assert np.all(np.isfinite(np.asarray(A)))
    assert np.all(np.isfinite(np.asarray(B)))


def test_att_command_maps(cfg):
    model = make_model(cfg)
    lim = cfg.robot.limits
    x = jnp.asarray(hover_state(model.nx))
    u = jnp.array([0.5, 0.1, -0.2, 0.3])
    trpyr = np.asarray(model.u_to_TRPYr(x, u, jnp.zeros(145)))
    np.testing.assert_allclose(
        trpyr,
        [0.5 * lim.gamma * cfg.robot.mass, 0.1 * lim.roll, -0.2 * lim.pitch, 0.3 * lim.wz],
        rtol=1e-6,
    )
    # at hover attitude, body-frame accel z = gamma - g
    acc = np.asarray(model.u_to_acc(x, jnp.asarray(model.u_hover), jnp.zeros(145)))
    np.testing.assert_allclose(acc, [0, 0, 0, 0], atol=1e-6)


@pytest.mark.parametrize("name", MODELS)
def test_formate_ref_shapes(cfg, name):
    c = cfg.replace(mpc=dict(model=name))
    model = make_model(c)
    ref = Ref(c)
    yr, W = model.formate_ref(ref, n_extra=2)
    assert yr.shape == (model.ny + 2,)
    assert W.shape == (model.ny + 2,)


def test_att_formate_ref_values(cfg):
    """W ordering pinned by reference quad_rollpitchyawrate.py:63-65:
    [Wp, Wq_yaw, Wv, Wq_roll, Wq_pitch, Ww_z, Wa]."""
    model = make_model(cfg)
    ref = Ref(cfg)
    ref.p = np.array([1.0, 2.0, 3.0])
    ref.v = np.array([0.5, 0.0, 0.0])
    ref.wz = 0.7
    yr, W = model.formate_ref(ref)
    np.testing.assert_allclose(yr, [1, 2, 3, 0, 0.5, 0, 0, 0, 0, 0.7, 0])
    ws = cfg.mpc.weights.set_const_off
    np.testing.assert_allclose(
        W,
        list(ws.pos) + [ws.att[2]] + list(ws.vel) + [ws.att[0], ws.att[1], ws.rates[2], ws.acc],
    )
