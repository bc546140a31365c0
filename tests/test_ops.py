"""Pallas fused SDF kernel vs the plain-jax oracle (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_nmpc_tpu.nn import init_neural_df
from sdf_nmpc_tpu.ops import make_fused_sdf, reference_value_and_grad


@pytest.mark.parametrize("embed,act", [("pos", "sin"), ("oct", "sin"), ("pos", "relu")])
def test_fused_matches_reference(embed, act):
    L = 16
    module, params = init_neural_df(
        size_latent=L, layer_sizes=(32, 32, 32, 32), embed=embed, act=act, w0=2.0, seed=1
    )
    fused = make_fused_sdf(module, params, tile=8, interpret=True)
    oracle = reference_value_and_grad(module, params)

    rng = np.random.default_rng(0)
    B = 13  # deliberately not a tile multiple
    pos = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    latent = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32) * 0.3)

    df_f, gr_f = fused(pos, latent)
    df_o, gr_o = oracle(pos, latent)
    np.testing.assert_allclose(np.asarray(df_f), np.asarray(df_o), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_o), atol=2e-3)


def test_fused_bf16_close_to_f32():
    """bf16 operands + f32 accumulation: values/grads track the f32 oracle to
    bf16-level tolerance (the on-hardware u0 impact is measured separately,
    docs/performance.md)."""
    L = 16
    module, params = init_neural_df(
        size_latent=L, layer_sizes=(32, 32, 32, 32), embed="pos", act="sin", w0=2.0, seed=1
    )
    fused = make_fused_sdf(module, params, tile=8, interpret=True, dtype="bf16")
    oracle = reference_value_and_grad(module, params)
    rng = np.random.default_rng(3)
    B = 21
    pos = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    latent = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32) * 0.3)
    df_f, gr_f = fused(pos, latent)
    df_o, gr_o = oracle(pos, latent)
    assert df_f.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(df_f), np.asarray(df_o), atol=3e-2)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_o), atol=8e-2)


def test_fused_larger_batch():
    L = 8
    module, params = init_neural_df(size_latent=L, layer_sizes=(16, 16, 16, 16), seed=2)
    fused = make_fused_sdf(module, params, tile=16, interpret=True)
    oracle = reference_value_and_grad(module, params)
    rng = np.random.default_rng(1)
    pos = jnp.asarray(rng.normal(size=(64, 3)).astype(np.float32))
    latent = jnp.asarray(rng.normal(size=(64, L)).astype(np.float32) * 0.2)
    df_f, gr_f = fused(pos, latent)
    df_o, gr_o = oracle(pos, latent)
    np.testing.assert_allclose(np.asarray(df_f), np.asarray(df_o), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_o), atol=2e-3)


# ---------------------------------------------------------------------------
# lanes ERK4 linearization kernel (ops/lin_kernels.py)
# ---------------------------------------------------------------------------


def _model(key="att"):
    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.models import make_model

    return make_model(default_config().replace(mpc=dict(model=key)))


def _rand_xu(rng, n, nx=10):
    x = rng.normal(size=(n, nx)).astype(np.float32)
    x[:, 3:7] += np.array([1.5, 0, 0, 0], np.float32)  # non-degenerate quats
    u = rng.uniform(-0.9, 0.9, size=(n, 4)).astype(np.float32)
    u[:, 0] = rng.uniform(0.1, 0.9, size=n)
    return x, u


@pytest.mark.parametrize(
    "key", ["acc", "att", "att_tau", "rates", "wrench", "props"]
)
def test_f_lanes_matches_f(key):
    model = _model(key)
    assert model.f_lanes is not None
    rng = np.random.default_rng(7)
    x, u = _rand_xu(rng, 32, nx=model.nx)
    want = jax.vmap(model.f)(jnp.asarray(x), jnp.asarray(u))
    got = model.f_lanes(jnp.asarray(x.T), jnp.asarray(u.T)).T
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_erk4_sens_lanes_matches_jacfwd():
    from sdf_nmpc_tpu.ops.lin_kernels import erk4_sens_lanes
    from sdf_nmpc_tpu.solver.integrator import erk4_with_sensitivities

    model = _model()
    rng = np.random.default_rng(3)
    M = 37  # deliberately not a lane multiple
    x, u = _rand_xu(rng, M)
    dt = rng.uniform(0.01, 0.1, size=M).astype(np.float32)

    xn, A, B = erk4_sens_lanes(
        model.f_lanes, jnp.asarray(x), jnp.asarray(u), jnp.asarray(dt), interpret=True
    )
    want = jax.vmap(
        lambda xv, uv, d: erk4_with_sensitivities(model.f, xv, uv, d)
    )(jnp.asarray(x), jnp.asarray(u), jnp.asarray(dt))
    np.testing.assert_allclose(np.asarray(xn), np.asarray(want[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(A), np.asarray(want[1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(B), np.asarray(want[2]), atol=1e-4)


def test_erk4_sens_nodes_vmap_rule():
    """The custom_vmap wrapper dispatches a (B, N) node set to the lanes
    kernel and matches the unbatched jacfwd path."""
    from sdf_nmpc_tpu.ops.lin_kernels import make_erk4_sens_nodes

    model = _model()
    nodes = make_erk4_sens_nodes(model.f, model.f_lanes)
    rng = np.random.default_rng(11)
    Bb, N = 3, 5
    x, u = _rand_xu(rng, Bb * N)
    X = jnp.asarray(x.reshape(Bb, N, 10))
    U = jnp.asarray(u.reshape(Bb, N, 4))
    dt = jnp.asarray(rng.uniform(0.01, 0.1, size=N).astype(np.float32))

    xn_b, A_b, B_b = jax.jit(jax.vmap(lambda Xs, Us: nodes(Xs, Us, dt)))(X, U)
    for b in range(Bb):
        xn, A, Bm = nodes(X[b], U[b], dt)
        np.testing.assert_allclose(np.asarray(xn_b[b]), np.asarray(xn), atol=1e-5)
        np.testing.assert_allclose(np.asarray(A_b[b]), np.asarray(A), atol=1e-4)
        np.testing.assert_allclose(np.asarray(B_b[b]), np.asarray(Bm), atol=1e-4)


@pytest.mark.parametrize("key", ["acc", "att", "att_tau"])
def test_y_lanes_matches_y(key):
    model = _model(key)
    assert model.y_lanes is not None
    rng = np.random.default_rng(9)
    x, u = _rand_xu(rng, 32)
    qd = rng.normal(size=(32, 4)).astype(np.float32)
    qd /= np.linalg.norm(qd, axis=1, keepdims=True)
    # y(x, u, p) consumes q_d through the param layout; emulate a p vector
    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.params import ParamLayout

    layout = ParamLayout.from_cfg(default_config())
    p = np.zeros((32, layout.np_total), np.float32)
    p[:, list(layout.q_d)] = qd
    want = jax.vmap(model.y)(jnp.asarray(x), jnp.asarray(u), jnp.asarray(p))
    got = model.y_lanes(jnp.asarray(x.T), jnp.asarray(u.T), jnp.asarray(qd.T)).T
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_lin_y_nodes_vmap_rule():
    """Combined ERK4+y lanes kernel matches the unbatched jacfwd path."""
    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.ops.lin_kernels import make_lin_y_nodes
    from sdf_nmpc_tpu.params import ParamLayout

    model = _model("att")
    layout = ParamLayout.from_cfg(default_config())

    def y_fn(x, u, p):
        return model.y(x, u, p)

    nodes = make_lin_y_nodes(
        model.f, y_fn, model.f_lanes, model.y_lanes, layout.q_d
    )
    rng = np.random.default_rng(13)
    Bb, N = 2, 4
    x, u = _rand_xu(rng, Bb * N)
    X = jnp.asarray(x.reshape(Bb, N, 10))
    U = jnp.asarray(u.reshape(Bb, N, 4))
    dt = jnp.asarray(rng.uniform(0.01, 0.1, size=N).astype(np.float32))
    p = np.zeros((Bb, N, layout.np_total), np.float32)
    qd = rng.normal(size=(Bb, N, 4)).astype(np.float32)
    qd /= np.linalg.norm(qd, axis=-1, keepdims=True)
    p[..., list(layout.q_d)] = qd
    P = jnp.asarray(p)
    yref = jnp.asarray(rng.normal(size=(Bb, N, 11)).astype(np.float32))

    out_b = jax.jit(
        jax.vmap(lambda Xs, Us, Ps, yr: nodes(Xs, Us, dt, Ps, yr))
    )(X, U, P, yref)
    for b in range(Bb):
        out_s = nodes(X[b], U[b], dt, P[b], yref[b])
        for got, want in zip(out_b, out_s):
            np.testing.assert_allclose(
                np.asarray(got[b]), np.asarray(want), atol=2e-4, rtol=1e-4
            )


def test_fused_mixed_values_exact_grads_bf16():
    """'mixed': values match the f32 oracle exactly-ish, gradients to bf16
    tolerance."""
    L = 16
    module, params = init_neural_df(
        size_latent=L, layer_sizes=(32, 32, 32, 32), embed="pos", act="sin", w0=2.0, seed=1
    )
    fused = make_fused_sdf(module, params, tile=8, interpret=True, dtype="mixed")
    oracle = reference_value_and_grad(module, params)
    rng = np.random.default_rng(6)
    B = 21
    pos = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    latent = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32) * 0.3)
    df_f, gr_f = fused(pos, latent)
    df_o, gr_o = oracle(pos, latent)
    np.testing.assert_allclose(np.asarray(df_f), np.asarray(df_o), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_o), atol=8e-2)


def test_fused_f32x3_close_to_f32():
    """bf16x3 emulation (3 MXU passes) tracks the exact-f32 oracle to ~1e-5."""
    L = 16
    module, params = init_neural_df(
        size_latent=L, layer_sizes=(32, 32, 32, 32), embed="pos", act="sin", w0=2.0, seed=1
    )
    fused = make_fused_sdf(module, params, tile=8, interpret=True, dtype="f32x3")
    oracle = reference_value_and_grad(module, params)
    rng = np.random.default_rng(8)
    B = 21
    pos = jnp.asarray(rng.normal(size=(B, 3)).astype(np.float32))
    latent = jnp.asarray(rng.normal(size=(B, L)).astype(np.float32) * 0.3)
    df_f, gr_f = fused(pos, latent)
    df_o, gr_o = oracle(pos, latent)
    np.testing.assert_allclose(np.asarray(df_f), np.asarray(df_o), atol=5e-4)
    np.testing.assert_allclose(np.asarray(gr_f), np.asarray(gr_o), atol=5e-3)
