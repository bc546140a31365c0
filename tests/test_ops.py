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
