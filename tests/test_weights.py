"""Shipped-weights artifact loading (nn/weights.py) — the framework's
analogue of the reference's data/*.pt shipping (reference
config/default.yaml:26-31): msgpack trees + meta.json under a weights dir,
with architecture-mismatch guards and None fallback."""

import json

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from sdf_nmpc_tpu.nn import Encoder, init_neural_df
from sdf_nmpc_tpu.nn.weights import (
    load_prod_encoder,
    load_prod_latents,
    load_prod_sdf,
)


def _write_artifacts(d, latent=8, layers=(16, 16, 16, 16)):
    module, params = init_neural_df(
        size_latent=latent, layer_sizes=list(layers), embed="oct", act="sin",
        w0=8.0, seed=5,
    )
    (d / "sdf.msgpack").write_bytes(serialization.to_bytes(params))
    enc = Encoder(1, latent, dropout_rate=0.0, batchnorm=False)
    evars = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 24, 32, 1)))
    (d / "vae_encoder.msgpack").write_bytes(serialization.to_bytes(evars))
    lat = np.arange(40 * latent, dtype=np.float32).reshape(40, latent)
    np.save(d / "latents.npy", lat)
    (d / "meta.json").write_text(
        json.dumps(dict(size_latent=latent, layer_sizes=list(layers),
                        embed="oct", act="sin", w0=8.0))
    )
    return module, params, lat


def test_sdf_roundtrip_and_guards(tmp_path):
    module, params, lat = _write_artifacts(tmp_path)
    loaded = load_prod_sdf(tmp_path)
    assert loaded is not None
    mod2, var2 = loaded
    assert mod2.layer_sizes == (16, 16, 16, 16) and mod2.w0 == 8.0
    x = jnp.asarray(np.random.default_rng(0).normal(size=11), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(module.apply(params, x)), np.asarray(mod2.apply(var2, x)),
        rtol=1e-6,
    )
    # mismatch guards -> None (callers fall back to random init)
    assert load_prod_sdf(tmp_path, require_latent=128) is None
    assert load_prod_sdf(tmp_path, require_layers=(256,) * 4) is None
    assert load_prod_sdf(tmp_path / "nope") is None


def test_encoder_and_latents(tmp_path):
    _write_artifacts(tmp_path)
    enc, evars, meta = load_prod_encoder(tmp_path)
    out = enc.apply(evars, jnp.zeros((1, 24, 32, 1)))
    assert out.shape == (1, 8)
    lat = load_prod_latents(tmp_path)
    assert lat.shape == (40, 8) and lat[1, 0] == 8.0
    assert load_prod_latents(tmp_path / "nope") is None


def test_batchnorm_encoder_roundtrip(tmp_path):
    """meta batchnorm=true artifacts (the h5+augment production training,
    scripts/train_prod_perception.py) restore with their running stats."""
    latent = 8
    enc = Encoder(1, latent, dropout_rate=0.0, batchnorm=True)
    evars = enc.init(jax.random.PRNGKey(1), jnp.zeros((1, 24, 32, 1)))
    evars = jax.tree.map(lambda x: x, evars)  # plain dict copy
    (tmp_path / "vae_encoder.msgpack").write_bytes(serialization.to_bytes(
        {"params": evars["params"], "batch_stats": evars["batch_stats"]}
    ))
    (tmp_path / "meta.json").write_text(
        json.dumps(dict(size_latent=latent, layer_sizes=[16] * 4,
                        img="24x32", batchnorm=True))
    )
    enc2, evars2, meta = load_prod_encoder(tmp_path)
    assert enc2.batchnorm is True
    x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 24, 32, 1)),
                    jnp.float32)
    np.testing.assert_allclose(
        np.asarray(enc.apply(evars, x)), np.asarray(enc2.apply(evars2, x)),
        rtol=1e-6,
    )


def test_encoder_resolution_gate(tmp_path):
    _write_artifacts(tmp_path)
    (tmp_path / "meta.json").write_text(
        json.dumps(dict(size_latent=8, layer_sizes=[16] * 4, img="24x32"))
    )
    import pytest

    assert load_prod_encoder(tmp_path, expect_img=(24, 32)) is not None
    with pytest.warns(UserWarning):
        assert load_prod_encoder(tmp_path, expect_img=(48, 64),
                                 strict=True) is None
