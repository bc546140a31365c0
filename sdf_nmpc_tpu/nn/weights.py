"""Shipped-weights loading (the reference's data/*.pt analogue).

The reference ships TorchScript weights referenced from the config
(reference config/default.yaml:26-31, gen_model.py:32-34, vae.py:11-13); the
repo mount only carries git-LFS stubs, so the framework ships its OWN trained
substitute under <repo>/weights/ (produced by ``python
scripts/train_latent_sdf.py --prod --out weights``): flax msgpack trees +
encoded scene latents + a meta.json with the architecture hyperparameters.

``load_prod_sdf()`` / ``load_prod_encoder()`` return None when no artifacts
are present, so every consumer (benchmarks/run.py configs 2-4, the accuracy
workload) can fall back to deterministic random initialization.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

WEIGHTS_DIR = Path(__file__).resolve().parents[2] / "weights"


def _meta(weights_dir=None):
    d = Path(weights_dir) if weights_dir else WEIGHTS_DIR
    f = d / "meta.json"
    if not f.exists():
        return None
    return json.loads(f.read_text())


def _restore(path):
    from flax import serialization

    return serialization.msgpack_restore(path.read_bytes())


def load_prod_sdf(weights_dir=None, require_latent=None, require_layers=None):
    """(module, variables) for the trained NeuralDF, or None if absent or the
    architecture does not match the requested sizes."""
    d = Path(weights_dir) if weights_dir else WEIGHTS_DIR
    meta = _meta(d)
    if meta is None or not (d / "sdf.msgpack").exists():
        return None
    if require_latent is not None and meta["size_latent"] != require_latent:
        return None
    if require_layers is not None and tuple(meta["layer_sizes"]) != tuple(require_layers):
        return None
    from .neural_df import NeuralDF

    module = NeuralDF(
        size_latent=meta["size_latent"],
        layer_sizes=tuple(meta["layer_sizes"]),
        embed=meta.get("embed", "oct"),
        act=meta.get("act", "sin"),
        w0=meta.get("w0", 8.0),
    )
    return module, _restore(d / "sdf.msgpack")


def meta_img_shape(meta) -> tuple[int, int] | None:
    """(H, W) the encoder was trained at, parsed from meta['img'] 'HxW'."""
    img = (meta or {}).get("img")
    if not img:
        return None
    h, w = str(img).lower().split("x")
    return int(h), int(w)


def load_prod_encoder(weights_dir=None, expect_img=None, strict=False):
    """(encoder_module, variables, meta) for the trained VAE encoder, or
    None.  batchnorm=False (how the training scripts train it).

    expect_img: optional (H, W) the caller will feed.  The encoder's adaptive
    pooling makes any shape *run*, but inputs away from the trained
    resolution (meta['img']) are out of distribution — on mismatch this warns
    (or returns None when strict=True) so consumers resize to the trained
    resolution instead of silently shifting the latent distribution."""
    d = Path(weights_dir) if weights_dir else WEIGHTS_DIR
    meta = _meta(d)
    if meta is None or not (d / "vae_encoder.msgpack").exists():
        return None
    if expect_img is not None:
        trained = meta_img_shape(meta)
        if trained is not None and tuple(expect_img) != trained:
            import warnings

            msg = (
                f"prod VAE encoder was trained at {trained[0]}x{trained[1]} "
                f"but caller feeds {tuple(expect_img)[0]}x{tuple(expect_img)[1]}"
                " — latents will be out of the training distribution; resize"
                " inputs to the trained resolution"
            )
            if strict:
                warnings.warn(msg + " (strict: returning None)")
                return None
            warnings.warn(msg)
    from .vae import Encoder

    # batchnorm=True encoders (the reference-regime h5+augment training,
    # scripts/train_prod_perception.py) ship running batch_stats inside the
    # msgpack; the pre-r4 train_latent_sdf artifacts were batchnorm-free
    module = Encoder(1, meta["size_latent"], dropout_rate=0.0,
                     batchnorm=bool(meta.get("batchnorm", False)))
    return module, _restore(d / "vae_encoder.msgpack"), meta


def load_prod_latents(weights_dir=None):
    """(n, L) encoded scene latents from training, or None."""
    d = Path(weights_dir) if weights_dir else WEIGHTS_DIR
    f = d / "latents.npy"
    return np.load(f) if f.exists() else None
