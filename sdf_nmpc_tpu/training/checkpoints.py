"""Checkpoint save/restore for training state.

Replaces the reference's per-epoch TorchScript archives + LR-scheduler
fast-forward on resume (df_train.py:91-114, 250-254; SURVEY.md §5.4) with
flax msgpack serialization: ``weights.msgpack`` (latest) plus
``epochs/e{i}.msgpack`` history, and a JSON sidecar with the epoch counter so
resume restores the cosine schedule position exactly.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
from flax import serialization


def save_checkpoint(folder, params, opt_state, epoch: int, extra: dict | None = None,
                    batch_stats=None):
    folder = Path(folder)
    (folder / "epochs").mkdir(parents=True, exist_ok=True)
    blob = serialization.to_bytes(
        {"params": params, "opt_state": opt_state, "batch_stats": batch_stats or {}}
    )
    (folder / "weights.msgpack").write_bytes(blob)
    (folder / "epochs" / f"e{epoch}.msgpack").write_bytes(blob)
    meta = {"epoch": epoch, **(extra or {})}
    (folder / "state.json").write_text(json.dumps(meta))


def load_encoder_from_vae_ckpt(folder, size_latent: int, H: int, W: int,
                               batchnorm: bool = True, dropout_rate: float = 0.0):
    """(encoder_module, encoder_variables) from a train_vae checkpoint dir.

    train_vae saves the full Vae params tree; the SDF training and eval
    scripts need just the (frozen) encoder with its logvar head and batch
    stats — this slices them out against a matching template."""
    import jax
    import jax.numpy as jnp

    from ..nn.vae import Encoder, Vae

    vae = Vae(size_latent=size_latent, shape_imgs=(1, H, W),
              dropout_rate=dropout_rate, batchnorm=batchnorm)
    key = jax.random.PRNGKey(0)
    template = vae.init({"params": key, "latent": key, "dropout": key},
                        jnp.zeros((1, H, W, 1)), train=True)
    blob = (Path(folder) / "weights.msgpack").read_bytes()
    target = {"params": template["params"], "opt_state": None,
              "batch_stats": template.get("batch_stats", {})}
    restored = serialization.from_bytes(target, blob)
    enc_vars = {"params": restored["params"]["encoder"]}
    if "batch_stats" in template:
        enc_vars["batch_stats"] = restored["batch_stats"]["encoder"]
    encoder = Encoder(1, size_latent, dropout_rate=dropout_rate, batchnorm=batchnorm)
    return encoder, enc_vars


def load_checkpoint(folder, params_template, opt_state_template, epoch: int | None = None,
                    batch_stats_template=None):
    """Restore (params, opt_state, epoch[, batch_stats]).  epoch=None loads
    the latest; batch stats are returned only when a template is given."""
    folder = Path(folder)
    meta = json.loads((folder / "state.json").read_text())
    path = (
        folder / "weights.msgpack"
        if epoch is None
        else folder / "epochs" / f"e{epoch}.msgpack"
    )
    target = {"params": params_template, "opt_state": opt_state_template,
              "batch_stats": batch_stats_template or {}}
    restored = serialization.from_bytes(target, path.read_bytes())
    ep = meta["epoch"] if epoch is None else epoch
    if batch_stats_template is not None:
        return restored["params"], restored["opt_state"], ep, restored["batch_stats"]
    return restored["params"], restored["opt_state"], ep
