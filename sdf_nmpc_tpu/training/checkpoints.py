"""Checkpoint save/restore for training state.

Replaces the reference's per-epoch TorchScript archives + LR-scheduler
fast-forward on resume (df_train.py:91-114, 250-254; SURVEY.md §5.4) with
flax msgpack serialization: ``weights.msgpack`` (latest) plus
``epochs/e{i}.msgpack`` history, and a JSON sidecar with the epoch counter so
resume restores the cosine schedule position exactly.
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
from flax import serialization


def save_checkpoint(folder, params, opt_state, epoch: int, extra: dict | None = None):
    folder = Path(folder)
    (folder / "epochs").mkdir(parents=True, exist_ok=True)
    blob = serialization.to_bytes({"params": params, "opt_state": opt_state})
    (folder / "weights.msgpack").write_bytes(blob)
    (folder / "epochs" / f"e{epoch}.msgpack").write_bytes(blob)
    meta = {"epoch": epoch, **(extra or {})}
    (folder / "state.json").write_text(json.dumps(meta))


def load_checkpoint(folder, params_template, opt_state_template, epoch: int | None = None):
    """Restore (params, opt_state, epoch).  epoch=None loads the latest."""
    folder = Path(folder)
    meta = json.loads((folder / "state.json").read_text())
    path = (
        folder / "weights.msgpack"
        if epoch is None
        else folder / "epochs" / f"e{epoch}.msgpack"
    )
    target = {"params": params_template, "opt_state": opt_state_template}
    restored = serialization.from_bytes(target, path.read_bytes())
    ep = meta["epoch"] if epoch is None else epoch
    return restored["params"], restored["opt_state"], ep
