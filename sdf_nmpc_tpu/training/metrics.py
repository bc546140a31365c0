"""Training metrics writers.

The reference logs per-loss-component scalars to TensorBoard with separate
train/valid writers (df_train.py:127-128, 196-236; SURVEY.md §5.5).  Here:
JSONL always (greppable, dependency-free), TensorBoard when available.
"""

from __future__ import annotations

import json
from pathlib import Path


class MetricsWriter:
    def __init__(self, log_dir, use_tensorboard: bool = True):
        self.log_dir = Path(log_dir)
        self.log_dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.log_dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=str(self.log_dir))
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value: float, step: int):
        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": step}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def add_scalars(self, scalars: dict, step: int):
        for tag, value in scalars.items():
            self.add_scalar(tag, value, step)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def df_loss_scalars(parts) -> dict:
    """Tag layout matching the reference (df_train.py:196-201)."""
    return {
        "loss/regression": parts[0],
        "loss/gradient": parts[1],
        "loss/gradient_dir": parts[2],
        "loss/eikonal": parts[3],
        "loss/total": sum(parts),
    }
