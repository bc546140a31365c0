"""Input normalizer buffer module (reference sdf_nmpc/utils/normalizer.py).

Stats are plain arrays computed once before training, stored alongside params.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class NormalizerStats(NamedTuple):
    mean: jnp.ndarray
    std: jnp.ndarray


def compute_stats(data) -> NormalizerStats:
    return NormalizerStats(
        mean=jnp.mean(data, axis=0), std=jnp.std(data, axis=0)
    )


def normalize(x, stats: NormalizerStats, eps: float = 1e-6):
    return (x - stats.mean) / (stats.std + eps)
