"""Activations (reference sdf_nmpc/utils/activation.py)."""

from __future__ import annotations

import jax.numpy as jnp


def sine(x, w0: float = 30.0):
    """SIREN sine activation [Sitzmann et al., 2020], default frequency 30
    (reference activation.py:4-13)."""
    return jnp.sin(w0 * x)
