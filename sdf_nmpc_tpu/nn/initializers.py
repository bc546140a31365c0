"""Weight initializers (reference sdf_nmpc/utils/layer_init.py).

``siren_init`` lives in nn.neural_df (applied per-layer there).  The conv
initializer mirrors ``init_conv_layers``: xavier-uniform with the torch
'conv2d' gain (=1) and zero bias, applied to every Conv/ConvTranspose kernel
in a flax params tree.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def xavier_conv_init():
    """kernel_init matching torch xavier_uniform_(gain=calculate_gain('conv2d'))."""
    return jax.nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


def apply_conv_init(params, key):
    """Re-initialize all conv kernels in a params tree with xavier uniform and
    zero their biases (reference layer_init.py:5-12).  Dense layers untouched."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    init = xavier_conv_init()

    leaves = []
    keys = jax.random.split(key, len(flat))
    for (path, leaf), k in zip(flat, keys):
        names = [getattr(p, "key", "") for p in path]
        is_conv = any("Conv" in str(n) for n in names)
        leaf_name = str(names[-1]) if names else ""
        if is_conv and leaf_name == "kernel" and leaf.ndim == 4:
            leaves.append(init(k, leaf.shape, leaf.dtype))
        elif is_conv and leaf_name == "bias":
            leaves.append(jnp.zeros_like(leaf))
        else:
            leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, leaves)
