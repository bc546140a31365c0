"""Generic MLP (reference sdf_nmpc/network/mlp.py) — used by the braking-
distance surrogate fit (theory/braking.py) and available for experiments."""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn


class Mlp(nn.Module):
    size_out: int
    layer_sizes: Sequence[int]
    inner_act: Callable = nn.relu
    out_act: Optional[Callable] = None
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        for n in self.layer_sizes:
            x = self.inner_act(nn.Dense(n)(x))
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        x = nn.Dense(self.size_out)(x)
        if self.out_act is not None:
            x = self.out_act(x)
        return x
