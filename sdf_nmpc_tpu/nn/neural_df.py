"""Neural (truncated, signed) distance-field MLP.

Parity with reference sdf_nmpc/network/neural_df.py: input ``[pos(3) | latent]``;
positional embedding on the position; two hidden blocks ('main1', 'main2') with
a mid-network residual re-concatenation of embeddings and/or latent ('res' mode
full/state/latent/none); scalar df head.  Activations: sine (SIREN, w0),
relu, softplus.  Attributes ``max_df``/``signed``/``size_latent`` are consumed
by the OCP assembly (reference gen_model.py:35).

TPU-first notes: in the reference this network runs on CPU through
L4CasADi-generated C++ per shooting node (SURVEY.md §2.3 N4).  Here it is a
flax module evaluated *inside* the jitted solve across all nodes x scenarios
at once; sdf_nmpc_tpu/ops/sdf_fused.py provides the fused Pallas
value+Jacobian kernel for the hot path.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .activation import sine
from .embeddings import embedding_for


def siren_init(w0: float):
    """SIREN linear init: U(-sqrt(6/fan_in)/w0, +sqrt(6/fan_in)/w0)
    (reference layer_init.py:15-25)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        bound = np.sqrt(6.0 / fan_in) / w0
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class NeuralDF(nn.Module):
    nb_states: int = 3
    size_latent: int = 128
    signed: bool = True
    max_df: float = 1.0
    res: str = "full"  # 'full' | 'state' | 'latent' | 'none'
    w0: float = 1.0
    embed: str = "pos"  # 'none' | 'pos' | 'cube' | 'oct' | 'dod' | 'ico'
    act: str = "sin"  # 'sin' | 'relu' | 'softplus'
    layer_sizes: Sequence[int] = (256, 256, 256, 256)
    dropout_rate: float = 0.0
    nb_freqs: int = 5

    def setup(self):
        self._embed_fn, self.nb_embeddings = embedding_for(self.embed, self.nb_freqs)
        if self.act == "sin":
            self._act = lambda x: sine(x, self.w0)
            dense = lambda n, name: nn.Dense(n, kernel_init=siren_init(self.w0), name=name)
        elif self.act == "relu":
            self._act = nn.relu
            dense = lambda n, name: nn.Dense(n, name=name)
        elif self.act == "softplus":
            self._act = nn.softplus
            dense = lambda n, name: nn.Dense(n, name=name)
        else:
            raise ValueError(f"unknown activation {self.act!r}")

        ls = self.layer_sizes
        self.main1_0 = dense(ls[0], "main1_0")
        self.main1_1 = dense(ls[1], "main1_1")
        self.main2_0 = dense(ls[2], "main2_0")
        self.main2_1 = dense(ls[3], "main2_1")
        self.df_head = nn.Dense(1, name="df")
        self.dropout = nn.Dropout(self.dropout_rate)

    def __call__(self, x, train: bool = False):
        """x: (..., 3 + size_latent) -> (..., 1) truncated distance."""
        state = x[..., :3]
        latent = x[..., 3:]
        emb = self._embed_fn(state) if self._embed_fn is not None else state
        h = jnp.concatenate([emb, latent], axis=-1)
        h = self.dropout(self._act(self.main1_0(h)), deterministic=not train)
        h = self.dropout(self._act(self.main1_1(h)), deterministic=not train)
        if self.res in ("full", "state"):
            h = jnp.concatenate([h, emb], axis=-1)
        if self.res in ("full", "latent"):
            h = jnp.concatenate([h, latent], axis=-1)
        h = self.dropout(self._act(self.main2_0(h)), deterministic=not train)
        h = self.dropout(self._act(self.main2_1(h)), deterministic=not train)
        return self.df_head(h)


def make_sdf_fn(module: NeuralDF, params):
    """Scalar (pos3, latent) -> df closure for the OCP assembly
    (sdf_nmpc_tpu/ocp.py build_ocp sdf_fn argument)."""

    def sdf_fn(pos, latent):
        x = jnp.concatenate([pos, latent])
        return module.apply(params, x)[0]

    return sdf_fn


def init_neural_df(cfg_nn=None, *, size_latent=128, seed=0, **kwargs) -> tuple:
    """(module, params) with fresh initialization."""
    module = NeuralDF(size_latent=size_latent, **kwargs)
    params = module.init(
        jax.random.PRNGKey(seed), jnp.zeros(3 + size_latent), train=False
    )
    return module, params
