"""Runtime parameter-vector ("p") layout.

The reference shares a flat parameter vector between Python and the generated C
solver: ``[flag(1) | W_p_Co(3) | W_R_Co(9) | q_d(4) | latent(L)]``
(config/default.yaml:64-69, consumed at controller.py:47-61, gen_model.py:46-51).

We keep the same flat layout (so configs and logged p-vectors carry over), but
note: the reference stores W_R_Co row-major and must un-do CasADi's
column-major reshape with a transpose (gen_model.py:47 ``.reshape((3,3)).T``).
JAX is row-major, so here ``reshape(3, 3)`` is direct — do NOT replicate the
transpose idiom (SURVEY.md §5.6 trap).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ParamLayout:
    """Index layout of the flat runtime parameter vector."""

    flag: int
    W_p_Co: tuple
    W_R_Co: tuple
    q_d: tuple
    latent_start: int
    size_latent: int

    @property
    def np_total(self) -> int:
        return self.latent_start + self.size_latent

    @classmethod
    def from_cfg(cls, cfg) -> "ParamLayout":
        pi = cfg.mpc.p_idx
        return cls(
            flag=int(pi.flag),
            W_p_Co=tuple(pi.W_p_Co),
            W_R_Co=tuple(pi.W_R_Co),
            q_d=tuple(pi.q_d),
            latent_start=int(pi.latent),
            size_latent=int(cfg.nn.size_latent),
        )

    # -- traced getters (p: (np_total,)) --
    def get_flag(self, p):
        return p[self.flag]

    def get_W_p_Co(self, p):
        return p[jnp.asarray(self.W_p_Co)]

    def get_W_R_Co(self, p):
        """(3,3) camera-to-world rotation; stored row-major in p."""
        return p[jnp.asarray(self.W_R_Co)].reshape(3, 3)

    def get_q_d(self, p):
        return p[jnp.asarray(self.q_d)]

    def get_latent(self, p):
        return p[self.latent_start :]

    # -- host-side setters (p_mat: (N+1, np_total) numpy, mutated in place) --
    def set_flag(self, p_mat: np.ndarray, flag: float):
        p_mat[..., self.flag] = float(flag)

    def set_camera(self, p_mat: np.ndarray, W_p_Co, W_R_Co):
        p_mat[..., list(self.W_p_Co)] = np.asarray(W_p_Co).reshape(-1)
        p_mat[..., list(self.W_R_Co)] = np.asarray(W_R_Co).reshape(9)  # row-major

    def set_q_d(self, p_mat: np.ndarray, q_d):
        p_mat[..., list(self.q_d)] = np.asarray(q_d).reshape(-1)

    def set_latent(self, p_mat: np.ndarray, latent):
        p_mat[..., self.latent_start :] = np.asarray(latent).reshape(-1)
