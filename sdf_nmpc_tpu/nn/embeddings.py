"""Positional embeddings with off-axis projections.

Parity with reference sdf_nmpc/utils/embeddings.py: the NeRF-style feature
vector ``[x, sin(2^i A x), cos(2^i A x)]`` for i in 0..nb_freqs-1, with
projection directions A drawn from platonic solids (Barron et al. 2022 /
iSDF):  'none' (identity axes), 'cube' (6 face centroids), 'octohedron'
(8: cube vertices), 'dodecahedron' (12: icosahedron vertices), 'icosahedron'
(20: dodecahedron vertices).  nb_embeddings = nb_freqs*n_dirs*2 + 3
(embeddings.py:104).

Implemented as a pure function over a static direction table — it is used
inside the NMPC constraint pipeline and must be cheap to trace/differentiate.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_PHI = (1 + np.sqrt(5.0)) / 2


def _dirs(proj: str) -> np.ndarray:
    """(3, n_dirs) unit projection directions."""
    if proj == "none":
        d = np.eye(3)
    elif proj == "cube":
        d = np.array(
            [[-1, 0, 0], [1, 0, 0], [0, -1, 0], [0, 1, 0], [0, 0, -1], [0, 0, 1]],
            dtype=np.float64,
        ).T
    elif proj == "octohedron":  # reference spelling kept for config compat
        d = np.array(
            [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
            dtype=np.float64,
        )
        # reference ordering: (-1,-1,-1), (-1,-1,1), (-1,1,-1), ... (itertools
        # product order) — matches the nested loop above
        d = d.T
    elif proj == "dodecahedron":
        d = np.array(
            [
                [0, -1, -_PHI], [0, 1, -_PHI], [0, -1, _PHI], [0, 1, _PHI],
                [-1, 0, -_PHI], [1, 0, -_PHI], [-1, 0, _PHI], [1, 0, _PHI],
                [-1, -_PHI, 0], [1, -_PHI, 0], [-1, _PHI, 0], [1, _PHI, 0],
            ],
            dtype=np.float64,
        ).T
    elif proj == "icosahedron":
        h = 1 / _PHI
        d = np.array(
            [
                [1, 1, 1], [1, 1, -1], [1, -1, 1], [1, -1, -1],
                [-1, 1, 1], [-1, 1, -1], [-1, -1, 1], [-1, -1, -1],
                [0, _PHI, h], [0, _PHI, -h], [0, -_PHI, h], [0, -_PHI, -h],
                [h, 0, _PHI], [h, 0, -_PHI], [-h, 0, _PHI], [-h, 0, -_PHI],
                [_PHI, h, 0], [_PHI, -h, 0], [-_PHI, h, 0], [-_PHI, -h, 0],
            ],
            dtype=np.float64,
        ).T
    else:
        raise ValueError(f"unknown off-axis projection mode {proj!r}")
    if proj != "none":
        d = d / np.linalg.norm(d, axis=0)
    return d


class PositionEmbedding:
    """Static positional-embedding table + pure apply.

    x: (..., 3) -> (..., nb_embeddings)
    """

    def __init__(self, nb_freqs: int = 10, proj: str = "none"):
        self.nb_freqs = nb_freqs
        self.proj = proj
        self.dirs = _dirs(proj)  # (3, n_dirs)
        self.freq_bands = 2.0 ** np.arange(nb_freqs)
        self.nb_embeddings = nb_freqs * self.dirs.shape[-1] * 2 + 3

    def __call__(self, x):
        dirs = jnp.asarray(self.dirs, dtype=x.dtype)
        freqs = jnp.asarray(self.freq_bands, dtype=x.dtype)
        proj = x @ dirs  # (..., n_dirs)
        xb = (proj[..., None] * freqs).reshape(*proj.shape[:-1], -1)
        emb = jnp.sin(jnp.concatenate([xb, xb + 0.5 * jnp.pi], axis=-1))
        return jnp.concatenate([x, emb], axis=-1)


def embedding_for(embed: str, nb_freqs: int):
    """Resolve the reference's embed keyword table (neural_df.py:50-58).

    Returns (apply_fn_or_None, nb_embeddings)."""
    avail = {
        "pos": "none",
        "cube": "cube",
        "oct": "octohedron",
        "dod": "dodecahedron",
        "ico": "icosahedron",
    }
    if embed == "none":
        return None, 3
    if embed in avail:
        pe = PositionEmbedding(nb_freqs, proj=avail[embed])
        return pe, pe.nb_embeddings
    raise ValueError(f"unknown embedding {embed!r}")
