"""Batch-first dense linear algebra for the QP Newton systems.

XLA's batched Cholesky/triangular-solve lowers poorly on TPU for the
(B, nz, nz) systems of the condensed QP — measured at 72% of the whole solve
step (scripts/bench_qp_breakdown.py).  These replacements are organized
batch-first: every sequential step of the factorization operates on ALL
matrices in the batch at once, so the inner recursions are short unrolled
chains of (B, nb)-shaped vector ops while all O(n^3) work lands in batched
GEMMs (MXU).

Blocked right-looking Cholesky with block size nb:
  per block column k:  factor the (nb, nb) diagonal block (nb vectorized
  rank-1 steps), triangular-solve the panel (nb vectorized column steps),
  then one batched GEMM rank-nb update of the trailing submatrix.

All loops are Python-static (unrolled at trace time); n must be a multiple of
nb (the QP pads as needed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _chol_small(D, nb: int):
    """Cholesky of (B, nb, nb) SPD blocks, vectorized over B.

    nb sequential rank-1 steps; returns lower-triangular (B, nb, nb)."""
    B = D.shape[0]
    cols = []
    idx = jnp.arange(nb)
    for j in range(nb):
        dj = jnp.sqrt(jnp.maximum(D[..., j, j], 1e-30))
        col = D[..., :, j] / dj[..., None]  # (B, nb)
        col = jnp.where(idx >= j, col, 0.0)
        cols.append(col)
        if j + 1 < nb:
            D = D - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, axis=-1)  # columns j -> (B, nb, nb) lower


def _panel_solve(P, Ld, nb: int):
    """Solve X @ Ld^T = P for X, batched: P (B, m, nb), Ld (B, nb, nb) lower.

    Column-forward substitution, nb vectorized steps on (B, m)."""
    X_cols = []
    for j in range(nb):
        acc = P[..., :, j]
        for m_idx in range(j):
            acc = acc - X_cols[m_idx] * Ld[..., j, m_idx][..., None]
        X_cols.append(acc / Ld[..., j, j][..., None])
    return jnp.stack(X_cols, axis=-1)  # (..., m, nb)


def cholesky_batched(M, nb: int = 16):
    """Lower-Cholesky of (B, n, n) SPD matrices; n must be a multiple of nb."""
    n = M.shape[-1]
    assert n % nb == 0, (n, nb)
    nblk = n // nb

    A = M
    # L assembled block-column by block-column
    col_blocks = []  # list of (B, n - k*nb, nb) tall blocks
    for k in range(nblk):
        D = A[..., :nb, :nb]
        Ld = _chol_small(D, nb)
        if k + 1 < nblk:
            P = A[..., nb:, :nb]  # (B, rem, nb)
            L21 = _panel_solve(P, Ld, nb)
            # trailing rank-nb update: one batched GEMM (MXU)
            S = A[..., nb:, nb:] - jnp.einsum("...ij,...kj->...ik", L21, L21)
            col_blocks.append(jnp.concatenate([Ld, L21], axis=-2))
            A = S
        else:
            col_blocks.append(Ld)

    # assemble (B, n, n)
    L = jnp.zeros_like(M)
    for k, blk in enumerate(col_blocks):
        r0 = k * nb
        L = L.at[..., r0:, r0 : r0 + nb].set(blk)
    return L


def _solve_small_lower(Ld, b, nb: int):
    """y with Ld y = b; Ld (B, nb, nb) lower, b (B, nb).  nb vector steps."""
    ys = []
    for i in range(nb):
        acc = b[..., i]
        for j in range(i):
            acc = acc - Ld[..., i, j] * ys[j]
        ys.append(acc / Ld[..., i, i])
    return jnp.stack(ys, axis=-1)


def _inv_lower_small(Ld, nb: int):
    """Explicit inverse of (B, nb, nb) lower-triangular blocks.

    Forward substitution on the identity, vectorized over batch AND the nb
    right-hand sides — one-time cost at factorization so every subsequent
    solve is a pure matvec instead of a scalar substitution chain."""
    eye = jnp.eye(nb, dtype=Ld.dtype)
    cols = []  # row i of the inverse, all rhs at once: (..., nb)
    rows = []
    for i in range(nb):
        acc = jnp.broadcast_to(eye[i], Ld.shape[:-2] + (nb,))
        for j in range(i):
            acc = acc - Ld[..., i, j][..., None] * rows[j]
        rows.append(acc / Ld[..., i, i][..., None])
    return jnp.stack(rows, axis=-2)  # (..., nb, nb) lower-triangular inverse


def _solve_small_upper_t(Ld, b, nb: int):
    """x with Ld^T x = b (back substitution)."""
    xs = [None] * nb
    for i in reversed(range(nb)):
        acc = b[..., i]
        for j in range(i + 1, nb):
            acc = acc - Ld[..., j, i] * xs[j]
        xs[i] = acc / Ld[..., i, i]
    return jnp.stack(xs, axis=-1)


def diag_block_inverses(L, nb: int = 16):
    """(..., nblk, nb, nb) inverses of the diagonal blocks of L."""
    n = L.shape[-1]
    nblk = n // nb
    return jnp.stack(
        [
            _inv_lower_small(L[..., k * nb : (k + 1) * nb, k * nb : (k + 1) * nb], nb)
            for k in range(nblk)
        ],
        axis=-3,
    )


def cho_solve_batched(L, rhs, nb: int = 16, Linv=None):
    """Solve M x = rhs given L = cholesky_batched(M).  L (B, n, n), rhs (B, n).

    With ``Linv`` (diag_block_inverses(L)) each diagonal-block substitution is
    a matvec — no scalar recursion in the solve at all (the win when one
    factorization serves several right-hand sides, as in the Mehrotra IP)."""
    n = L.shape[-1]
    nblk = n // nb

    # forward: L y = rhs, block rows
    ys = []
    for k in range(nblk):
        r0 = k * nb
        b = rhs[..., r0 : r0 + nb]
        for m_idx in range(k):
            b = b - jnp.einsum(
                "...ij,...j->...i", L[..., r0 : r0 + nb, m_idx * nb : (m_idx + 1) * nb], ys[m_idx]
            )
        if Linv is not None:
            ys.append(jnp.einsum("...ij,...j->...i", Linv[..., k, :, :], b))
        else:
            ys.append(_solve_small_lower(L[..., r0 : r0 + nb, r0 : r0 + nb], b, nb))
    y = jnp.concatenate(ys, axis=-1)

    # backward: L^T x = y, block rows in reverse
    xs = [None] * nblk
    for k in reversed(range(nblk)):
        r0 = k * nb
        b = y[..., r0 : r0 + nb]
        for m_idx in range(k + 1, nblk):
            # (L^T)[k, m] = L[m, k]^T
            b = b - jnp.einsum(
                "...ji,...j->...i", L[..., m_idx * nb : (m_idx + 1) * nb, r0 : r0 + nb], xs[m_idx]
            )
        if Linv is not None:
            xs[k] = jnp.einsum("...ji,...j->...i", Linv[..., k, :, :], b)
        else:
            xs[k] = _solve_small_upper_t(L[..., r0 : r0 + nb, r0 : r0 + nb], b, nb)
    return jnp.concatenate(xs, axis=-1)


def cho_solve_batched_mrhs(L, RHS, nb: int = 16, Linv=None):
    """Solve M X = RHS for matrix RHS given L = cholesky_batched(M).

    L (..., n, n), RHS (..., n, k) -> X (..., n, k).  Identical block
    recursion to cho_solve_batched but every substitution step is a
    (..., nb, k) GEMM — one fused multi-rhs sweep instead of k vmapped
    scalar-substitution chains (the Woodbury stiff-row solves in
    solver/qp.py are k~16 rhs per factorization)."""
    n = L.shape[-1]
    nblk = n // nb

    ys = []
    for kk in range(nblk):
        r0 = kk * nb
        b = RHS[..., r0 : r0 + nb, :]
        for m_idx in range(kk):
            b = b - jnp.einsum(
                "...ij,...jk->...ik",
                L[..., r0 : r0 + nb, m_idx * nb : (m_idx + 1) * nb],
                ys[m_idx],
            )
        if Linv is not None:
            ys.append(jnp.einsum("...ij,...jk->...ik", Linv[..., kk, :, :], b))
        else:
            ys.append(
                jnp.stack(
                    [
                        _solve_small_lower(
                            L[..., r0 : r0 + nb, r0 : r0 + nb], b[..., j], nb
                        )
                        for j in range(b.shape[-1])
                    ],
                    axis=-1,
                )
            )
    y = jnp.concatenate(ys, axis=-2)

    xs = [None] * nblk
    for kk in reversed(range(nblk)):
        r0 = kk * nb
        b = y[..., r0 : r0 + nb, :]
        for m_idx in range(kk + 1, nblk):
            b = b - jnp.einsum(
                "...ji,...jk->...ik",
                L[..., m_idx * nb : (m_idx + 1) * nb, r0 : r0 + nb],
                xs[m_idx],
            )
        if Linv is not None:
            xs[kk] = jnp.einsum("...ji,...jk->...ik", Linv[..., kk, :, :], b)
        else:
            xs[kk] = jnp.stack(
                [
                    _solve_small_upper_t(
                        L[..., r0 : r0 + nb, r0 : r0 + nb], b[..., j], nb
                    )
                    for j in range(b.shape[-1])
                ],
                axis=-1,
            )
    return jnp.concatenate(xs, axis=-2)


def spd_factor_solve_mrhs(factor, n_orig: int, RHS, nb: int = 16):
    """Matrix-RHS companion of spd_factor_solve: RHS (..., n, k)."""
    L, Linv = factor
    n_pad = L.shape[-1]
    if n_pad != n_orig:
        RHS = (
            jnp.zeros(RHS.shape[:-2] + (n_pad, RHS.shape[-1]), RHS.dtype)
            .at[..., :n_orig, :]
            .set(RHS)
        )
    return cho_solve_batched_mrhs(L, RHS, nb, Linv=Linv)[..., :n_orig, :]


def _pad_spd(M, nb):
    n = M.shape[-1]
    n_pad = -(-n // nb) * nb
    if n_pad == n:
        return M, n
    Mp = jnp.zeros(M.shape[:-2] + (n_pad, n_pad), M.dtype)
    Mp = Mp.at[..., :n, :n].set(M)
    Mp = Mp.at[..., jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
    return Mp, n


def spd_solve_batched(M, rhs, nb: int = 16):
    """x = M^-1 rhs for SPD M (..., n, n), rhs (..., n).

    Pads n up to a multiple of nb with an identity tail (inert)."""
    factor, n = spd_factor_batched(M, nb)
    return spd_factor_solve(factor, n, rhs, nb)


def spd_factor_batched(M, nb: int = 16):
    """((L, Linv_blocks), n_orig) with padding folded in; pair with
    spd_factor_solve.  The diagonal-block inverses amortize across the
    multiple solves per factorization in the Mehrotra IP."""
    Mp, n = _pad_spd(M, nb)
    L = cholesky_batched(Mp, nb)
    return (L, diag_block_inverses(L, nb)), n


def spd_factor_solve(factor, n_orig: int, rhs, nb: int = 16):
    L, Linv = factor
    n_pad = L.shape[-1]
    if n_pad != n_orig:
        rhs = jnp.zeros(rhs.shape[:-1] + (n_pad,), rhs.dtype).at[..., :n_orig].set(rhs)
    return cho_solve_batched(L, rhs, nb, Linv=Linv)[..., :n_orig]
