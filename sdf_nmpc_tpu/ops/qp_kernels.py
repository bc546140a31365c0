"""Batch-on-lanes Pallas kernels for the QP Newton systems.

The condensed-QP interior point solves thousands of small (nz, nz) SPD
systems per iteration.  XLA's lowering of the blocked batch-first
factorization (solver/linalg.py) bounces the trailing submatrix through HBM
on every block step and re-reads L for every triangular-solve sweep — the IP
iteration is HBM-bound at ~15% of the chip's bandwidth-limited speed of
light (docs/performance.md).

These kernels take the batch-first idea to its conclusion: the SCENARIO axis
lives on the 128 vector lanes, so every step of the textbook scalar Cholesky
recursion is a full-width VPU op on (n, 128) tiles, and the whole
factor-then-solve pipeline runs out of VMEM with one HBM read of M and one
write of the solutions.

Layout: matrices are stored batch-last, M[n, n, B] ("lanes layout").  A
lane-tile of 128 scenarios is one grid instance; n (the condensed dimension,
N*nu = 80 by default) must be a multiple of 8 (f32 sublane).

Replaces (on TPU): spd_factor_batched + spd_factor_solve calls inside
solver/qp.py's Newton step.  Reference context: this is the TPU-native
counterpart of HPIPM's dense Cholesky (reference acados ocp.py:113-116,
SURVEY.md §2.3 N2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128

# the in-kernel (n, n, LANES) rank-1-update temporaries put the kernel's
# scoped-VMEM footprint just past the 16 MiB default at n=80; the chip has
# 128 MiB — raise the scoped limit rather than shrink the lane tile
_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",), vmem_limit_bytes=64 * 1024 * 1024
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _chol_lanes(M_scr, n: int):
    """In-place lane-parallel Cholesky on the (n, n, LANES) VMEM scratch.

    After the loop, column j of M_scr holds L[:, j] with rows < j zeroed.
    The rank-1 update only touches columns > j, so stored columns survive;
    rows <= j of future columns receive garbage that the row mask discards
    at store time.
    """
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

    def step(j, _):
        d = jax.lax.rsqrt(jnp.maximum(M_scr[j, j, :], 1e-30))  # (LANES,)
        col = M_scr[:, j, :] * d[None, :]  # (n, LANES)
        col = jnp.where(row_ids >= j, col, 0.0)
        M_scr[:, j, :] = col
        upd = col[:, None, :] * col[None, :, :]  # (n, n, LANES)
        M_scr[:, :, :] = M_scr[:, :, :] - jnp.where(col_ids > j, upd, 0.0)
        return 0

    jax.lax.fori_loop(0, n, step, 0, unroll=False)


def _chol_lanes_blocked(M_scr, n: int, b: int = 8):
    """_chol_lanes with statically-blocked trailing-submatrix updates.

    The fori-loop form's masked full-width rank-1 updates do n^3 multiply-
    adds where the factorization needs n^3/3 — fine while the kernels were
    HBM-bound, but the fused IP kernel is VPU-bound and the factorization is
    its largest FLOP block.  Blocking the step index statically lets each
    rank-1 update touch only the (8-aligned, Mosaic-friendly) trailing
    slice [kb:, kb:] — ~2.6x less vector work at n=80.  Identical result
    (same operation order within each column).
    """
    assert n % b == 0, (n, b)
    for kb in range(0, n, b):
        m = n - kb
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, m, 1), 1)
        for jj in range(b):
            j = kb + jj
            d = jax.lax.rsqrt(jnp.maximum(M_scr[j, j, :], 1e-30))
            col = M_scr[kb:, j, :] * d[None, :]  # (m, LANES)
            col = jnp.where(row_ids >= jj, col, 0.0)
            M_scr[kb:, j, :] = col
            upd = col[:, None, :] * col[None, :, :]  # (m, m, LANES)
            M_scr[kb:, kb:, :] = M_scr[kb:, kb:, :] - jnp.where(
                col_ids > jj, upd, 0.0
            )


def _tri_solve_lanes(M_scr, b_ref, x_ref, n: int):
    """L L^T X = B with the factored scratch, ALL r right-hand sides per
    recursion step.  b_ref/x_ref: (r, n, LANES).

    The scalar recursion is sequential in j only — the r RHS columns ride
    along as a leading axis, so a stiff-split pass (1 Newton rhs + k_stiff
    Woodbury columns) costs the same 2n sequential steps as a single solve
    instead of r * 2n.  The solve is IN PLACE in x_ref (no scratch): the
    forward sweep stores y there, and the backward sweep at row j reads
    x_ref[j] while it still holds y[j] (rows > j already hold final x, rows
    < j are untouched y that the mask excludes) — VMEM is the scarce
    resource at production shapes."""
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n, 1), 1)

    # forward: y[:, j] = (b[:, j] - sum_{k<j} L[j,k] y[:, k]) / L[j,j]
    def fwd_step(j, _):
        Lrow = M_scr[j, :, :]  # (n, LANES): L[j, k] over k (k<=j valid)
        acc = jnp.sum(
            jnp.where(row_ids < j, Lrow[None] * x_ref[:, :, :], 0.0), axis=1
        )  # (r, LANES)
        x_ref[:, j, :] = (b_ref[:, j, :] - acc) / M_scr[j, j, :][None]
        return 0

    jax.lax.fori_loop(0, n, fwd_step, 0, unroll=False)

    # backward: x[:, j] = (y[:, j] - sum_{k>j} L[k,j] x[:, k]) / L[j,j]
    def bwd_step(i, _):
        j = n - 1 - i
        Lcol = M_scr[:, j, :]  # (n, LANES): L[k, j] over k
        acc = jnp.sum(
            jnp.where(row_ids > j, Lcol[None] * x_ref[:, :, :], 0.0), axis=1
        )
        x_ref[:, j, :] = (x_ref[:, j, :] - acc) / M_scr[j, j, :][None]
        return 0

    jax.lax.fori_loop(0, n, bwd_step, 0, unroll=False)


def _tri_solve_lanes_blocked(M_scr, x_ref, n: int, b: int = 8):
    """L L^T X = B in place; x_ref must INITIALLY HOLD B ((r, n, LANES)).

    Statically-blocked variant of _tri_solve_lanes: the fori form's per-step
    middle-axis reads (x_ref[:, j, :] with traced j) relayout on every one
    of the 2n steps — measured ~6.6 ms/iteration for the stiff 9-RHS pass
    (scripts/bench_ip_kernel.py).  Here the sequential recursion runs only
    inside 8-column diagonal blocks, and cross-block dependencies are
    applied as bulk panel updates over 8-aligned static slices.
    """
    assert n % b == 0, (n, b)
    # forward: y = L^{-1} b
    for kb in range(0, n, b):
        for jj in range(b):
            j = kb + jj
            acc = 0.0
            if jj:
                acc = jnp.sum(
                    M_scr[j, kb:j, :][None] * x_ref[:, kb:j, :], axis=1
                )
            x_ref[:, j, :] = (x_ref[:, j, :] - acc) / M_scr[j, j, :][None]
        if kb + b < n:
            upd = 0.0
            for jj in range(b):
                upd = upd + (
                    M_scr[kb + b :, kb + jj, :][None]
                    * x_ref[:, kb + jj, :][:, None, :]
                )
            x_ref[:, kb + b :, :] = x_ref[:, kb + b :, :] - upd
    # backward: x = L^{-T} y
    for kb in reversed(range(0, n, b)):
        for jj in reversed(range(b)):
            j = kb + jj
            acc = 0.0
            if jj < b - 1:
                acc = jnp.sum(
                    M_scr[j + 1 : kb + b, j, :][None]
                    * x_ref[:, j + 1 : kb + b, :],
                    axis=1,
                )
            x_ref[:, j, :] = (x_ref[:, j, :] - acc) / M_scr[j, j, :][None]
        if kb > 0:
            upd = 0.0
            for jj in range(b):
                k = kb + jj
                upd = upd + (
                    M_scr[k, :kb, :][None] * x_ref[:, k, :][:, None, :]
                )
            x_ref[:, :kb, :] = x_ref[:, :kb, :] - upd


def factor_solve_lanes(M_bl, RHS_bl, interpret: bool = False):
    """Solve M x = b for a batch of SPD systems in lanes layout.

    M_bl (n, n, B), RHS_bl (r, n, B) -> X (r, n, B).  B must be a multiple
    of 128 (pad scenarios); n a multiple of 8.  One grid instance factors a
    128-lane tile in VMEM and runs all r triangular solves against it.
    """
    X, _ = factor_solve_lanes_with_L(M_bl, RHS_bl, interpret=interpret)
    return X


def _factor_solve_L_kernel(M_ref, B_ref, X_ref, L_ref, *, n: int, r: int):
    del r
    # M is input/output-aliased onto L: the copy is a self-copy no-op under
    # aliasing (and the correct initialization in interpret mode), and the
    # factorization runs in place — halves the kernel's VMEM block footprint
    L_ref[:, :, :] = M_ref[:, :, :]
    _chol_lanes_blocked(L_ref, n)
    X_ref[:, :, :] = B_ref[:, :, :]
    _tri_solve_lanes_blocked(L_ref, X_ref, n)


def factor_solve_lanes_with_L(M_bl, RHS_bl, interpret: bool = False):
    """factor_solve_lanes that also returns the factor L (n, n, B) for reuse
    by solve_lanes (the Mehrotra corrector reuses the predictor's factor)."""
    n = M_bl.shape[0]
    r = RHS_bl.shape[0]
    B = M_bl.shape[-1]
    assert B % LANES == 0 and n % 8 == 0, (n, B)
    grid = (B // LANES,)
    kern = partial(_factor_solve_L_kernel, n=n, r=r)
    X, L = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, n, B), jnp.float32),
            jax.ShapeDtypeStruct((n, n, B), jnp.float32),
        ],
        input_output_aliases={0: 1},  # M donated to L: factor in place
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(jnp.asarray(M_bl, jnp.float32), jnp.asarray(RHS_bl, jnp.float32))
    return X, L


def _solve_only_kernel(L_ref, B_ref, X_ref, *, n: int, r: int):
    del r
    X_ref[:, :, :] = B_ref[:, :, :]
    _tri_solve_lanes_blocked(L_ref, X_ref, n)


def solve_lanes(L_bl, RHS_bl, interpret: bool = False):
    """Triangular solves against an existing lanes-layout factor L."""
    n = L_bl.shape[0]
    r = RHS_bl.shape[0]
    B = L_bl.shape[-1]
    grid = (B // LANES,)
    kern = partial(_solve_only_kernel, n=n, r=r)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, n, B), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(jnp.asarray(L_bl, jnp.float32), jnp.asarray(RHS_bl, jnp.float32))


# ---------------------------------------------------------------------------
# stiff-split (Woodbury) fused kernels: the interior point's stiff pass
# excludes the k most-active rows Cs from the factored matrix A and applies
# them exactly via  M^-1 b = A^-1 b - A^-1 Cs' T^-1 Cs A^-1 b  with
# T = diag(1/eta_s) + Cs A^-1 Cs'  (solver/qp.py).  Composed from the plain
# factor/resolve kernels, T's build (Cs @ Xs', a k x k Gram per scenario) and
# every woodbury application (Cs @ x, T-solve, Xs' @ y) were XLA-side batched
# small GEMMs — the same pad-to-128x128-tiles HBM pathology the lanes kernels
# exist to avoid.  These kernels run the ENTIRE stiff solve in VMEM:
# factor A -> solve [rhs; Cs'] -> build+factor T -> correct, one pass.
# ---------------------------------------------------------------------------


def _wood_correct(L_T, Cs, Xs, X, n: int, k: int, r: int):
    """In-place Woodbury correction of X (r, n, LANES): X -= Xs' T^-1 Cs X,
    with T pre-factored in L_T (k, k, LANES).  Cs/Xs: (k, n, LANES)."""
    # u = Cs @ x per rhs: k values of (r, LANES)
    u = [jnp.sum(Cs[i][None] * X[:, :, :], axis=1) for i in range(k)]
    # y = T^-1 u via the factored L_T, fully unrolled (k is tiny, and
    # value-level .at[].set lowers to scatter which Mosaic lacks)
    ys = []
    for j in range(k):
        acc = 0.0
        for m in range(j):
            acc = acc + L_T[j, m, :][None] * ys[m]
        ys.append((u[j] - acc) / L_T[j, j, :][None])
    xs = [None] * k
    for i in range(k):
        j = k - 1 - i
        acc = 0.0
        for m in range(j + 1, k):
            acc = acc + L_T[m, j, :][None] * xs[m]
        xs[j] = (ys[j] - acc) / L_T[j, j, :][None]
    # X -= Xs' y : sum_k Xs[k, n] * y[k]
    upd = jnp.zeros_like(X)
    for i in range(k):
        upd = upd + Xs[i][None, :, :] * xs[i][:, None, :]
    return X - upd


def _stiff_factor_solve_kernel(
    A_ref, B_ref, Cs_ref, dsi_ref, X_ref, L_ref, Xs_ref, Lt_ref, *, n, k, r, eps
):
    # factor A in place in L_ref (aliased with A_ref)
    L_ref[:, :, :] = A_ref[:, :, :]
    _chol_lanes_blocked(L_ref, n)
    # solve the r Newton rhs rows
    X_ref[:, :, :] = B_ref[:, :, :]
    _tri_solve_lanes_blocked(L_ref, X_ref, n)
    # solve the k Woodbury columns
    Xs_ref[:, :, :] = Cs_ref[:, :, :]
    _tri_solve_lanes_blocked(L_ref, Xs_ref, n)
    Xs = Xs_ref[:, :, :]
    Cs = Cs_ref[:, :, :]
    # T = Cs @ Xs' + diag(ds_inv), factored in place in Lt_ref
    for i in range(k):
        Lt_ref[i, :, :] = jnp.sum(Cs[i][None] * Xs, axis=1)
    for i in range(k):
        d = Lt_ref[i, i, :] + dsi_ref[i, :]
        Lt_ref[i, i, :] = d + eps * (jnp.abs(d) + 1e-30)
    _chol_lanes_blocked(Lt_ref, k)
    # Woodbury-correct the Newton rows
    X_ref[:, :, :] = _wood_correct(
        Lt_ref[:, :, :], Cs, Xs, X_ref[:, :, :], n, k, r
    )


def _stiff_resolve_kernel(L_ref, Cs_ref, Xs_ref, Lt_ref, B_ref, X_ref, *, n, k, r):
    X_ref[:, :, :] = B_ref[:, :, :]
    _tri_solve_lanes_blocked(L_ref, X_ref, n)
    X_ref[:, :, :] = _wood_correct(
        Lt_ref[:, :, :], Cs_ref[:, :, :], Xs_ref[:, :, :], X_ref[:, :, :], n, k, r
    )


def stiff_factor_solve_lanes(A_bl, RHS_bl, Cs_bl, dsi_bl, interpret: bool = False):
    """Fused stiff-split factor+solve, lanes layout.

    A (n, n, B), RHS (r, n, B), Cs (k, n, B), ds_inv (k, B) ->
    (X (r, n, B) Woodbury-corrected, L (n, n, B), Xs (k, n, B), Lt (k, k, B)).
    """
    n = A_bl.shape[0]
    r = RHS_bl.shape[0]
    k = Cs_bl.shape[0]
    B = A_bl.shape[-1]
    assert B % LANES == 0 and n % 8 == 0 and k % 8 == 0, (n, k, B)
    grid = (B // LANES,)
    eps = 10 * float(jnp.finfo(jnp.float32).eps)
    kern = partial(_stiff_factor_solve_kernel, n=n, k=k, r=r, eps=eps)
    X, L, Xs, Lt = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, n, B), jnp.float32),
            jax.ShapeDtypeStruct((n, n, B), jnp.float32),
            jax.ShapeDtypeStruct((k, n, B), jnp.float32),
            jax.ShapeDtypeStruct((k, k, B), jnp.float32),
        ],
        input_output_aliases={0: 1},  # A donated to L: factor in place
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        jnp.asarray(A_bl, jnp.float32),
        jnp.asarray(RHS_bl, jnp.float32),
        jnp.asarray(Cs_bl, jnp.float32),
        jnp.asarray(dsi_bl, jnp.float32),
    )
    return X, L, Xs, Lt


def stiff_resolve_lanes(L_bl, Cs_bl, Xs_bl, Lt_bl, RHS_bl, interpret: bool = False):
    """Extra Woodbury-corrected solves against a stiff factor set."""
    n = L_bl.shape[0]
    k = Cs_bl.shape[0]
    r = RHS_bl.shape[0]
    B = L_bl.shape[-1]
    grid = (B // LANES,)
    kern = partial(_stiff_resolve_kernel, n=n, k=k, r=r)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, k, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r, n, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, n, B), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        jnp.asarray(L_bl, jnp.float32),
        jnp.asarray(Cs_bl, jnp.float32),
        jnp.asarray(Xs_bl, jnp.float32),
        jnp.asarray(Lt_bl, jnp.float32),
        jnp.asarray(RHS_bl, jnp.float32),
    )


# ---------------------------------------------------------------------------
# custom_vmap wrappers: solver/qp.py stays single-scenario; under the callers'
# vmap the WHOLE batch dispatches to the lanes kernels.  L is carried between
# factor and solve as moveaxis views of the lanes array — the moveaxis pairs
# cancel in XLA, so the factor never physically transposes.
# ---------------------------------------------------------------------------

from jax import custom_batching


def _pad_lanes(x, axis):
    B = x.shape[axis]
    Bp = _round_up(B, LANES)
    if Bp == B:
        return x, B
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, Bp - B)
    return jnp.pad(x, pad), B


@custom_batching.custom_vmap
def newton_factor_solve(M, RHS):
    """(M (n,n), RHS (r,n)) -> (X (r,n), L-handle).  Single-scenario
    fallback: XLA Cholesky.  Batched: lanes Pallas kernel."""
    L = jnp.linalg.cholesky(M)
    X = jax.scipy.linalg.cho_solve((L, True), RHS.T).T
    return X, L


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def _bcast_unbatched(axis_size, in_batched, *args):
    """Broadcast any operand vmap left unbatched (e.g. a constant RHS) to the
    batch axis so the lanes rules can treat everything as (B, ...)."""
    return tuple(
        a if b else jnp.broadcast_to(a[None], (axis_size,) + a.shape)
        for b, a in zip(in_batched, args)
    )


@newton_factor_solve.def_vmap
def _nfs_rule(axis_size, in_batched, M, RHS):
    M, RHS = _bcast_unbatched(axis_size, in_batched, M, RHS)
    # M (B,n,n), RHS (B,r,n)
    n = M.shape[-1]
    Mp, B = _pad_lanes(M, 0)
    RHSp, _ = _pad_lanes(RHS, 0)
    Bp = Mp.shape[0]
    # pad block must stay factorizable: identity on the diagonal
    if Bp != B:
        eye_mask = jnp.arange(Bp) >= B
        Mp = jnp.where(
            eye_mask[:, None, None],
            jnp.eye(n, dtype=Mp.dtype)[None],
            Mp,
        )
    M_bl = jnp.moveaxis(Mp, 0, -1)  # (n, n, Bp)
    X_bl, L_bl = factor_solve_lanes_with_L(
        M_bl, jnp.moveaxis(RHSp, 0, -1), interpret=_interp()
    )
    X = jnp.moveaxis(X_bl, -1, 0)[:B]  # (B, r, n)
    L = jnp.moveaxis(L_bl, -1, 0)[:B]  # (B, n, n) — lazy view, elides
    return (X, L), (True, True)


@custom_batching.custom_vmap
def newton_resolve(L, RHS):
    """Extra solves against the factor from newton_factor_solve."""
    return jax.scipy.linalg.cho_solve((L, True), RHS.T).T


@newton_resolve.def_vmap
def _nrs_rule(axis_size, in_batched, L, RHS):
    L, RHS = _bcast_unbatched(axis_size, in_batched, L, RHS)
    Lp, B = _pad_lanes(L, 0)
    RHSp, _ = _pad_lanes(RHS, 0)
    Bp = Lp.shape[0]
    if Bp != B:
        n = Lp.shape[-1]
        eye_mask = jnp.arange(Bp) >= B
        Lp = jnp.where(eye_mask[:, None, None], jnp.eye(n, dtype=Lp.dtype)[None], Lp)
    X_bl = solve_lanes(
        jnp.moveaxis(Lp, 0, -1), jnp.moveaxis(RHSp, 0, -1), interpret=_interp()
    )
    return jnp.moveaxis(X_bl, -1, 0)[:B], True


@custom_batching.custom_vmap
def stiff_factor_solve(A, RHS, Cs, ds_inv):
    """(A (n,n), RHS (r,n), Cs (k,n), ds_inv (k,)) ->
    (X (r,n) Woodbury-corrected, handle (L, Xs, Lt) for stiff_resolve).

    Solves the stiff-split Newton system M = A + Cs' diag(1/ds_inv) Cs
    through the well-conditioned augmented form (solver/qp.py).  Single-
    scenario fallback: XLA Cholesky + explicit Woodbury.  Batched: one fused
    lanes kernel."""
    eps = 10 * jnp.finfo(A.dtype).eps
    L = jnp.linalg.cholesky(A)
    X0 = jax.scipy.linalg.cho_solve((L, True), RHS.T).T
    Xs = jax.scipy.linalg.cho_solve((L, True), Cs.T).T  # (k, n)
    T = Cs @ Xs.T + jnp.diag(ds_inv)
    T = T + jnp.diag(eps * (jnp.abs(jnp.diag(T)) + 1e-30))
    Lt = jnp.linalg.cholesky(T)
    y = jax.scipy.linalg.cho_solve((Lt, True), Cs @ X0.T)  # (k, r)
    return X0 - (Xs.T @ y).T, (L, Xs, Lt)


@stiff_factor_solve.def_vmap
def _sfs_rule(axis_size, in_batched, A, RHS, Cs, dsi):
    A, RHS, Cs, dsi = _bcast_unbatched(axis_size, in_batched, A, RHS, Cs, dsi)
    n = A.shape[-1]
    Ap, B = _pad_lanes(A, 0)
    RHSp, _ = _pad_lanes(RHS, 0)
    Csp, _ = _pad_lanes(Cs, 0)
    dsip, _ = _pad_lanes(dsi, 0)
    Bp = Ap.shape[0]
    if Bp != B:
        # pad block must stay factorizable: A = I, Cs = 0, T = diag(1)
        eye_mask = jnp.arange(Bp) >= B
        Ap = jnp.where(eye_mask[:, None, None], jnp.eye(n, dtype=Ap.dtype)[None], Ap)
        dsip = jnp.where(eye_mask[:, None], 1.0, dsip)
    X_bl, L_bl, Xs_bl, Lt_bl = stiff_factor_solve_lanes(
        jnp.moveaxis(Ap, 0, -1),
        jnp.moveaxis(RHSp, 0, -1),
        jnp.moveaxis(Csp, 0, -1),
        jnp.moveaxis(dsip, 0, -1),
        interpret=_interp(),
    )
    out = (
        jnp.moveaxis(X_bl, -1, 0)[:B],
        (
            jnp.moveaxis(L_bl, -1, 0)[:B],
            jnp.moveaxis(Xs_bl, -1, 0)[:B],
            jnp.moveaxis(Lt_bl, -1, 0)[:B],
        ),
    )
    return out, (True, (True, True, True))


@custom_batching.custom_vmap
def stiff_resolve(L, Xs, Lt, Cs, RHS):
    """Extra Woodbury-corrected solves against a stiff_factor_solve handle."""
    X0 = jax.scipy.linalg.cho_solve((L, True), RHS.T).T
    y = jax.scipy.linalg.cho_solve((Lt, True), Cs @ X0.T)
    return X0 - (Xs.T @ y).T


@stiff_resolve.def_vmap
def _srs_rule(axis_size, in_batched, L, Xs, Lt, Cs, RHS):
    L, Xs, Lt, Cs, RHS = _bcast_unbatched(axis_size, in_batched, L, Xs, Lt, Cs, RHS)
    n = L.shape[-1]
    k = Lt.shape[-1]
    Lp, B = _pad_lanes(L, 0)
    Xsp, _ = _pad_lanes(Xs, 0)
    Ltp, _ = _pad_lanes(Lt, 0)
    Csp, _ = _pad_lanes(Cs, 0)
    RHSp, _ = _pad_lanes(RHS, 0)
    Bp = Lp.shape[0]
    if Bp != B:
        eye_mask = jnp.arange(Bp) >= B
        Lp = jnp.where(eye_mask[:, None, None], jnp.eye(n, dtype=Lp.dtype)[None], Lp)
        Ltp = jnp.where(eye_mask[:, None, None], jnp.eye(k, dtype=Ltp.dtype)[None], Ltp)
    X_bl = stiff_resolve_lanes(
        jnp.moveaxis(Lp, 0, -1),
        jnp.moveaxis(Csp, 0, -1),
        jnp.moveaxis(Xsp, 0, -1),
        jnp.moveaxis(Ltp, 0, -1),
        jnp.moveaxis(RHSp, 0, -1),
        interpret=_interp(),
    )
    return jnp.moveaxis(X_bl, -1, 0)[:B], True
