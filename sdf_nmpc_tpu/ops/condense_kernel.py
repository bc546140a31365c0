"""Batch-on-lanes Pallas kernel for the condensing recursion.

The condensed-QP path propagates dx_k = e_k + E_k dz through the horizon:

    e_{k+1} = A_k e_k + d_k,     E_{k+1} = A_k E_k + B_k S_k

(solver/sqp.py step 2).  As a vmapped lax.scan the broadcast-multiply-reduce
body materializes a (B, nx, nx, nz) intermediate per step to HBM — ~260 MB
per step at B=8192, ~26 ms for the N=20 scan (docs/performance.md).

Here the scenario axis rides the 128 vector lanes and the E-recursion runs
statically unrolled with E resident in VMEM (nx x nz x 128 = 410 KB).  Two
structural wins over the XLA form: the (nx, nx, nz) contraction temporary
lives in VMEM, and B_k S_k is not a matmul at all — S_k merely selects the
k-th nu-column block, so B_k is ADDED into columns [k*nu, (k+1)*nu).

Reference context: acados performs this condensing inside generated C
(FULL_CONDENSING_HPIPM, reference ocp.py:113; SURVEY.md §2.3 N2).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qp_kernels import LANES, _round_up

_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",), vmem_limit_bytes=100 * 1024 * 1024
)


def _condense_kernel(
    A_ref, B_ref, d_ref, e0_ref,
    e_st_ref, E_st_ref, eN_ref, EN_ref,
    E_scr,
    *, N, nx, nu,
):
    nz = N * nu
    e = e0_ref[...]  # (nx, L)
    E_scr[...] = jnp.zeros((nx, nz, LANES), jnp.float32)
    for k in range(N):
        e_st_ref[k, :, :] = e
        E_st_ref[k, :, :, :] = E_scr[...]
        A_k = A_ref[k]  # (nx, nx, L)
        # e' = A_k e + d_k ; E' = A_k E, then B_k ADDS into column block k
        # (S_k is a selection matrix — no matmul).  E' is built row-by-row
        # with 3-D temporaries: a single 4-D (nx, nx, nz, L) form stalls the
        # Mosaic compiler at production shapes.
        e = jnp.sum(A_k * e[None, :, :], axis=1) + d_ref[k]
        E_prev = E_scr[...]
        # NOTE plain `A_k[i, :, None, :]` (int + None in one indexing
        # expression) lowers through gather, which Mosaic lacks
        rows = []
        for i in range(nx):
            a_row = A_k[i]  # (nx, L)
            rows.append(jnp.sum(a_row[:, None, :] * E_prev, axis=0))  # (nz, L)
        E_scr[...] = jnp.stack(rows, axis=0)
        E_scr[:, k * nu : (k + 1) * nu, :] = (
            E_scr[:, k * nu : (k + 1) * nu, :] + B_ref[k]
        )
    eN_ref[...] = e
    EN_ref[...] = E_scr[...]


def condense_lanes(A, Bm, d, e0, interpret: bool = False):
    """Condensing recursion, lanes layout.

    A (N, nx, nx, B), Bm (N, nx, nu, B), d (N, nx, B), e0 (nx, B) ->
    (e_stage (N, nx, B), E_stage (N, nx, nz, B), eN (nx, B), EN (nx, nz, B)).
    """
    N, nx = A.shape[0], A.shape[1]
    nu = Bm.shape[2]
    B = A.shape[-1]
    nz = N * nu
    assert B % LANES == 0
    grid = (B // LANES,)
    kern = partial(_condense_kernel, N=N, nx=nx, nu=nu)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, nx, nx, LANES), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, nx, nu, LANES), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, nx, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((N, nx, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, nx, nz, LANES), lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, nz, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, nx, B), jnp.float32),
            jax.ShapeDtypeStruct((N, nx, nz, B), jnp.float32),
            jax.ShapeDtypeStruct((nx, B), jnp.float32),
            jax.ShapeDtypeStruct((nx, nz, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nx, nz, LANES), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        jnp.asarray(A, jnp.float32),
        jnp.asarray(Bm, jnp.float32),
        jnp.asarray(d, jnp.float32),
        jnp.asarray(e0, jnp.float32),
    )


def _interp() -> bool:
    return jax.default_backend() != "tpu"


@custom_batching.custom_vmap
def condense_nodes(A, Bm, d, e0):
    """Single-scenario condensing (solver/sqp.py scan); under a scenario
    vmap the whole batch dispatches to the lanes kernel."""
    import numpy as np

    N, nx = A.shape[0], A.shape[1]
    nu = Bm.shape[2]
    nz = N * nu
    E0 = jnp.zeros((nx, nz), A.dtype)
    S_np = np.zeros((N, nu, nz), np.float32)
    for k in range(N):
        S_np[k, :, k * nu : (k + 1) * nu] = np.eye(nu)
    S = jnp.asarray(S_np, A.dtype)

    def scan_body(carry, xs):
        e_k, E_k = carry
        A_k, B_k, r_k, S_k = xs
        e_next = A_k @ e_k + r_k
        E_next = (A_k[:, :, None] * E_k[None, :, :]).sum(1) + (
            B_k[:, :, None] * S_k[None, :, :]
        ).sum(1)
        return (e_next, E_next), (e_k, E_k)

    (eN, EN), (e_st, E_st) = jax.lax.scan(scan_body, (e0, E0), (A, Bm, d, S))
    return e_st, E_st, eN, EN


@condense_nodes.def_vmap
def _cn_rule(axis_size, in_batched, A, Bm, d, e0):
    ops = [A, Bm, d, e0]
    ops = [
        o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
        for b, o in zip(in_batched, ops)
    ]
    A, Bm, d, e0 = ops
    B = A.shape[0]
    Bp = _round_up(max(B, LANES), LANES)
    if Bp != B:
        pad = lambda x: jnp.concatenate(
            [x, jnp.zeros((Bp - B,) + x.shape[1:], x.dtype)], axis=0
        )
        A, Bm, d, e0 = pad(A), pad(Bm), pad(d), pad(e0)
    bl = lambda x: jnp.moveaxis(x, 0, -1)
    e_st, E_st, eN, EN = condense_lanes(
        bl(A), bl(Bm), bl(d), bl(e0), interpret=_interp()
    )
    lb = lambda x: jnp.moveaxis(x, -1, 0)[:B]
    out = (
        lb(e_st).astype(A.dtype),
        lb(E_st).astype(A.dtype),
        lb(eN).astype(A.dtype),
        lb(EN).astype(A.dtype),
    )
    return out, (True, True, True, True)
