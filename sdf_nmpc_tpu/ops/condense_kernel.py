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
    Jyx_ref, Jyu_ref, res_ref, Jhx_ref, Jhu_ref, h_ref,
    e_st_ref, E_st_ref, eN_ref, EN_ref,
    G_ref, resc_ref, C_ref, c0_ref,
    E_scr,
    *, N, nx, nu, ny, nh,
):
    nz = N * nu
    e = e0_ref[...]  # (nx, L)
    E_scr[...] = jnp.zeros((nx, nz, LANES), jnp.float32)
    for k in range(N):
        e_st_ref[k, :, :] = e
        E = E_scr[...]
        E_st_ref[k, :, :, :] = E

        # ---- condensed cost rows: G_k = Jyx_k E_k (+ Jyu_k into block k),
        # res_c_k = res_k + Jyx_k e_k (solver/sqp.py step 3) ----
        Jyx_k = Jyx_ref[k]  # (ny, nx, L)
        for r in range(ny):
            j_row = Jyx_k[r]  # (nx, L)
            G_ref[k, r, :, :] = jnp.sum(j_row[:, None, :] * E, axis=0)
            resc_ref[k, r, :] = res_ref[k, r, :] + jnp.sum(j_row * e, axis=0)
        G_ref[k, :, k * nu : (k + 1) * nu, :] = (
            G_ref[k, :, k * nu : (k + 1) * nu, :] + Jyu_ref[k]
        )

        # ---- condensed constraint rows: C_k, c0_k likewise ----
        if nh > 0:
            Jhx_k = Jhx_ref[k]
            for r in range(nh):
                j_row = Jhx_k[r]
                C_ref[k, r, :, :] = jnp.sum(j_row[:, None, :] * E, axis=0)
                c0_ref[k, r, :] = h_ref[k, r, :] + jnp.sum(j_row * e, axis=0)
            C_ref[k, :, k * nu : (k + 1) * nu, :] = (
                C_ref[k, :, k * nu : (k + 1) * nu, :] + Jhu_ref[k]
            )

        A_k = A_ref[k]  # (nx, nx, L)
        # e' = A_k e + d_k ; E' = A_k E, then B_k ADDS into column block k
        # (S_k is a selection matrix — no matmul).  E' is built row-by-row
        # with 3-D temporaries: a single 4-D (nx, nx, nz, L) form stalls the
        # Mosaic compiler at production shapes.  NOTE plain
        # `A_k[i, :, None, :]` (int + None in one indexing expression)
        # lowers through gather, which Mosaic lacks.
        e = jnp.sum(A_k * e[None, :, :], axis=1) + d_ref[k]
        rows = []
        for i in range(nx):
            a_row = A_k[i]  # (nx, L)
            rows.append(jnp.sum(a_row[:, None, :] * E, axis=0))  # (nz, L)
        E_scr[...] = jnp.stack(rows, axis=0)
        E_scr[:, k * nu : (k + 1) * nu, :] = (
            E_scr[:, k * nu : (k + 1) * nu, :] + B_ref[k]
        )
    eN_ref[...] = e
    EN_ref[...] = E_scr[...]


def condense_lanes(A, Bm, d, e0, Jyx, Jyu, res, Jhx, Jhu, h,
                   interpret: bool = False):
    """Condensing recursion + condensed cost/constraint rows, lanes layout.

    A (N, nx, nx, B), Bm (N, nx, nu, B), d (N, nx, B), e0 (nx, B),
    Jyx (N, ny, nx, B), Jyu (N, ny, nu, B), res (N, ny, B),
    Jhx (N, nh, nx, B), Jhu (N, nh, nu, B), h (N, nh, B) ->
    (e_stage (N, nx, B), E_stage (N, nx, nz, B), eN (nx, B), EN (nx, nz, B),
     G (N, ny, nz, B), res_c (N, ny, B), C (N, nh, nz, B), c0 (N, nh, B)).
    Requires nh >= 1 (the production OCP always has constraint rows).
    """
    N, nx = A.shape[0], A.shape[1]
    nu = Bm.shape[2]
    ny = Jyx.shape[1]
    nh = Jhx.shape[1]
    B = A.shape[-1]
    nz = N * nu
    assert B % LANES == 0 and nh >= 1
    grid = (B // LANES,)
    kern = partial(_condense_kernel, N=N, nx=nx, nu=nu, ny=ny, nh=nh)
    v3 = lambda a, b: pl.BlockSpec((N, a, b, LANES), lambda i: (0, 0, 0, i),
                                   memory_space=pltpu.VMEM)
    v2 = lambda a: pl.BlockSpec((N, a, LANES), lambda i: (0, 0, i),
                                memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            v3(nx, nx), v3(nx, nu), v2(nx),
            pl.BlockSpec((nx, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            v3(ny, nx), v3(ny, nu), v2(ny),
            v3(nh, nx), v3(nh, nu), v2(nh),
        ],
        out_specs=[
            v2(nx),
            v3(nx, nz),
            pl.BlockSpec((nx, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, nz, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            v3(ny, nz), v2(ny), v3(nh, nz), v2(nh),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, nx, B), jnp.float32),
            jax.ShapeDtypeStruct((N, nx, nz, B), jnp.float32),
            jax.ShapeDtypeStruct((nx, B), jnp.float32),
            jax.ShapeDtypeStruct((nx, nz, B), jnp.float32),
            jax.ShapeDtypeStruct((N, ny, nz, B), jnp.float32),
            jax.ShapeDtypeStruct((N, ny, B), jnp.float32),
            jax.ShapeDtypeStruct((N, nh, nz, B), jnp.float32),
            jax.ShapeDtypeStruct((N, nh, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nx, nz, LANES), jnp.float32)],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        jnp.asarray(A, jnp.float32),
        jnp.asarray(Bm, jnp.float32),
        jnp.asarray(d, jnp.float32),
        jnp.asarray(e0, jnp.float32),
        jnp.asarray(Jyx, jnp.float32),
        jnp.asarray(Jyu, jnp.float32),
        jnp.asarray(res, jnp.float32),
        jnp.asarray(Jhx, jnp.float32),
        jnp.asarray(Jhu, jnp.float32),
        jnp.asarray(h, jnp.float32),
    )


def _interp() -> bool:
    return jax.default_backend() != "tpu"


@custom_batching.custom_vmap
def condense_nodes(A, Bm, d, e0, Jyx, Jyu, res, Jhx, Jhu, h):
    """Single-scenario condensing + condensed row builds (solver/sqp.py
    steps 2-3); under a scenario vmap the whole batch dispatches to the
    lanes kernel."""
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
    G = (Jyx[:, :, :, None] * E_st[:, None, :, :]).sum(2) + (
        Jyu[:, :, :, None] * S[:, None, :, :]
    ).sum(2)
    res_c = res + (Jyx * e_st[:, None, :]).sum(-1)
    C = (Jhx[:, :, :, None] * E_st[:, None, :, :]).sum(2) + (
        Jhu[:, :, :, None] * S[:, None, :, :]
    ).sum(2)
    c0 = h + (Jhx * e_st[:, None, :]).sum(-1)
    return e_st, E_st, eN, EN, G, res_c, C, c0


@condense_nodes.def_vmap
def _cn_rule(axis_size, in_batched, *ops):
    ops = [
        o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
        for b, o in zip(in_batched, ops)
    ]
    B = ops[0].shape[0]
    Bp = _round_up(max(B, LANES), LANES)
    if Bp != B:
        ops = [
            jnp.concatenate(
                [o, jnp.zeros((Bp - B,) + o.shape[1:], o.dtype)], axis=0
            )
            for o in ops
        ]
    bl = lambda x: jnp.moveaxis(x, 0, -1)
    outs = condense_lanes(*[bl(o) for o in ops], interpret=_interp())
    lb = lambda x: jnp.moveaxis(x, -1, 0)[:B]
    out = tuple(lb(o).astype(ops[0].dtype) for o in outs)
    return out, tuple(True for _ in out)
