"""Batch-on-lanes Pallas kernel for the ERK4 linearization.

The RTI step's single biggest non-QP block is the integrator sensitivity
chain: ``jacfwd`` through an RK4 step materializes every tangent intermediate
of the (B, N, nx+nu)-shaped chain to HBM — XLA cost analysis reports ~39 GB
of bytes accessed for ~3 GFLOP at B=8192 (docs/performance.md), because the
per-scenario dims (nx=10, nu=4) are far below tile size and the deep tangent
chains do not fuse.

This kernel computes the full discrete linearization
    x_next = RK4(f, x, u, dt),  A = d x_next/dx,  B = d x_next/du
entirely in VMEM: one grid instance holds 128 scenarios on the vector lanes,
the dynamics run in "lanes form" (state components on the sublane axis,
scenarios on the lane axis — every scalar of the reference's per-scenario C
loop becomes a 128-wide VPU op), and the tangent propagation is
``jax.linearize`` applied once plus nx+nu unit-tangent sweeps, all fused.
HBM traffic drops to the inputs and outputs only (~134 MB at B=8192, N=20).

Models opt in by providing ``f_lanes(x, u)`` on their ModelSpec: the same
continuous dynamics as ``f`` but written for x (nx, LANES) / u (nu, LANES)
arrays with elementwise component arithmetic (no matmuls, no trailing-axis
reductions).  Equivalence with ``f`` is golden-tested per model.

Reference context: replaces acados' generated ERK integrator + sensitivity
propagation (reference ocp.py:106; SURVEY.md §2.3 N1) on the TPU hot path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solver.integrator import erk4, erk4_with_sensitivities

LANES = 128

_COMPILER_PARAMS = pltpu.CompilerParams(dimension_semantics=("parallel",))


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _erk4_sens_kernel(x_ref, u_ref, dt_ref, xn_ref, A_ref, B_ref, *, f_lanes, nx, nu):
    x = x_ref[...]  # (nx, LANES)
    u = u_ref[...]  # (nu, LANES)
    dt = dt_ref[0, :]  # (LANES,)

    step = lambda x_, u_: erk4(f_lanes, x_, u_, dt)
    x_next, lin = jax.linearize(step, x, u)
    xn_ref[...] = x_next

    row_x = jax.lax.broadcasted_iota(jnp.int32, (nx, LANES), 0)
    row_u = jax.lax.broadcasted_iota(jnp.int32, (nu, LANES), 0)
    zx = jnp.zeros((nx, LANES), x.dtype)
    zu = jnp.zeros((nu, LANES), x.dtype)
    # one unit-tangent sweep per input column; unrolled — the linearized
    # dynamics are ~a hundred VPU ops, so nx+nu=14 sweeps stay tiny
    for i in range(nx):
        A_ref[:, i, :] = lin((row_x == i).astype(x.dtype), zu)
    for j in range(nu):
        B_ref[:, j, :] = lin(zx, (row_u == j).astype(x.dtype))


def erk4_sens_lanes(f_lanes, X, U, dt, interpret: bool = False):
    """Batched ERK4 step + exact discrete sensitivities, lanes kernel.

    X (M, nx), U (M, nu), dt (M,) -> (x_next (M, nx), A (M, nx, nx),
    B (M, nx, nu)).  M is padded up to a multiple of 128 internally.
    """
    M, nx = X.shape
    nu = U.shape[-1]
    Mp = _round_up(max(M, LANES), LANES)
    if Mp != M:
        X = jnp.pad(X, ((0, Mp - M), (0, 0)))
        U = jnp.pad(U, ((0, Mp - M), (0, 0)))
        dt = jnp.pad(dt, (0, Mp - M))
    X_bl = jnp.moveaxis(jnp.asarray(X, jnp.float32), 0, -1)  # (nx, Mp)
    U_bl = jnp.moveaxis(jnp.asarray(U, jnp.float32), 0, -1)
    dt_bl = jnp.asarray(dt, jnp.float32)[None, :]  # (1, Mp)

    grid = (Mp // LANES,)
    kern = partial(_erk4_sens_kernel, f_lanes=f_lanes, nx=nx, nu=nu)
    xn, A, B = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nx, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nu, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nx, LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, nx, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((nx, nu, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nx, Mp), jnp.float32),
            jax.ShapeDtypeStruct((nx, nx, Mp), jnp.float32),
            jax.ShapeDtypeStruct((nx, nu, Mp), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(X_bl, U_bl, dt_bl)
    x_next = jnp.moveaxis(xn, -1, 0)[:M]
    A_out = jnp.moveaxis(A, -1, 0)[:M]
    B_out = jnp.moveaxis(B, -1, 0)[:M]
    return x_next, A_out, B_out


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def make_erk4_sens_nodes(f, f_lanes):
    """Node-batched linearizer with a lanes-kernel batch rule.

    Returns erk4_sens_nodes(X (N, nx), U (N, nu), dt (N,)) -> (x_next, A, B)
    per node.  Called unbatched (single scenario) it runs the plain
    jacfwd path; under a scenario vmap the WHOLE (B, N) node set dispatches
    to one Pallas lanes kernel (the two axes collapse — every shooting node
    of every scenario is an independent linearization problem).
    """

    @custom_batching.custom_vmap
    def erk4_sens_nodes(X, U, dt):
        return jax.vmap(lambda x, u, d: erk4_with_sensitivities(f, x, u, d))(
            X, U, dt
        )

    @erk4_sens_nodes.def_vmap
    def _rule(axis_size, in_batched, X, U, dt):
        xb, ub, db = in_batched
        if not xb:
            X = jnp.broadcast_to(X[None], (axis_size,) + X.shape)
        if not ub:
            U = jnp.broadcast_to(U[None], (axis_size,) + U.shape)
        if not db:
            dt = jnp.broadcast_to(dt[None], (axis_size,) + dt.shape)
        nx = X.shape[-1]
        nu = U.shape[-1]
        lead = X.shape[:-1]
        xn, A, B = erk4_sens_lanes(
            f_lanes,
            X.reshape(-1, nx),
            U.reshape(-1, nu),
            jnp.broadcast_to(dt, lead).reshape(-1),
            interpret=_interp(),
        )
        out = (
            xn.reshape(lead + (nx,)).astype(X.dtype),
            A.reshape(lead + (nx, nx)).astype(X.dtype),
            B.reshape(lead + (nx, nu)).astype(X.dtype),
        )
        return out, (True, True, True)

    return erk4_sens_nodes


# ---------------------------------------------------------------------------
# Combined ERK4 + stage-residual linearization: one jax.linearize covers the
# dynamics map AND the cost residual, so the 14 unit-tangent sweeps emit
# (A, B) and (Jyx, Jyu) together from shared loads.  The standalone y-jacfwd
# path cost ~29 ms at B=8192 (in-context ablation, docs/performance.md).
# ---------------------------------------------------------------------------


def _erk4_y_sens_kernel(
    x_ref, u_ref, dt_ref, qd_ref, yref_ref,
    xn_ref, A_ref, B_ref, res_ref, Jyx_ref, Jyu_ref,
    *, f_lanes, y_lanes, nx, nu, ny,
):
    x = x_ref[...]
    u = u_ref[...]
    dt = dt_ref[0, :]
    qd = qd_ref[...]

    def both(x_, u_):
        return erk4(f_lanes, x_, u_, dt), y_lanes(x_, u_, qd)

    (x_next, y_val), lin = jax.linearize(both, x, u)
    xn_ref[...] = x_next
    res_ref[...] = y_val - yref_ref[...]

    row_x = jax.lax.broadcasted_iota(jnp.int32, (nx, LANES), 0)
    row_u = jax.lax.broadcasted_iota(jnp.int32, (nu, LANES), 0)
    zx = jnp.zeros((nx, LANES), x.dtype)
    zu = jnp.zeros((nu, LANES), x.dtype)
    for i in range(nx):
        dxn, dy = lin((row_x == i).astype(x.dtype), zu)
        A_ref[:, i, :] = dxn
        Jyx_ref[:, i, :] = dy
    for j in range(nu):
        dxn, dy = lin(zx, (row_u == j).astype(x.dtype))
        B_ref[:, j, :] = dxn
        Jyu_ref[:, j, :] = dy


def erk4_y_sens_lanes(f_lanes, y_lanes, X, U, dt, qd, yref,
                      interpret: bool = False):
    """X (M, nx), U (M, nu), dt (M,), qd (M, 4), yref (M, ny) ->
    (x_next (M, nx), A (M, nx, nx), B (M, nx, nu), res (M, ny),
     Jyx (M, ny, nx), Jyu (M, ny, nu))."""
    M, nx = X.shape
    nu = U.shape[-1]
    ny = yref.shape[-1]
    nq = qd.shape[-1]
    Mp = _round_up(max(M, LANES), LANES)
    if Mp != M:
        pad = lambda a: jnp.pad(a, ((0, Mp - M),) + ((0, 0),) * (a.ndim - 1))
        X, U, dt, qd, yref = pad(X), pad(U), pad(dt), pad(qd), pad(yref)
    bl = lambda a: jnp.moveaxis(jnp.asarray(a, jnp.float32), 0, -1)

    grid = (Mp // LANES,)
    kern = partial(
        _erk4_y_sens_kernel, f_lanes=f_lanes, y_lanes=y_lanes,
        nx=nx, nu=nu, ny=ny,
    )
    v1 = lambda a: pl.BlockSpec((a, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
    v2 = lambda a, b: pl.BlockSpec((a, b, LANES), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM)
    xn, A, B, res, Jyx, Jyu = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[v1(nx), v1(nu), v1(1), v1(nq), v1(ny)],
        out_specs=[v1(nx), v2(nx, nx), v2(nx, nu), v1(ny), v2(ny, nx),
                   v2(ny, nu)],
        out_shape=[
            jax.ShapeDtypeStruct((nx, Mp), jnp.float32),
            jax.ShapeDtypeStruct((nx, nx, Mp), jnp.float32),
            jax.ShapeDtypeStruct((nx, nu, Mp), jnp.float32),
            jax.ShapeDtypeStruct((ny, Mp), jnp.float32),
            jax.ShapeDtypeStruct((ny, nx, Mp), jnp.float32),
            jax.ShapeDtypeStruct((ny, nu, Mp), jnp.float32),
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(bl(X), bl(U), jnp.asarray(dt, jnp.float32)[None, :], bl(qd), bl(yref))
    ub = lambda a: jnp.moveaxis(a, -1, 0)[:M]
    return ub(xn), ub(A), ub(B), ub(res), ub(Jyx), ub(Jyu)


def make_lin_y_nodes(f, y_fn, f_lanes, y_lanes, qd_idx):
    """Node-batched (linearization + stage residual) with a lanes batch rule.

    Returns lin_y_nodes(X (N, nx), U (N, nu), dt (N,), P (N, np),
    yref (N, ny)) -> (x_next, A, B, res, Jyx, Jyu) per node.  y_fn is the
    composed OCP residual y(x, u, p); callers must only install this when it
    equals the model residual that y_lanes mirrors (no extra cost rows).
    """

    @custom_batching.custom_vmap
    def lin_y_nodes(X, U, dt, P, yref):
        def node(x, u, d, p, yr):
            x_next, A, B = erk4_with_sensitivities(f, x, u, d)
            y_val = y_fn(x, u, p)
            Jyx = jax.jacfwd(lambda xv: y_fn(xv, u, p))(x)
            Jyu = jax.jacfwd(lambda uv: y_fn(x, uv, p))(u)
            return x_next, A, B, y_val - yr, Jyx, Jyu

        return jax.vmap(node)(X, U, dt, P, yref)

    @lin_y_nodes.def_vmap
    def _rule(axis_size, in_batched, X, U, dt, P, yref):
        ops = [X, U, dt, P, yref]
        ops = [
            o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
            for b, o in zip(in_batched, ops)
        ]
        X, U, dt, P, yref = ops
        nx = X.shape[-1]
        nu = U.shape[-1]
        ny = yref.shape[-1]
        lead = X.shape[:-1]
        qd = P.reshape(-1, P.shape[-1])[:, jnp.asarray(qd_idx)]
        xn, A, B, res, Jyx, Jyu = erk4_y_sens_lanes(
            f_lanes, y_lanes,
            X.reshape(-1, nx), U.reshape(-1, nu),
            jnp.broadcast_to(dt, lead).reshape(-1),
            qd, yref.reshape(-1, ny),
            interpret=_interp(),
        )
        out = (
            xn.reshape(lead + (nx,)).astype(X.dtype),
            A.reshape(lead + (nx, nx)).astype(X.dtype),
            B.reshape(lead + (nx, nu)).astype(X.dtype),
            res.reshape(lead + (ny,)).astype(X.dtype),
            Jyx.reshape(lead + (ny, nx)).astype(X.dtype),
            Jyu.reshape(lead + (ny, nu)).astype(X.dtype),
        )
        return out, tuple(True for _ in out)

    return lin_y_nodes
