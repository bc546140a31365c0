#!/usr/bin/env python
"""Compare batched SPD-solve strategies on the current device:
XLA Cholesky, LU solve, batch-vectorized hand Cholesky, Jacobi-CG."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, *args, iters=20):
    out = fn(*args)
    out.block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        out.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def main():
    import jax
    import jax.numpy as jnp

    B, n = 1024, 80
    rng = np.random.default_rng(0)
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    M = np.einsum("bij,bkj->bik", A, A) / n + 10.0 * np.eye(n, dtype=np.float32)
    rhs = rng.normal(size=(B, n)).astype(np.float32)
    Mj, bj = jnp.asarray(M), jnp.asarray(rhs)

    x_ref = np.linalg.solve(M.astype(np.float64), rhs.astype(np.float64)[..., None])[..., 0]

    def report(name, t, x):
        err = np.abs(np.asarray(x) - x_ref).max()
        print(f"{name:28s} {t * 1e3:8.2f} ms   max_err {err:.2e}")

    # 1. XLA cholesky + cho_solve
    @jax.jit
    def chol_solve(M, b):
        L = jnp.linalg.cholesky(M)
        return jax.vmap(lambda L, b: jax.scipy.linalg.cho_solve((L, True), b))(L, b)

    t, x = timeit(chol_solve, Mj, bj)
    report("cholesky+cho_solve", t, x)

    # 2. LU solve
    @jax.jit
    def lu_solve(M, b):
        return jnp.linalg.solve(M, b[..., None])[..., 0]

    t, x = timeit(lu_solve, Mj, bj)
    report("jnp.linalg.solve (LU)", t, x)

    # 3. batch-vectorized hand Cholesky (scan over columns, ops on (B, n))
    @jax.jit
    def hand_chol_solve(M, b):
        def factor_col(Mc, j):
            d = jnp.sqrt(Mc[:, j, j])
            col = Mc[:, :, j] / d[:, None]  # (B, n)
            mask = (jnp.arange(n) > j).astype(Mc.dtype)
            colm = col * mask[None, :]
            Mc = Mc - colm[:, :, None] * colm[:, None, :]
            Mc = Mc.at[:, :, j].set(col)
            return Mc, None

        Lfull, _ = jax.lax.scan(factor_col, M, jnp.arange(n))
        L = jnp.tril(Lfull)
        y = jax.vmap(lambda L, b: jax.scipy.linalg.solve_triangular(L, b, lower=True))(L, b)
        return jax.vmap(
            lambda L, y: jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
        )(L, y)

    t, x = timeit(hand_chol_solve, Mj, bj)
    report("hand cholesky (col scan)", t, x)

    # 4. Jacobi-preconditioned CG, fixed 40 iterations (pure matmuls)
    @jax.jit
    def cg_solve(M, b):
        dinv = 1.0 / jnp.einsum("bii->bi", M)

        def mv(v):
            return jnp.einsum("bij,bj->bi", M, v)

        x = jnp.zeros_like(b)
        r = b
        z = dinv * r
        p = z
        rz = jnp.einsum("bi,bi->b", r, z)

        def body(carry, _):
            x, r, p, rz = carry
            Mp = mv(p)
            alpha = rz / jnp.einsum("bi,bi->b", p, Mp)
            x = x + alpha[:, None] * p
            r = r - alpha[:, None] * Mp
            z = dinv * r
            rz_new = jnp.einsum("bi,bi->b", r, z)
            beta = rz_new / rz
            p = z + beta[:, None] * p
            return (x, r, p, rz_new), None

        (x, *_), _ = jax.lax.scan(body, (x, r, p, rz), None, length=40)
        return x

    t, x = timeit(cg_solve, Mj, bj)
    report("jacobi-CG 40 iters", t, x)

    # 5. triangular-solve cost alone (is the bottleneck chol or the solves?)
    L = jnp.linalg.cholesky(Mj)

    @jax.jit
    def chol_only(M):
        return jnp.linalg.cholesky(M)

    t, _ = timeit(lambda M: chol_only(M), Mj)
    print(f"{'cholesky only':28s} {t * 1e3:8.2f} ms")

    @jax.jit
    def tri_solve(L, b):
        y = jax.vmap(lambda L, b: jax.scipy.linalg.solve_triangular(L, b, lower=True))(L, b)
        return jax.vmap(lambda L, y: jax.scipy.linalg.solve_triangular(L.T, y, lower=False))(L, y)

    t, _ = timeit(tri_solve, L, bj)
    print(f"{'triangular solves only':28s} {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
