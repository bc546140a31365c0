#!/usr/bin/env python
"""Micro-benchmark: batched SPD factor+solve implementations at QP shapes.

Times a DEPENDENT chain of k solves inside one jitted program (the result of
one solve perturbs the next system), so nothing can be cached or elided, and
dispatch cost amortizes.  Also checks each implementation against numpy.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = int(os.environ.get("BL_BATCH", 8192))
N = int(os.environ.get("BL_N", 80))
R = int(os.environ.get("BL_RHS", 9))
K = int(os.environ.get("BL_CHAIN", 20))


def main():
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.ops.qp_kernels import factor_solve_lanes
    from sdf_nmpc_tpu.solver.linalg import spd_factor_batched, spd_factor_solve_mrhs

    rng = np.random.default_rng(0)
    A = rng.normal(size=(B, N, N)).astype(np.float32)
    M = np.einsum("bij,bkj->bik", A, A) + 10 * np.eye(N, dtype=np.float32)
    RHS = rng.normal(size=(B, R, N)).astype(np.float32)
    M_j = jnp.asarray(M)
    R_j = jnp.asarray(RHS)

    def solve_custom(Mb, Rb):  # (B,n,n), (B,r,n) -> (B,r,n)
        fac, n_orig = spd_factor_batched(Mb)
        return jnp.swapaxes(
            spd_factor_solve_mrhs(fac, n_orig, jnp.swapaxes(Rb, -1, -2)), -1, -2
        )

    def solve_xla(Mb, Rb):
        L = jnp.linalg.cholesky(Mb)
        return jnp.swapaxes(
            jax.scipy.linalg.cho_solve((L, True), jnp.swapaxes(Rb, -1, -2)), -1, -2
        )

    def solve_pallas(Mb, Rb):
        X = factor_solve_lanes(jnp.moveaxis(Mb, 0, -1), jnp.transpose(Rb, (1, 2, 0)))
        return jnp.moveaxis(X, -1, 0)

    impls = {"custom": solve_custom, "xla": solve_xla, "pallas": solve_pallas}

    # numeric ground truth on a small slice
    Bs = 64
    X_np = np.linalg.solve(M[:Bs], np.swapaxes(RHS[:Bs], -1, -2))  # (Bs,n,r)
    for name, fn in impls.items():
        Xi = np.asarray(fn(M_j[:Bs * 2], R_j[:Bs * 2]))[:Bs]
        rel = np.abs(np.swapaxes(Xi, -1, -2) - X_np).max() / np.abs(X_np).max()
        print(f"{name:8s} rel err vs numpy: {rel:.2e}")

    def chain(fn):
        @jax.jit
        def go(Mb, Rb):
            def body(carry, _):
                X = fn(Mb + 1e-6 * jnp.einsum("bri,brj->bij", carry, carry), Rb)
                return X, ()

            X, _ = jax.lax.scan(body, Rb, None, length=K)
            return X

        return go

    for name, fn in impls.items():
        go = chain(fn)
        out = go(M_j, R_j)
        out.block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = go(M_j, R_j)
            out.block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(f"{name:8s} {np.median(ts) / K * 1e3:8.2f} ms per factor+{R}-solve "
              f"(chain of {K})")


if __name__ == "__main__":
    main()
