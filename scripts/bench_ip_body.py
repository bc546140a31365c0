#!/usr/bin/env python
"""Per-piece timing of the IP warm-iteration body at production shapes
(B=8192, nz=80, nc=63) on random data — which of the ~14 ms/iteration is
A-build GEMM vs matvecs vs elementwise vs the pallas factor+solve?"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = int(os.environ.get("BI_BATCH", 8192))
NZ, NC = 80, 63


def bench(tag, fn, args, reps=10):
    import jax

    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{tag:44s} {t * 1e3:7.2f} ms")
    return t


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s), jnp.float32)
    H = mk(B, NZ, NZ)
    C = mk(B, NC, NZ)
    dz = mk(B, NZ)
    eta = jnp.abs(mk(B, NC))
    rb = jnp.abs(mk(B, NZ))
    vec_c = mk(B, NC)

    with jax.default_matmul_precision("highest"):
        bench("A = H + (C'*eta)@C + diag(rb)",
              jax.vmap(lambda H, C, eta, rb: H + (C.T * eta) @ C + jnp.diag(rb)),
              (H, C, eta, rb))
        bench("C @ dz (batched matvec)",
              jax.vmap(lambda C, dz: C @ dz), (C, dz))
        bench("C.T @ v (batched matvec)",
              jax.vmap(lambda C, v: C.T @ v), (C, vec_c))
        bench("H @ dz (batched matvec)",
              jax.vmap(lambda H, dz: H @ dz), (H, dz))
        bench("30x fused elementwise on (B,nc)",
              jax.vmap(lambda v: sum(jnp.maximum(v * (i + 1), 1.0 / (i + 1))
                                     for i in range(30))),
              (vec_c,))
        # the five matvec-ish products of one warm body together (fusable?)
        def body_matvecs(H, C, dz, eta, rb, v):
            w = C @ dz
            r_z = H @ dz - C.T @ v
            A = H + (C.T * eta) @ C + jnp.diag(rb)
            rhs = -r_z + C.T @ (v - eta * w)
            return A, rhs, w
        bench("one warm body's matmul set", jax.vmap(body_matvecs),
              (H, C, dz, eta, rb, vec_c))

        from sdf_nmpc_tpu.ops.qp_kernels import newton_factor_solve, newton_resolve
        RHS = mk(B, 1, NZ)
        Hs = jax.vmap(lambda A: A @ A.T + NZ * jnp.eye(NZ, dtype=jnp.float32))(H)
        t_fs = bench("pallas factor+solve (1 rhs)",
                     jax.vmap(newton_factor_solve), (Hs, RHS))
        _, L = jax.vmap(newton_factor_solve)(Hs, RHS)
        bench("pallas resolve (1 rhs)", jax.vmap(newton_resolve), (L, RHS))
        RHS9 = mk(B, 9, NZ)
        bench("pallas factor+solve (9 rhs)",
              jax.vmap(newton_factor_solve), (Hs, RHS9))

        # top_k on (B, nc)
        bench("top_k(eta, 8)", jax.vmap(lambda e: jax.lax.top_k(e, 8)[1]), (eta,))


if __name__ == "__main__":
    main()
