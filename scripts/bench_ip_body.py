#!/usr/bin/env python
"""Per-piece timing of the IP warm-iteration body at production shapes
(B=8192, nz=80, nc=63), using fetch-synchronized chained timing
(scripts/_tpu_timer.py — block_until_ready is unreliable via the tunnel)."""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from _tpu_timer import bench_chained, measure_rtt

B = int(os.environ.get("BI_BATCH", 8192))
NZ, NC = 80, 63


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

    rtt = measure_rtt()
    print(f"# rtt {rtt * 1e3:.1f} ms")

    with jax.default_matmul_precision("highest"):
        va = jax.vmap(lambda H, C, eta, rb: H + (C.T * eta) @ C + jnp.diag(rb))
        bench_chained(
            "A = H + (C'*eta)@C + diag(rb)",
            lambda H, C, eta, rb: va(H, C, eta, rb),
            lambda A, H, C, eta, rb: (A * 1e-6 + H, C, eta, rb),
            (H, C, eta, rb), rtt=rtt,
        )
        # broadcast-sum form of the same build
        vab = jax.vmap(
            lambda H, C, eta, rb: H
            + (C[:, :, None] * (eta[:, None] * C)[:, None, :]).sum(0)
            + jnp.diag(rb)
        )
        bench_chained(
            "A-build, broadcast-sum form",
            lambda H, C, eta, rb: vab(H, C, eta, rb),
            lambda A, H, C, eta, rb: (A * 1e-6 + H, C, eta, rb),
            (H, C, eta, rb), rtt=rtt,
        )
        vm = jax.vmap(lambda C, v: C @ v)
        bench_chained(
            "C @ dz (batched matvec)",
            lambda C, v: vm(C, v),
            lambda w, C, v: (C, v + 1e-6 * jnp.pad(w, ((0, 0), (0, NZ - NC)))),
            (C, dz), rtt=rtt,
        )
        vt = jax.vmap(lambda C, v: C.T @ v)
        bench_chained(
            "C.T @ v (batched matvec)",
            lambda C, v: vt(C, v),
            lambda z, C, v: (C, v + 1e-6 * z[:, :NC]),
            (C, vec_c), rtt=rtt,
        )
        vh = jax.vmap(lambda H, v: H @ v)
        bench_chained(
            "H @ dz (batched matvec)",
            lambda H, v: vh(H, v),
            lambda z, H, v: (H, v + 1e-6 * z),
            (H, dz), rtt=rtt,
        )
        velt = jax.vmap(
            lambda v: sum(jnp.maximum(v * (i + 1), 1.0 / (i + 1)) for i in range(30))
        )
        bench_chained(
            "30x elementwise on (B,nc)",
            lambda v: velt(v),
            lambda o, v: (v + 1e-9 * o,),
            (vec_c,), rtt=rtt,
        )

        from sdf_nmpc_tpu.ops.qp_kernels import newton_factor_solve

        Hs = jax.vmap(lambda A: A @ A.T + NZ * jnp.eye(NZ, dtype=jnp.float32))(H)
        RHS1 = mk(B, 1, NZ)
        RHS9 = mk(B, 9, NZ)
        vfs = jax.vmap(newton_factor_solve)
        for tag, R in (("pallas factor+solve (1 rhs)", RHS1),
                       ("pallas factor+solve (9 rhs)", RHS9)):
            bench_chained(
                tag,
                lambda Hs, R: vfs(Hs, R),
                lambda out, Hs, R: (Hs + 1e-9 * out[0][:, 0, :, None] * out[0][:, 0, None, :],
                                    R + 1e-9 * out[0]),
                (Hs, R), rtt=rtt,
            )
        vtk = jax.vmap(lambda e: jax.lax.top_k(e, 8))
        bench_chained(
            "top_k(eta, 8)",
            lambda e: vtk(e)[0],
            lambda o, e: (e + 1e-9 * o.sum(-1, keepdims=True),),
            (eta,), rtt=rtt,
        )


if __name__ == "__main__":
    main()
