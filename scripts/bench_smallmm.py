#!/usr/bin/env python
"""Hypothesis test: batched TINY matmuls (dims 10/14/80) on TPU pay full
128x128 MXU tile padding in HBM traffic; hand-written broadcast-multiply-
reduce (VPU) should be ~10-20x faster at these shapes.

Benches the condensing-scan step and a jacfwd-free ERK4 sensitivity chain in
dot_general vs broadcast-sum form.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

BS = int(os.environ.get("BS", 8192))
N, NX, NU, NZ = 20, 10, 4, 80


def bench(tag, fn, args, reps=10):
    import jax

    f = jax.jit(fn)
    out = jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{tag:44s} {float(np.median(ts)) * 1e3:7.2f} ms")


def main():
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.solver.sqp import _scatter_blocks

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.normal(size=(BS, N, NX, NX)) * 0.1, jnp.float32)
    Bm = jnp.asarray(rng.normal(size=(BS, N, NX, NU)) * 0.1, jnp.float32)
    d = jnp.asarray(rng.normal(size=(BS, N, NX)) * 0.1, jnp.float32)
    e0 = jnp.asarray(rng.normal(size=(BS, NX)) * 0.1, jnp.float32)
    S = jnp.asarray(_scatter_blocks(N, NU, np.float32))

    def scan_dot(A, Bm, d, e0):
        E0 = jnp.zeros((NX, NZ), jnp.float32)

        def body(carry, xs):
            e_k, E_k = carry
            A_k, B_k, r_k, S_k = xs
            return (A_k @ e_k + r_k, A_k @ E_k + B_k @ S_k), (e_k, E_k)

        return jax.lax.scan(body, (e0, E0), (A, Bm, d, S))

    def scan_bsum(A, Bm, d, e0):
        E0 = jnp.zeros((NX, NZ), jnp.float32)

        def body(carry, xs):
            e_k, E_k = carry
            A_k, B_k, r_k, S_k = xs
            e_n = (A_k * e_k[None, :]).sum(-1) + r_k
            E_n = (A_k[:, :, None] * E_k[None, :, :]).sum(1) + (
                B_k[:, :, None] * S_k[None, :, :]
            ).sum(1)
            return (e_n, E_n), (e_k, E_k)

        return jax.lax.scan(body, (e0, E0), (A, Bm, d, S))

    with jax.default_matmul_precision("high"):
        bench("scan step: dot_general", jax.vmap(scan_dot), (A, Bm, d, e0))
        bench("scan step: broadcast-sum", jax.vmap(scan_bsum), (A, Bm, d, e0))

        # ERK4 sensitivities: jacfwd-through-rollout vs per-stage-J + chain
        from sdf_nmpc_tpu.config import default_config
        from sdf_nmpc_tpu.models import make_model
        from sdf_nmpc_tpu.solver.integrator import erk4_with_sensitivities

        cfg = default_config()
        f = make_model(cfg).f
        B2 = BS * N
        x = jnp.asarray(rng.normal(size=(B2, NX)) * 0.1, jnp.float32).at[:, 3].add(1.0)
        u = jnp.asarray(rng.uniform(0.2, 0.8, size=(B2, NU)), jnp.float32)
        dtv = jnp.float32(0.1)

        bench(
            "erk4+sens: jacfwd(rollout)",
            jax.vmap(lambda xv, uv: erk4_with_sensitivities(f, xv, uv, dtv)),
            (x, u),
        )

        def erk4_sens_chain(xv, uv):
            # per-stage J via jacfwd of f alone; chain rule with broadcast-sum
            nxu = NX + NU
            def stage(xs):
                Jx = jax.jacfwd(f, argnums=0)(xs, uv)  # (NX, NX)
                Ju = jax.jacfwd(f, argnums=1)(xs, uv)  # (NX, NU)
                return f(xs, uv), Jx, Ju

            Su = jnp.concatenate(
                [jnp.zeros((NU, NX)), jnp.eye(NU)], axis=1
            )  # du/d(x,u)
            S0 = jnp.concatenate([jnp.eye(NX), jnp.zeros((NX, NU))], axis=1)

            mm = lambda M, T: (M[:, :, None] * T[None, :, :]).sum(1)

            k1, J1x, J1u = stage(xv)
            K1 = mm(J1x, S0) + mm(J1u, Su)
            x2 = xv + 0.5 * dtv * k1
            k2, J2x, J2u = stage(x2)
            S2 = S0 + 0.5 * dtv * K1
            K2 = mm(J2x, S2) + mm(J2u, Su)
            x3 = xv + 0.5 * dtv * k2
            k3, J3x, J3u = stage(x3)
            S3 = S0 + 0.5 * dtv * K2
            K3 = mm(J3x, S3) + mm(J3u, Su)
            x4 = xv + dtv * k3
            k4, J4x, J4u = stage(x4)
            S4 = S0 + dtv * K3
            K4 = mm(J4x, S4) + mm(J4u, Su)
            x_next = xv + (dtv / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            Sn = S0 + (dtv / 6.0) * (K1 + 2 * K2 + 2 * K3 + K4)
            return x_next, Sn[:, :NX], Sn[:, NX:]

        bench("erk4+sens: stage-J + bsum chain", jax.vmap(erk4_sens_chain), (x, u))


if __name__ == "__main__":
    main()
