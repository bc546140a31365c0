#!/usr/bin/env python
"""Layout experiment: does putting the batch axis MINOR (lanes=B) fix the
lane-utilization pathology of the linearization/condensing stages?

Benches erk4_with_sensitivities and the condensing scan in batch-leading
(current) vs batch-minor (vmap in_axes/out_axes=-1) form at B*N=163840.
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = int(os.environ.get("BL_BATCH", 8192)) * 20  # scenarios x nodes
NX, NU, NZ = 10, 4, 80
N = 20
BS = B // N  # scenarios


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

    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.models import make_model
    from sdf_nmpc_tpu.solver.integrator import erk4_with_sensitivities

    cfg = default_config()
    model = make_model(cfg)
    f = model.f
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, NX)) * 0.1, jnp.float32)
    x = x.at[:, 3].add(1.0)
    u = jnp.asarray(rng.uniform(0.2, 0.8, size=(B, NU)), jnp.float32)
    dt = jnp.float32(0.1)

    step = lambda xv, uv: erk4_with_sensitivities(f, xv, uv, dt)

    with jax.default_matmul_precision("high"):
        bench("erk4+sens batch-LEADING", jax.vmap(step), (x, u))
        bench(
            "erk4+sens batch-MINOR",
            jax.vmap(step, in_axes=(-1, -1), out_axes=-1),
            (x.T, u.T),
        )

        # condensing scan, batch-leading vs batch-minor
        A = jnp.asarray(rng.normal(size=(BS, N, NX, NX)) * 0.1, jnp.float32)
        Bm = jnp.asarray(rng.normal(size=(BS, N, NX, NU)) * 0.1, jnp.float32)
        d = jnp.asarray(rng.normal(size=(BS, N, NX)) * 0.1, jnp.float32)
        e0 = jnp.asarray(rng.normal(size=(BS, NX)) * 0.1, jnp.float32)
        from sdf_nmpc_tpu.solver.sqp import _scatter_blocks

        S = jnp.asarray(_scatter_blocks(N, NU, np.float32))

        def scan_one(A, Bm, d, e0):
            E0 = jnp.zeros((NX, NZ), jnp.float32)

            def body(carry, xs):
                e_k, E_k = carry
                A_k, B_k, r_k, S_k = xs
                return (A_k @ e_k + r_k, A_k @ E_k + B_k @ S_k), (e_k, E_k)

            (eN, EN), (e_st, E_st) = jax.lax.scan(body, (e0, E0), (A, Bm, d, S))
            return eN, EN, e_st, E_st

        bench("condense scan batch-LEADING", jax.vmap(scan_one), (A, Bm, d, e0))

        At = jnp.moveaxis(A, 0, -1)  # (N, NX, NX, BS)
        Bt = jnp.moveaxis(Bm, 0, -1)
        dt_ = jnp.moveaxis(d, 0, -1)
        e0t = jnp.moveaxis(e0, 0, -1)

        def scan_minor(At, Bt, dt_, e0t):
            E0 = jnp.zeros((NX, NZ, BS), jnp.float32)

            def body(carry, xs):
                e_k, E_k = carry  # (NX,BS), (NX,NZ,BS)
                A_k, B_k, r_k, S_k = xs  # (NX,NX,BS), (NX,NU,BS), (NX,BS), (NU,NZ)
                e_n = jnp.einsum("ijB,jB->iB", A_k, e_k) + r_k
                E_n = jnp.einsum("ijB,jzB->izB", A_k, E_k) + jnp.einsum(
                    "iuB,uz->izB", B_k, S_k
                )
                return (e_n, E_n), (e_k, E_k)

            (eN, EN), (e_st, E_st) = jax.lax.scan(body, (e0t, E0), (At, Bt, dt_, S))
            return eN, EN, e_st, E_st

        bench("condense scan batch-MINOR", scan_minor, (At, Bt, dt_, e0t))

        # unrolled python-loop variant (no lax.scan dispatch overhead, N=20)
        def unroll_minor(At, Bt, dt_, e0t):
            e_k = e0t
            E_k = jnp.zeros((NX, NZ, BS), jnp.float32)
            es, Es = [], []
            for k in range(N):
                es.append(e_k)
                Es.append(E_k)
                A_k, B_k, r_k, S_k = At[k], Bt[k], dt_[k], S[k]
                e_k = jnp.einsum("ijB,jB->iB", A_k, e_k) + r_k
                E_k = jnp.einsum("ijB,jzB->izB", A_k, E_k) + jnp.einsum(
                    "iuB,uz->izB", B_k, S_k
                )
            return e_k, E_k, jnp.stack(es), jnp.stack(Es)

        bench("condense unrolled batch-MINOR", unroll_minor, (At, Bt, dt_, e0t))


if __name__ == "__main__":
    main()
