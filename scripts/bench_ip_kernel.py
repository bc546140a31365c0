#!/usr/bin/env python
"""Piece-ablation of the fused IP iteration kernel at production shapes.

Times a 20-iteration fused phase (ip_phase_lanes) on synthetic (but
production-shaped and SPD) data, with kernel sections disabled via the
`ablate` debug flag — the per-piece difference attributes the in-kernel
VPU time (the kernel is compute-bound, docs/performance.md).
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = int(os.environ.get("IP_BATCH", 8192))
NZ, NC = 80, 66
ITERS = 20


def main():
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.ops.ip_kernel import ip_phase_lanes

    rng = np.random.default_rng(0)
    M = rng.normal(size=(NZ, NZ)).astype(np.float32)
    H1 = M @ M.T + 10 * np.eye(NZ, dtype=np.float32)
    H = jnp.asarray(np.broadcast_to(H1[:, :, None], (NZ, NZ, B)))
    C = jnp.asarray(rng.normal(size=(NC, NZ, B)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(NZ, B)).astype(np.float32))
    c0 = jnp.asarray(rng.normal(size=(NC, B)).astype(np.float32) * 0.1)
    lh = jnp.full((NC, B), -0.2, jnp.float32)
    uh = jnp.full((NC, B), 0.2, jnp.float32)
    z1 = jnp.full((NC, B), 1e3, jnp.float32)
    z2 = jnp.full((NC, B), 1e4, jnp.float32)
    lb = jnp.full((NZ, B), -0.7, jnp.float32)
    ub = jnp.full((NZ, B), 0.7, jnp.float32)
    data = (H, C, g, c0, lh, uh, z1, z2, lb, ub)

    dz0 = jnp.zeros((NZ, B), jnp.float32)
    c1 = jnp.full((NC, B), 0.1, jnp.float32)
    d1 = jnp.ones((NC, B), jnp.float32)
    zn = jnp.ones((NZ, B), jnp.float32)
    state0 = (dz0, c1, c1, d1, d1, d1, d1, zn, zn,
              jnp.full((1, B), 0.1, jnp.float32), dz0,
              jnp.full((1, B), np.inf, jnp.float32), dz0)
    consts = dict(ratio_cap=8.4e5, mu_min=3.8e-6, p_floor=3.8e-8,
                  d_floor=1e-14, tau=0.995)

    def run(tag, k_s, ablate):
        def loop(data_, state):
            return ip_phase_lanes(data_, state, k_s, ITERS, 0, consts,
                                  ablate=ablate)

        fn = jax.jit(loop)
        out = fn(data, state0)
        float(np.asarray(out[0][0, 0]))  # sync
        t0 = time.perf_counter()
        out = fn(data, state0)
        float(np.asarray(out[0][0, 0]))
        dt = time.perf_counter() - t0
        print(f"{tag:32s} {dt * 1e3 / ITERS:7.2f} ms/iter  ({dt * 1e3:7.1f} ms /{ITERS})")
        return dt

    run("warm (k_s=0) full", 0, "")
    run("warm no A-build", 0, "noA")
    run("warm no factor", 0, "nochol")
    run("warm no solves", 0, "nosolve")
    run("stiff (k_s=8) full", 8, "")
    run("stiff no A-build", 8, "noA")
    run("stiff no factor", 8, "nochol")
    run("stiff no solves", 8, "nosolve")


if __name__ == "__main__":
    main()
