#!/usr/bin/env python
"""QP backend comparison across horizons: condensed vs Riccati.

Full condensing factors one (N*nu, N*nu) matrix per IP iteration (O(N^3)
flops, O(N^2) condensing); the Riccati backend runs an O(N) stage sweep.
This script measures the crossover on the batched neural-SDF workload.

    BB_BATCH=1024 python scripts/bench_backends.py [N ...]
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = int(os.environ.get("BB_BATCH", 1024))
HORIZONS = [int(a) for a in sys.argv[1:]] or [20, 40, 80]
DT = 0.075  # the reference's T/N (1.5 s / 20 nodes)


def run(backend: str, N: int) -> float:
    import jax

    from __graft_entry__ import _build

    solver = dict(qp_backend=backend)
    if backend == "condensed" and N > 20:
        # the lanes condensing kernel's accumulator windows are O(N^2) VMEM
        # ((N, nx+1, N*nu, lanes) blocks): at N=40 the compiler reports
        # 175 MB vs the 128 MB v5e VMEM.  Long horizons run the composed XLA
        # path (same algorithm, HBM-resident intermediates) — lin_impl gates
        # the condensing recursion, chol_impl the IP kernel.
        solver["chol_impl"] = "xla"
        solver["lin_impl"] = "xla"
    overrides = dict(
        mpc=dict(N=N, T=N * DT),
        solver=solver,
    )
    cfg, ocp, step, states, inputs = _build(cfg_overrides=overrides, batch=B)
    vstep = jax.jit(jax.vmap(step))
    out = vstep(states, inputs)
    n_ok = int(np.asarray(out.status == 0).sum())
    # span timing (scripts/_tpu_timer.py): block_until_ready does not await
    # execution through the tunnel — chain data-dependent steps instead
    from _tpu_timer import time_steps

    t = time_steps(vstep, states, inputs, iters=6)
    print(
        f"N={N:4d} {backend:10s} {t * 1e3:9.1f} ms ({B / t:9.0f} solves/s, "
        f"ok {n_ok}/{B})",
        flush=True,
    )
    return t


def main():
    for N in HORIZONS:
        tc = run("condensed", N)
        tr = run("riccati", N)
        print(f"N={N:4d} riccati/condensed = {tr / tc:.2f}x", flush=True)


if __name__ == "__main__":
    main()
