#!/usr/bin/env python
"""Decompose the batched RTI step cost on the current device: full step vs
QP-only vs linearize-only, across batch sizes and QP iteration budgets."""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax_block(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_block(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def jax_block(out):
    import jax

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
            break


def main():
    import jax
    import jax.numpy as jnp

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1024,4096")
    ap.add_argument("--qp-iters", default="18")
    args = ap.parse_args()

    from __graft_entry__ import _build
    from sdf_nmpc_tpu.solver.qp import QpData, solve_qp

    for B in [int(b) for b in args.batches.split(",")]:
        for qpi in [int(q) for q in args.qp_iters.split(",")]:
            cfg, ocp, step, states, inputs = _build(
                cfg_overrides=dict(solver=dict(qp_iters=qpi)), batch=B
            )
            vstep = jax.jit(jax.vmap(step))
            t_full = timeit(vstep, states, inputs)

            # QP-only with representative random data
            nz = ocp.N * ocp.nu
            nc = ocp.N * ocp.nh + ocp.nhN
            rng = np.random.default_rng(0)
            A = rng.normal(size=(B, nz, nz)).astype(np.float32)
            H = np.einsum("bij,bkj->bik", A, A) / nz + 10 * np.eye(nz, dtype=np.float32)
            qp = QpData(
                H=jnp.asarray(H),
                g=jnp.asarray(rng.normal(size=(B, nz)).astype(np.float32)),
                C=jnp.asarray(rng.normal(size=(B, nc, nz)).astype(np.float32)),
                c0=jnp.asarray(rng.normal(size=(B, nc)).astype(np.float32)),
                lh=jnp.full((B, nc), -0.5, jnp.float32),
                uh=jnp.full((B, nc), 0.5, jnp.float32),
                z1=jnp.full((B, nc), 20.0, jnp.float32),
                z2=jnp.full((B, nc), 50.0, jnp.float32),
                lb=jnp.full((B, nz), -1.0, jnp.float32),
                ub=jnp.full((B, nz), 1.0, jnp.float32),
            )
            qp_fn = jax.jit(jax.vmap(lambda q: solve_qp(q, iters=qpi)))
            t_qp = timeit(qp_fn, qp)

            print(
                f"B={B} qp_iters={qpi}: full {t_full * 1e3:8.2f} ms "
                f"({B / t_full:8.0f} solves/s) | qp-only {t_qp * 1e3:8.2f} ms "
                f"| lin+condense ~{(t_full - t_qp) * 1e3:8.2f} ms"
            )


if __name__ == "__main__":
    main()
