#!/usr/bin/env python
"""Where does QP time go at production batch?  Times the full batched step at
different qp_iters (slope = per-iteration cost) and with the factorization
replaced by a diagonal solve (isolates Cholesky+trisolve share)."""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = int(os.environ.get("BQ_BATCH", 4096))


def run(tag, overrides, patch_diag=False):
    import jax

    import sdf_nmpc_tpu.solver.qp as qpmod

    if patch_diag:
        import jax.numpy as jnp

        # monkeypatch BOTH solve paths: diagonal "solve" (wrong answer, right
        # cost structure minus factorization/back-substitution)
        qpmod.jnp.linalg.cholesky = lambda M: 1.0 / jnp.sqrt(
            jnp.einsum("...ii->...i", M)
        )
        qpmod.jax.scipy.linalg.cho_solve = lambda Lp, rhs: (Lp[0] ** 2) * rhs
        qpmod.spd_factor_batched = lambda M, nb=16: (
            (1.0 / jnp.einsum("...ii->...i", M), None), M.shape[-1]
        )
        qpmod.spd_factor_solve = lambda factor, n, rhs, nb=16: factor[0] * rhs

    from __graft_entry__ import _build

    cfg, ocp, step, states, inputs = _build(cfg_overrides=overrides, batch=B)
    vstep = jax.jit(jax.vmap(step))
    out = vstep(states, inputs)
    out.u0.block_until_ready()
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        out = vstep(states, inputs)
        out.u0.block_until_ready()
        ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    n_ok = int(np.asarray(out.status == 0).sum())
    print(f"{tag:24s} {t * 1e3:8.1f} ms  ({B / t:8.0f} solves/s, ok {n_ok}/{B})")
    return t


def main():
    t8 = run("qp_iters=8", dict(solver=dict(qp_iters=8)))
    t4 = run("qp_iters=4", dict(solver=dict(qp_iters=4)))
    per_iter = (t8 - t4) / 4
    print(f"per-IP-iteration cost: {per_iter * 1e3:.1f} ms")
    td = run("qp8 diag-solve (no chol)", dict(solver=dict(qp_iters=8)), patch_diag=True)
    print(f"cholesky+trisolve share @8 iters: {(t8 - td) * 1e3:.1f} ms of {t8 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
