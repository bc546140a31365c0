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
sys.path.insert(0, str(Path(__file__).resolve().parent))

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
    from _tpu_timer import time_steps

    cfg, ocp, step, states, inputs = _build(cfg_overrides=overrides, batch=B)
    vstep = jax.jit(jax.vmap(step))
    t = time_steps(vstep, states, inputs, iters=10)
    out = vstep(states, inputs)
    n_ok = int(np.asarray(out.status == 0).sum())
    print(f"{tag:24s} {t * 1e3:8.1f} ms  ({B / t:8.0f} solves/s, ok {n_ok}/{B})")
    return t


def main():
    # default two-phase schedule: isolate warm vs stiff iteration costs
    t_def = run("default (20it, 8 stiff)", None)
    t12w = run("12 warm only", dict(solver=dict(qp_iters=12, qp_stiff_iters=0)))
    t4w = run("4 warm only", dict(solver=dict(qp_iters=4, qp_stiff_iters=0)))
    warm_iter = (t12w - t4w) / 8
    print(f"per WARM iteration: {warm_iter * 1e3:.2f} ms")
    t12_8 = run("12w + 8 stiff", dict(solver=dict(qp_iters=20, qp_stiff_iters=8)))
    t12_4 = run("12w + 4 stiff", dict(solver=dict(qp_iters=16, qp_stiff_iters=4)))
    stiff_iter = (t12_8 - t12_4) / 4
    print(f"per STIFF iteration: {stiff_iter * 1e3:.2f} ms")
    td = run("12w diag-solve (no chol)", dict(solver=dict(qp_iters=12, qp_stiff_iters=0)),
             patch_diag=True)
    print(f"cholesky+trisolve share @12 warm: {(t12w - td) * 1e3:.1f} ms of {t12w * 1e3:.1f} ms")
    t0 = run("qp_iters=0 (lin+condense)", dict(solver=dict(qp_iters=1, qp_stiff_iters=0)))
    print(f"non-QP share (lin/condense/update, ~1 iter incl.): {t0 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
