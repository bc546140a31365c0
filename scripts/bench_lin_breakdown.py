#!/usr/bin/env python
"""Where does the NON-QP (linearization/condensing/update) time go?

Times the full batched step at qp_iters=1 with pieces stubbed out:
  - sdf_row_batch -> zeros     (isolates the batched NeuralDF value+grad)
  - erk4 sensitivities -> const (isolates the ERK4+jacfwd rollout)
and times the condensing scan + condensed assembly standalone on random
tensors of the production shapes (they have no data dependence on the rest).
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = int(os.environ.get("BL_BATCH", 8192))
OV = dict(solver=dict(qp_iters=1, qp_stiff_iters=0))


def _time(vstep, states, inputs, reps=8):
    out = vstep(states, inputs)
    out.u0.block_until_ready()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = vstep(states, inputs)
        out.u0.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def run(tag, patch=None):
    import jax

    from __graft_entry__ import _build
    from sdf_nmpc_tpu.solver import make_rti_step

    cfg, ocp, step, states, inputs = _build(cfg_overrides=OV, batch=B)
    if patch == "nosdf":
        import jax.numpy as jnp

        def stub(X, P):
            K = X.shape[0]
            return jnp.full((K,), 2.0, X.dtype), jnp.zeros((K, 3), X.dtype)

        import dataclasses

        ocp = dataclasses.replace(ocp, sdf_row_batch=stub)
        step = make_rti_step(ocp, cfg, with_evals=False)
    elif patch == "noerk":
        import jax.numpy as jnp

        import sdf_nmpc_tpu.solver.sqp as sqpmod

        def stub_erk(f, x, u, dtk):
            nx, nu = x.shape[0], u.shape[0]
            return x, jnp.eye(nx, dtype=x.dtype), jnp.zeros((nx, nu), x.dtype)

        orig = sqpmod.erk4_with_sensitivities
        sqpmod.erk4_with_sensitivities = stub_erk
        try:
            step = make_rti_step(ocp, cfg, with_evals=False)
            vstep = jax.jit(jax.vmap(step))
            t = _time(vstep, states, inputs)
        finally:
            sqpmod.erk4_with_sensitivities = orig
        print(f"{tag:28s} {t * 1e3:8.1f} ms")
        return t
    vstep = jax.jit(jax.vmap(step))
    t = _time(vstep, states, inputs)
    print(f"{tag:28s} {t * 1e3:8.1f} ms")
    return t


def run_condense_standalone():
    """Condensing scan + condensed H/g/C assembly on random production-shape
    tensors (mirrors solver/sqp.py steps 2-3; shapes from the att model)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build

    cfg, ocp, step, states, inputs = _build(cfg_overrides=OV, batch=2)
    N, nx, nu = ocp.N, ocp.nx, ocp.nu
    nz, ny, nh = N * nu, ocp.ny, ocp.nh
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.normal(size=s) * 0.1, jnp.float32)
    A = mk(B, N, nx, nx)
    Bm = mk(B, N, nx, nu)
    defect = mk(B, N, nx)
    Jyx, Jyu = mk(B, N, ny, nx), mk(B, N, ny, nu)
    Jhx, Jhu = mk(B, N, nh, nx), mk(B, N, nh, nu)
    res, W = mk(B, N, ny), jnp.abs(mk(B, N, ny)) + 1.0
    e0 = mk(B, nx)
    import sdf_nmpc_tpu.solver.sqp as sqpmod

    S = jnp.asarray(sqpmod._scatter_blocks(N, nu, np.float32))

    def condense(A, Bm, defect, e0, Jyx, Jyu, Jhx, Jhu, res, W):
        E0 = jnp.zeros((nx, nz), jnp.float32)

        def scan_body(carry, xs):
            e_k, E_k = carry
            A_k, B_k, r_k, S_k = xs
            return (A_k @ e_k + r_k, A_k @ E_k + B_k @ S_k), (e_k, E_k)

        (eN, EN), (e_st, E_st) = jax.lax.scan(scan_body, (e0, E0), (A, Bm, defect, S))
        G = jnp.einsum("kni,kiz->knz", Jyx, E_st) + jnp.einsum("knu,kuz->knz", Jyu, S)
        res_c = res + jnp.einsum("kni,ki->kn", Jyx, e_st)
        H = jnp.einsum("kna,kn,knb->ab", G, W, G)
        g = jnp.einsum("kna,kn->a", G, W * res_c)
        E_all = jnp.concatenate([E_st, EN[None]], axis=0)
        H = H + 0.01 * (jnp.einsum("kia,kib->ab", E_all, E_all) + jnp.eye(nz))
        C = jnp.einsum("kni,kiz->knz", Jhx, E_st) + jnp.einsum("knu,kuz->knz", Jhu, S)
        c0 = jnp.einsum("kni,ki->kn", Jhx, e_st)
        return H, g, C.reshape(N * nh, nz), c0.reshape(N * nh), eN

    with jax.default_matmul_precision(cfg.solver.matmul_precision):
        fn = jax.jit(jax.vmap(condense))
        args = (A, Bm, defect, e0, Jyx, Jyu, Jhx, Jhu, res, W)
        out = fn(*args)
        out[0].block_until_ready()
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = fn(*args)
            out[0].block_until_ready()
            ts.append(time.perf_counter() - t0)
    t = float(np.median(ts))
    print(f"{'condense+assembly (rand)':28s} {t * 1e3:8.1f} ms")

    # scan alone
    def scan_only(A, Bm, defect, e0):
        E0 = jnp.zeros((nx, nz), jnp.float32)

        def scan_body(carry, xs):
            e_k, E_k = carry
            A_k, B_k, r_k, S_k = xs
            return (A_k @ e_k + r_k, A_k @ E_k + B_k @ S_k), (e_k, E_k)

        (eN, EN), (e_st, E_st) = jax.lax.scan(scan_body, (e0, E0), (A, Bm, defect, S))
        return eN, EN, e_st, E_st

    with jax.default_matmul_precision(cfg.solver.matmul_precision):
        fn2 = jax.jit(jax.vmap(scan_only))
        out = fn2(A, Bm, defect, e0)
        out[1].block_until_ready()
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            out = fn2(A, Bm, defect, e0)
            out[1].block_until_ready()
            ts.append(time.perf_counter() - t0)
    print(f"{'condensing scan only (rand)':28s} {float(np.median(ts)) * 1e3:8.1f} ms")


def main():
    t_full = run("qp_iters=1 full")
    t_nosdf = run("qp_iters=1, sdf stubbed", "nosdf")
    print(f"NeuralDF value+grad share: {(t_full - t_nosdf) * 1e3:.1f} ms")
    t_noerk = run("qp_iters=1, erk4 stubbed", "noerk")
    print(f"ERK4+sensitivities share: {(t_full - t_noerk) * 1e3:.1f} ms")
    run_condense_standalone()


if __name__ == "__main__":
    main()
