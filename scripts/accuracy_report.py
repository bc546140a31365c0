#!/usr/bin/env python
"""Quantify the BASELINE control-accuracy metric: per-solve u0 error of the
production configuration (f32, qp_iters=8, one RTI iteration) against a
high-accuracy f64 solve of the SAME QP subproblem (qp_iters=40).

This isolates what the fixed iteration budget + f32 arithmetic cost on a
single tick — the deployment-relevant error (the SQP fixed point itself
matches a direct NLP to 8e-14, tests/test_sqp.py)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.nn import init_neural_df, make_sdf_fn
    from sdf_nmpc_tpu.ocp import build_ocp
    from sdf_nmpc_tpu.params import ParamLayout
    from sdf_nmpc_tpu.ref_gen import Ref
    from sdf_nmpc_tpu.solver import SolveInputs, init_state, make_rti_step

    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--qp-iters", type=int, default=None,
                    help="override solver.qp_iters (e.g. the low-latency profile)")
    ap.add_argument("--stiff-iters", type=int, default=None)
    ap.add_argument("--warm-ticks", type=int, default=8,
                    help="closed-loop warm ticks to measure after the cold start")
    args = ap.parse_args()

    L = 16
    module, params = init_neural_df(size_latent=L, layer_sizes=(64, 64, 64, 64), seed=0)
    sdf_fn = make_sdf_fn(module, params)

    solver_over = {}
    if args.qp_iters is not None:
        solver_over["qp_iters"] = args.qp_iters
    if args.stiff_iters is not None:
        solver_over["qp_stiff_iters"] = args.stiff_iters
    cfg_prod = default_config().replace(nn=dict(size_latent=L))  # production defaults
    if solver_over:
        cfg_prod = cfg_prod.replace(solver=solver_over)
    cfg_ref = cfg_prod.replace(solver=dict(dtype="float64", qp_iters=40))

    ocp_p = build_ocp(cfg_prod, sdf_fn=sdf_fn, sdf_max_df=1.0)
    ocp_r = build_ocp(cfg_ref, sdf_fn=sdf_fn, sdf_max_df=1.0)
    step_p = jax.jit(make_rti_step(ocp_p, cfg_prod))
    step_r = jax.jit(make_rti_step(ocp_r, cfg_ref))

    layout = ParamLayout.from_cfg(cfg_prod)
    N = ocp_p.N
    rng = np.random.default_rng(0)
    errs, u_mags, warm_errs = [], [], []
    for i in range(32):
        x0 = np.zeros(10)
        x0[3] = 1.0
        x0[:3] = rng.normal(size=3) * 0.5
        x0[7:] = rng.normal(size=3) * 0.5
        p = np.zeros((N + 1, layout.np_total))
        layout.set_flag(p, 1.0)
        layout.set_camera(p, np.zeros(3), np.eye(3))
        layout.set_q_d(p, [1, 0, 0, 0])
        layout.set_latent(p, rng.normal(size=L) * 0.2)
        ref = Ref(cfg_prod).use_constrained_weights(False)
        ref.p = rng.normal(size=3) * 1.5
        yr, W = ocp_p.pack_ref(ref)
        inputs = SolveInputs(
            x0=jnp.asarray(x0), yref=jnp.tile(jnp.asarray(yr)[None], (N, 1)),
            W=jnp.tile(jnp.asarray(W)[None], (N, 1)),
            yrefN=jnp.asarray(yr[: ocp_p.nyN]), WN=jnp.asarray(W[: ocp_p.nyN]),
            p=jnp.asarray(p),
        )
        st_p = init_state(ocp_p, x0, jnp.float32)
        rp = step_p(st_p, inputs)
        rr = step_r(init_state(ocp_r, x0, jnp.float64), inputs)
        errs.append(np.abs(np.asarray(rp.u0, np.float64) - np.asarray(rr.u0)).max())
        u_mags.append(np.abs(np.asarray(rr.u0)).max())

        # warm phase: propagate the production solver's own closed loop; each
        # tick the f64/40-iter solver re-solves the SAME subproblem (same x0,
        # same warm-start trajectory) to isolate the per-tick solve error
        st = rp.state
        x = x0.copy()
        for t in range(args.warm_ticks):
            x = x + 0.01 * np.asarray(
                ocp_p.model.f(jnp.asarray(x), rp.state.U[0])
            )
            x[3:7] /= np.linalg.norm(x[3:7])
            inputs_t = inputs._replace(x0=jnp.asarray(x))
            rp = step_p(st, inputs_t)
            st64 = type(st)(
                X=jnp.asarray(st.X, jnp.float64),
                U=jnp.asarray(st.U, jnp.float64),
                qp_duals=None,
            )
            rw = step_r(st64, inputs_t)
            warm_errs.append(
                np.abs(np.asarray(rp.u0, np.float64) - np.asarray(rw.u0)).max()
            )
            st = rp.state

    errs = np.asarray(errs)
    warm = np.asarray(warm_errs)
    print(f"per-tick u0 error (f32/prod-iter vs f64/40-iter), {len(errs)} random COLD-START scenarios:")
    print(f"  max   {errs.max():.2e}")
    print(f"  mean  {errs.mean():.2e}")
    if warm.size:
        print(f"warm RTI ticks ({args.warm_ticks} per scenario, same warm start + x0):")
        print(f"  max   {warm.max():.2e}")
        print(f"  p99   {np.percentile(warm, 99):.2e}")
        print(f"  mean  {warm.mean():.2e}")
        # NOTE: the warm loop follows the production solver's OWN closed-loop
        # states, so tiny arithmetic changes reshuffle WHICH states are
        # visited — max jitters across equivalent solver variants (measured
        # 6e-3..1.4e-2); the p99/mean and the fixed cold-start set are the
        # comparable numbers.
    print("  contract: <= 1e-3 typical (BASELINE); cold starts are the hardest")
    if not solver_over:
        assert errs.mean() <= 3e-4 and errs.max() <= 2e-3, "accuracy regression"
    print("OK")


if __name__ == "__main__":
    main()
