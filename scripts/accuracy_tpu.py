#!/usr/bin/env python
"""On-HARDWARE accuracy check: the production f32 solve on the real TPU vs a
CPU f64/40-iter reference on identical scenarios.

CPU-only test suites cannot see TPU-specific numerics (the MXU lowers f32
matmuls to reduced-precision passes by default), so this script closes the
loop on the BASELINE accuracy contract on the actual chip:

    python scripts/accuracy_tpu.py ref      # CPU f64 reference -> npz
    python scripts/accuracy_tpu.py tpu      # TPU f32 run, compare

Scenario set matches scripts/accuracy_report.py (hard random cold starts).
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

NPZ = Path("/tmp/sdf_nmpc_tpu_accuracy_ref.npz")
N_SCEN = 32
L = 16


def _scenarios(cfg, ocp, layout):
    from sdf_nmpc_tpu.ref_gen import Ref

    rng = np.random.default_rng(0)
    N = ocp.N
    out = []
    for _ in range(N_SCEN):
        x0 = np.zeros(10)
        x0[3] = 1.0
        x0[:3] = rng.normal(size=3) * 0.5
        x0[7:] = rng.normal(size=3) * 0.5
        p = np.zeros((N + 1, layout.np_total))
        layout.set_flag(p, 1.0)
        layout.set_camera(p, np.zeros(3), np.eye(3))
        layout.set_q_d(p, [1, 0, 0, 0])
        layout.set_latent(p, rng.normal(size=L) * 0.2)
        ref = Ref(cfg).use_constrained_weights(False)
        ref.p = rng.normal(size=3) * 1.5
        yr, W = ocp.pack_ref(ref)
        out.append((x0, p, yr, W))
    return out


def _build(dtype_cfg):
    import json
    import os

    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.nn import init_neural_df, make_sdf_fn
    from sdf_nmpc_tpu.ocp import build_ocp
    from sdf_nmpc_tpu.params import ParamLayout

    cfg = default_config().replace(nn=dict(size_latent=L))
    env_over = json.loads(os.environ.get("BENCH_SOLVER_OVERRIDES", "null"))
    if env_over:
        cfg = cfg.replace(solver=env_over)
    if dtype_cfg:
        cfg = cfg.replace(solver=dtype_cfg)
    module, params = init_neural_df(size_latent=L, layer_sizes=(64, 64, 64, 64), seed=0)
    sdf_fn = make_sdf_fn(module, params)
    vg = None
    if bool(cfg.solver.get("fused_sdf", True)):
        from sdf_nmpc_tpu.ops import make_fused_sdf_vg

        vg = make_fused_sdf_vg(
            module, params, dtype=str(cfg.solver.get("sdf_fused_dtype", "f32"))
        )
    ocp = build_ocp(cfg, sdf_fn=sdf_fn, sdf_max_df=1.0, sdf_value_grad_batch=vg)
    return cfg, ocp, ParamLayout.from_cfg(cfg)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    import jax

    if mode == "ref":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from sdf_nmpc_tpu.solver import SolveInputs, init_state, make_rti_step

    over = dict(dtype="float64", qp_iters=40) if mode == "ref" else None
    cfg, ocp, layout = _build(over)
    step = make_rti_step(ocp, cfg, with_evals=False)
    N = ocp.N
    dt = jnp.float64 if mode == "ref" else jnp.float32

    scen = _scenarios(cfg, ocp, layout)
    x0s = np.stack([s[0] for s in scen])
    ps = np.stack([s[1] for s in scen])
    yrs = np.stack([s[2] for s in scen])
    Ws = np.stack([s[3] for s in scen])
    inputs = SolveInputs(
        x0=jnp.asarray(x0s, dt),
        yref=jnp.asarray(np.tile(yrs[:, None], (1, N, 1)), dt),
        W=jnp.asarray(np.tile(Ws[:, None], (1, N, 1)), dt),
        yrefN=jnp.asarray(yrs[:, : ocp.nyN], dt),
        WN=jnp.asarray(Ws[:, : ocp.nyN], dt),
        p=jnp.asarray(ps, dt),
    )
    states = jax.vmap(lambda x: init_state(ocp, x, dt))(jnp.asarray(x0s, dt))
    res = jax.jit(jax.vmap(step))(states, inputs)
    u0 = np.asarray(res.u0, np.float64)

    if mode == "ref":
        np.savez(NPZ, u0=u0)
        print(f"reference u0 saved -> {NPZ}")
    else:
        ref = np.load(NPZ)["u0"]
        err = np.abs(u0 - ref).max(axis=1)
        dev = jax.devices()[0]
        print(f"# device: {dev.device_kind} ({dev.platform})")
        print(f"on-hardware u0 error vs CPU f64/40-iter ({N_SCEN} cold starts):")
        print(f"  max   {err.max():.2e}")
        print(f"  mean  {err.mean():.2e}")
        ok = int(np.asarray(res.status == 0).sum())
        print(f"  status ok {ok}/{N_SCEN}")


if __name__ == "__main__":
    main()
