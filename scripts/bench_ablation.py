#!/usr/bin/env python
"""Ablate the non-QP parts of the RTI step at production batch:
full MLP sdf vs trivial-plane sdf (isolates the network share), and
bf16-weight MLP variant."""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

B = 4096


def timeit(fn, *args, iters=8):
    out = fn(*args)
    out.u0.block_until_ready()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        out.u0.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), out


def build_with_sdf(sdf_fn, tag):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build
    import sdf_nmpc_tpu.ocp as ocpmod
    from sdf_nmpc_tpu.solver import make_rti_step

    cfg, ocp, step, states, inputs = _build(batch=B)
    if sdf_fn is not None:
        ocp2 = ocpmod.build_ocp(cfg, sdf_fn=sdf_fn, sdf_max_df=1.0)
        step = make_rti_step(ocp2, cfg, with_evals=False)
    vstep = jax.jit(jax.vmap(step))
    t, out = timeit(vstep, states, inputs)
    ok = int(np.asarray(out.status == 0).sum())
    print(f"{tag:28s} {t * 1e3:8.1f} ms  ({B / t:8.0f} solves/s, ok {ok}/{B})")
    return t


def main():
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.nn import init_neural_df, make_sdf_fn

    t_full = build_with_sdf(None, "full MLP (f32)")

    plane = lambda pos, latent: 5.0 - pos[0]
    t_plane = build_with_sdf(plane, "trivial plane sdf")
    print(f"MLP share of step: {(t_full - t_plane) * 1e3:.1f} ms")

    module, params = init_neural_df(size_latent=128, layer_sizes=(256,) * 4, seed=0)
    params_bf16 = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if hasattr(x, "astype") else x, params
    )

    def sdf_bf16(pos, latent):
        x = jnp.concatenate([pos, latent]).astype(jnp.bfloat16)
        return module.apply(params_bf16, x)[0].astype(jnp.float32)

    build_with_sdf(sdf_bf16, "bf16-weight MLP")


if __name__ == "__main__":
    main()
