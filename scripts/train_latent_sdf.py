#!/usr/bin/env python
"""Latent-conditioned SDF pipeline on synthetic scenes — the full reference
config-3 story with LEARNED perception, no external data:

  1. generate random analytic scenes; render range images from the origin
  2. train the beta-VAE on the images (reconstruction + KLD)
  3. train NeuralDF on (position, encoder-latent) -> exact scene SDF labels
  4. closed-loop evaluation on UNSEEN scenes: render -> encode -> frozen
     latent -> SDF-NMPC; report clearance/goal statistics vs flag-off baseline

The SDF net must generalize across scenes THROUGH the latent — per-scene
memorization cannot work because the weights are shared and only the latent
distinguishes scenes (the core claim of the reference paper).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import argparse
import time

import numpy as np


def generate_scenes(n, seed=0, n_spheres=2, blocking=False):
    """blocking=True pins the first sphere near the straight path to the goal,
    so a controller that ignores the scene MUST collide — the evaluation needs
    obstructed scenes to discriminate."""
    from sdf_nmpc_tpu.sim import Scene

    rng = np.random.default_rng(seed)
    scenes = []
    for _ in range(n):
        spheres = []
        for j in range(n_spheres):
            if blocking and j == 0:
                c = [rng.uniform(1.5, 2.8), rng.uniform(-0.15, 0.15), rng.uniform(-0.15, 0.15)]
                spheres.append((c, rng.uniform(0.35, 0.55)))
            else:
                c = [rng.uniform(1.2, 4.0), rng.uniform(-1.2, 1.2), rng.uniform(-0.6, 0.6)]
                spheres.append((c, rng.uniform(0.25, 0.55)))
        scenes.append(Scene.make(spheres=spheres))
    return scenes


def render_all(scenes, H, W, hfov, vfov, dmax):
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.sim import render_range_image

    render = jax.jit(
        lambda sc: render_range_image(sc, jnp.zeros(3), jnp.eye(3), H, W, hfov, vfov, dmax)
    )
    return jnp.stack([render(sc) for sc in scenes])  # (S, H, W)


def train_vae_on_images(imgs, size_latent, epochs, log_fn=print):
    """Quick beta-VAE training on in-memory images; returns (vae, variables)."""
    import jax
    import jax.numpy as jnp
    import optax

    from sdf_nmpc_tpu.data.losses import loss_kld, loss_mse_valid_pixels_bias_pos_dist
    from sdf_nmpc_tpu.nn import Vae, sample_latent
    from sdf_nmpc_tpu.nn.initializers import apply_conv_init

    S, H, W = imgs.shape
    x_all = jnp.asarray(imgs)[..., None]  # (S, H, W, 1)
    vae = Vae(size_latent=size_latent, shape_imgs=(1, H, W), dropout_rate=0.0, batchnorm=False)
    key = jax.random.PRNGKey(0)
    variables = vae.init({"params": key, "latent": key}, x_all[:1], train=True)
    params = apply_conv_init(variables["params"], key)

    tx = optax.adam(2e-4)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, xb, key):
        def loss_fn(p):
            mean, logvar = vae.apply(
                {"params": p}, xb, True, True,
                method=lambda m, x, train, wl: m.encoder(x, train, wl),
            )
            z = sample_latent(key, mean, logvar)
            recon = vae.apply({"params": p}, z, True, method=lambda m, z, t: m.decoder(z, t),
                              rngs={"latent": key})
            l_r = loss_mse_valid_pixels_bias_pos_dist(xb, recon, 0.1, 0.1, 3)
            l_k = loss_kld(mean, logvar, 1.0, size_latent, (H, W))
            return l_r + l_k, (l_r, l_k)

        (_, (l_r, l_k)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, l_r, l_k

    bs = 16
    rng = np.random.default_rng(0)
    for ep in range(epochs):
        order = rng.permutation(S)
        l_r = l_k = 0.0
        nb = 0
        for i in range(0, S, bs):
            key, sub = jax.random.split(key)
            idx = order[i : i + bs]
            params, opt_state, lr_, lk_ = step(params, opt_state, x_all[idx], sub)
            l_r += float(lr_); l_k += float(lk_); nb += 1
        log_fn(f"  vae epoch {ep}: recon {l_r / nb:.3f} kld {l_k / nb:.4f}")
    return vae, {"params": params}


def train_latent_sdf(scenes, latents, size_latent, layer_sizes, steps, batch_scenes,
                     pts_per_scene, seed=0, log_fn=print):
    """NeuralDF on (pos, latent) -> exact scene SDF; scenes distinguished only
    by their latent."""
    import jax
    import jax.numpy as jnp
    import optax

    from sdf_nmpc_tpu.data.pos_sampler import PosSampler
    from sdf_nmpc_tpu.nn import init_neural_df
    from sdf_nmpc_tpu.sim import Scene, scene_sdf

    module, params = init_neural_df(
        size_latent=size_latent, layer_sizes=list(layer_sizes), embed="oct",
        act="sin", w0=8.0, seed=seed,
    )
    sampler = PosSampler(5.0, 0.7592, 0.4903, margin=30)
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    # stack scene primitives so a scene index selects one (vmappable)
    stack = jax.tree.map(lambda *xs: jnp.stack(xs), *scenes)
    lat = jnp.asarray(latents)  # (S, L)
    S = lat.shape[0]

    @jax.jit
    def step(params, opt_state, key):
        ks, kp1, kp2 = jax.random.split(key, 3)
        sidx = jax.random.randint(ks, (batch_scenes,), 0, S)
        pts = jnp.concatenate(
            [
                sampler.sample_pos_in_frustrum(kp1, batch_scenes * (pts_per_scene // 2),
                                               add_margin=True),
                sampler.sample_pos_in_ball(kp2, batch_scenes * (pts_per_scene // 2), 1.5),
            ]
        ).reshape(batch_scenes, pts_per_scene, 3)

        scene_b = jax.tree.map(lambda x: x[sidx], stack)
        gt = jax.vmap(
            lambda sc, ps: jax.vmap(lambda p: jnp.clip(scene_sdf(Scene(*sc), p), -0.3, 1.0))(ps)
        )(tuple(scene_b), pts)

        lat_b = lat[sidx][:, None, :].repeat(pts_per_scene, axis=1)
        x = jnp.concatenate([pts, lat_b], axis=-1).reshape(-1, 3 + lat.shape[1])

        def loss_fn(p):
            pred = module.apply(p, x)[:, 0]
            return jnp.mean((pred - gt.reshape(-1)) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(seed)
    loss = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, sub)
        if i % max(steps // 10, 1) == 0:
            log_fn(f"  sdf step {i}: mse {float(loss):.5f}")
    return module, params, float(loss)


def encode_latents(vae, variables, imgs):
    import jax.numpy as jnp

    return vae.apply(variables, jnp.asarray(imgs)[..., None],
                     method=lambda m, x: m.encoder(x))


def evaluate_closed_loop(test_scenes, test_latents, module, params, size_latent,
                         n_ticks=100, log_fn=print):
    """Closed loop per unseen scene with its encoded latent; returns stats."""
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
        nn=dict(size_latent=size_latent), solver=dict(dtype="float32", qp_iters=8)
    )
    ocp = build_ocp(cfg, sdf_fn=make_sdf_fn(module, params), sdf_max_df=1.0)
    layout = ParamLayout.from_cfg(cfg)
    N = ocp.N

    # scene passed as DATA: one compilation serves every (scene, flag) pair
    rollout = jax.jit(
        make_closed_loop(ocp, cfg, n_ticks=n_ticks,
                         scene_sdf_fn=lambda p, sc: scene_sdf(sc, p))
    )
    results = []
    for scene, latent, flag in [(s, l, f) for (s, l) in zip(test_scenes, test_latents)
                                for f in (1.0, 0.0)]:
        p = np.zeros((N + 1, layout.np_total), np.float32)
        layout.set_flag(p, flag)
        layout.set_camera(p, np.zeros(3), np.eye(3))
        layout.set_q_d(p, [1, 0, 0, 0])
        layout.set_latent(p, np.asarray(latent))
        ref = Ref(cfg).use_constrained_weights(False)
        ref.p = np.array([3.5, 0.0, 0.0])
        yr, W = ocp.pack_ref(ref)
        x0 = np.zeros(10, np.float32); x0[3] = 1.0
        inputs = SolveInputs(
            x0=jnp.asarray(x0),
            yref=jnp.tile(jnp.asarray(yr, jnp.float32)[None], (N, 1)),
            W=jnp.tile(jnp.asarray(W, jnp.float32)[None], (N, 1)),
            yrefN=jnp.asarray(yr[: ocp.nyN], jnp.float32),
            WN=jnp.asarray(W[: ocp.nyN], jnp.float32),
            p=jnp.asarray(p),
        )
        res = rollout(jnp.asarray(x0), inputs, scene)
        results.append((flag, float(res.min_clearance), float(res.tracking_error),
                        int(np.asarray(res.statuses).sum())))

    on = [r for r in results if r[0] == 1.0]
    off = [r for r in results if r[0] == 0.0]
    stats = {
        "scenes": len(on),
        "sdf_on_collision_rate": float(np.mean([r[1] < 0 for r in on])),
        "sdf_on_mean_clearance": float(np.mean([r[1] for r in on])),
        "sdf_on_mean_goal_err": float(np.mean([r[2] for r in on])),
        "sdf_off_collision_rate": float(np.mean([r[1] < 0 for r in off])),
        "solver_failures": int(np.sum([r[3] for r in results])),
    }
    for k, v in stats.items():
        log_fn(f"  {k}: {v}")
    return stats


def evaluate_perception_in_loop(test_scenes, vae, vae_vars, module, params,
                                size_latent, H, W, n_chunks=6, ticks_per_chunk=15,
                                rec_feas=False, log_fn=print):
    """Highest-fidelity eval: every chunk re-renders from the CURRENT pose,
    re-encodes with the trained VAE, and freezes the new observation —
    the deployed image-update cycle end to end."""
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.config import default_config
    from sdf_nmpc_tpu.math import quat2rot
    from sdf_nmpc_tpu.nn import make_sdf_fn
    from sdf_nmpc_tpu.ocp import build_ocp
    from sdf_nmpc_tpu.params import ParamLayout
    from sdf_nmpc_tpu.ref_gen import Ref
    from sdf_nmpc_tpu.sim import (
        make_closed_loop_perception, render_range_image, scene_sdf,
    )
    from sdf_nmpc_tpu.solver import SolveInputs

    cfg = default_config().replace(
        nn=dict(size_latent=size_latent), solver=dict(dtype="float32", qp_iters=8)
    )
    bdist_coeffs = None
    if rec_feas:
        # fit the braking-distance surrogate with the framework's own theory
        # pipeline (reference find_amax grid + poly_fit)
        from sdf_nmpc_tpu.theory import braking_grid, fit_poly

        vel, bdist, _ = braking_grid(cfg, vmax=3.0, step=0.25)
        bdist_coeffs = fit_poly(vel, bdist, degree=cfg.mpc.braking_dist.degree)
        cfg = cfg.replace(flags=dict(recursive_feasibility=True))
    ocp = build_ocp(cfg, sdf_fn=make_sdf_fn(module, params), sdf_max_df=1.0,
                    bdist_coeffs=bdist_coeffs)
    layout = ParamLayout.from_cfg(cfg)
    N = ocp.N

    def observe(x, sc):
        q = x[3:7] / jnp.linalg.norm(x[3:7])
        W_R_B = quat2rot(q)
        img = render_range_image(sc, x[:3], W_R_B, H, W, 0.7592, 0.4903, 5.0)
        latent = vae.apply(vae_vars, img[None, :, :, None],
                           method=lambda m, im: m.encoder(im))[0]
        return x[:3], W_R_B, latent

    rollout = jax.jit(
        make_closed_loop_perception(
            ocp, cfg, n_chunks=n_chunks, ticks_per_chunk=ticks_per_chunk,
            observe_fn=observe, scene_sdf_fn=lambda p, sc: scene_sdf(sc, p),
        )
    )

    p = np.zeros((N + 1, layout.np_total), np.float32)
    layout.set_flag(p, 1.0)
    layout.set_q_d(p, [1, 0, 0, 0])
    ref = Ref(cfg).use_constrained_weights(False)
    ref.p = np.array([3.5, 0.0, 0.0])
    yr, Wt = ocp.pack_ref(ref)
    x0 = np.zeros(10, np.float32); x0[3] = 1.0
    inputs = SolveInputs(
        x0=jnp.asarray(x0),
        yref=jnp.tile(jnp.asarray(yr, jnp.float32)[None], (N, 1)),
        W=jnp.tile(jnp.asarray(Wt, jnp.float32)[None], (N, 1)),
        yrefN=jnp.asarray(yr[: ocp.nyN], jnp.float32),
        WN=jnp.asarray(Wt[: ocp.nyN], jnp.float32),
        p=jnp.asarray(p),
    )

    rows = []
    for scene in test_scenes:
        res = rollout(jnp.asarray(x0), inputs, scene)
        rows.append((float(res.min_clearance), float(res.tracking_error),
                     int(np.asarray(res.statuses).sum())))
    tag = "refresh_recfeas" if rec_feas else "refresh"
    stats = {
        f"{tag}_collision_rate": float(np.mean([r[0] < 0 for r in rows])),
        f"{tag}_mean_clearance": float(np.mean([r[0] for r in rows])),
        f"{tag}_mean_goal_err": float(np.mean([r[1] for r in rows])),
        f"{tag}_solver_failures": int(np.sum([r[2] for r in rows])),
    }
    for k, v in stats.items():
        log_fn(f"  {k}: {v}")
    return stats


def save_artifacts(out_dir, vae_vars, module, params, lat_train, layer_sizes, args, stats):
    """Persist trained weights for the bench configs + accuracy workload
    (VERDICT r2 item 4): flax msgpack trees + encoded latents + meta."""
    import json

    from flax import serialization

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    (out / "sdf.msgpack").write_bytes(serialization.to_bytes(params))
    (out / "vae_encoder.msgpack").write_bytes(
        serialization.to_bytes({"params": vae_vars["params"]["encoder"]})
    )
    (out / "vae_decoder.msgpack").write_bytes(
        serialization.to_bytes({"params": vae_vars["params"]["decoder"]})
    )
    np.save(out / "latents.npy", np.asarray(lat_train[:64], np.float32))
    (out / "meta.json").write_text(
        json.dumps(
            dict(
                size_latent=args.latent,
                layer_sizes=list(layer_sizes),
                embed="oct", act="sin", w0=8.0,
                img=args.img, scenes=args.scenes, sdf_steps=args.sdf_steps,
                vae_epochs=args.vae_epochs, stats=stats,
            )
        )
    )
    print(f"artifacts -> {out}/ (sdf.msgpack, vae_encoder/decoder.msgpack, latents.npy)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="tiny sizes for smoke runs")
    ap.add_argument("--prod", action="store_true",
                    help="production scale: 128-latent VAE + 4x256 NeuralDF "
                         "(the shipped-weights substitute, VERDICT r2 item 4)")
    ap.add_argument("--scenes", type=int, default=192)
    ap.add_argument("--test-scenes", type=int, default=8)
    ap.add_argument("--latent", type=int, default=32)
    ap.add_argument("--vae-epochs", type=int, default=25)
    ap.add_argument("--sdf-steps", type=int, default=2500)
    ap.add_argument("--img", default="64x96")
    ap.add_argument("--out", default=None,
                    help="persist trained weights to this dir (weights/ for the benches)")
    args = ap.parse_args()

    if args.quick:
        args.scenes, args.test_scenes = 24, 3
        args.vae_epochs, args.sdf_steps = 3, 200
        args.latent = 16
    if args.prod:
        args.latent = 128
        args.img = "135x240"
        args.sdf_steps = max(args.sdf_steps, 4000)

    H, W = (int(v) for v in args.img.split("x"))
    hfov, vfov, dmax = 0.7592, 0.4903, 5.0

    t0 = time.time()
    print(f"[1/4] generating {args.scenes}+{args.test_scenes} scenes, rendering {H}x{W} ...")
    train_scenes = (
        generate_scenes(args.scenes // 2, seed=0)
        + generate_scenes(args.scenes - args.scenes // 2, seed=1, blocking=True)
    )
    test_scenes = generate_scenes(args.test_scenes, seed=999, blocking=True)
    imgs_train = render_all(train_scenes, H, W, hfov, vfov, dmax)
    imgs_test = render_all(test_scenes, H, W, hfov, vfov, dmax)
    print(f"    rendered in {time.time() - t0:.0f}s")

    print("[2/4] training beta-VAE ...")
    vae, vae_vars = train_vae_on_images(np.asarray(imgs_train), args.latent, args.vae_epochs)

    print("[3/4] training latent-conditioned NeuralDF ...")
    lat_train = encode_latents(vae, vae_vars, np.asarray(imgs_train))
    layer_sizes = (
        (32, 32, 32, 32) if args.quick
        else (256, 256, 256, 256) if args.prod
        else (128, 128, 128, 128)
    )
    module, params, loss = train_latent_sdf(
        train_scenes, np.asarray(lat_train), args.latent,
        layer_sizes=layer_sizes,
        steps=args.sdf_steps, batch_scenes=16, pts_per_scene=256,
    )
    print(f"    final train mse {loss:.5f}")

    print("[4/4] closed-loop evaluation on UNSEEN scenes (render -> encode -> solve) ...")
    lat_test = encode_latents(vae, vae_vars, np.asarray(imgs_test))
    stats = evaluate_closed_loop(test_scenes, np.asarray(lat_test), module, params, args.latent)

    print("[4b] perception-in-the-loop (re-render + re-encode every chunk) ...")
    evaluate_perception_in_loop(test_scenes, vae, vae_vars, module, params,
                                args.latent, H, W)

    print("[4c] perception-in-the-loop WITH recursive feasibility ...")
    evaluate_perception_in_loop(test_scenes, vae, vae_vars, module, params,
                                args.latent, H, W, rec_feas=True)

    ok = stats["sdf_on_collision_rate"] < stats["sdf_off_collision_rate"] and stats[
        "sdf_on_collision_rate"] <= 0.25
    print("RESULT:", "OK — latent-conditioned avoidance works on unseen scenes"
          if ok else "WARN — insufficient generalization (train longer / more scenes)")
    if args.out:
        save_artifacts(args.out, vae_vars, module, params, np.asarray(lat_train),
                       layer_sizes, args, stats)
    print(f"total {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
