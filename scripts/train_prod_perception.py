#!/usr/bin/env python
"""Production perception training at the REFERENCE fidelity (VERDICT r3 item 1).

Unlike scripts/train_latent_sdf.py (bespoke in-memory loop, plain MSE on SDF
values, 135x240), this drives the framework's OWN data/training engine at the
reference resolution and loss — the exact regime of reference
config/default.yaml:116-119 + scripts/neural_nets/{vae_train,df_train}.py:

  data : analytic scenes -> 270x480 DEPTH images (mm units, is_depth=True,
         exercising the clip_distance + depth2range preprocessing) -> HDF5
         train/test groups (data/h5.py)
  vae  : train_dataset_from_h5(vae=True, col_map=True) -> ImageAugmenter ->
         training/vae.py (masked/biased MSE + beta-KLD, batchnorm ResNet)
  df   : frozen encoder latent SAMPLING (M per image) + mixed-region point
         sampling + DfComputer image-based GT -> training/df.py with the
         COMPOSITE loss (sign-weighted regression + input-gradient MSE +
         direction + eikonal, data/losses.py loss_sdf, weights 50/0/1:60/5 —
         reference df_train.py:73, utils/losses.py:68-96)
  save : weights/ artifacts (msgpack + latents + meta.json with img=270x480)
  eval : closed-loop on UNSEEN blocking scenes — frozen / refresh /
         refresh+rec-feas modes; stats merged into meta.json

Stages are independent and resumable:

    python scripts/train_prod_perception.py data vae df save eval --out weights

Run the vae/df stages on the TPU (one job at a time through the tunnel).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import argparse
import json
import time

import numpy as np

HFOV, VFOV, DMAX = 0.7592, 0.4903, 5.0  # reference sensor block


def _depth_factor(H, W):
    """Per-pixel range->depth factor (inverse of perception.depth2range)."""
    import jax.numpy as jnp

    from sdf_nmpc_tpu.perception.preprocessing import depth2range

    ones = jnp.ones((H, W), jnp.float32)
    return np.asarray(depth2range(ones, HFOV, VFOV))  # range = depth * factor


def stage_data(args):
    """Scenes -> rendered depth images (mm) -> HDF5 with train/test groups."""
    import h5py
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.sim import render_range_image
    from train_latent_sdf import generate_scenes

    H, W = args.H, args.W
    factor = _depth_factor(H, W)

    n = args.scenes
    train_scenes = (
        generate_scenes(n // 2, seed=0)
        + generate_scenes(n - n // 2, seed=1, blocking=True)
    )
    test_scenes = generate_scenes(args.test_scenes, seed=999, blocking=True)

    render = jax.jit(
        lambda sc, p, R: render_range_image(
            sc, p, R, H, W, HFOV, VFOV, DMAX
        )
    )

    def yaw_rot(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    def render_set(scenes, poses_per_scene, seed):
        rng = np.random.default_rng(seed)
        out = []
        for sc in scenes:
            for j in range(poses_per_scene):
                if j == 0:
                    p, R = np.zeros(3, np.float32), np.eye(3, dtype=np.float32)
                elif args.pose_mode == "traj":
                    # trajectory-sampled viewpoints: poses along the flight
                    # corridor toward the goal region, the distribution the
                    # REFRESH deployment mode re-encodes from.  The r4
                    # origin-jitter data left mid-flight viewpoints out of
                    # distribution and the refresh closed-loop collided 7/8
                    # (docs/performance.md round-4 closed-loop table).
                    p = rng.uniform(
                        [0.0, -0.6, -0.35], [2.8, 0.6, 0.35]
                    ).astype(np.float32)
                    R = yaw_rot(rng.uniform(-0.45, 0.45))
                else:  # 'jitter': small pose jitter around the origin
                    p = rng.uniform([-0.3, -0.3, -0.15], [0.3, 0.3, 0.15]).astype(np.float32)
                    R = yaw_rot(rng.uniform(-0.15, 0.15))
                rng01 = np.asarray(render(sc, jnp.asarray(p), jnp.asarray(R)))
                depth_mm = rng01 * DMAX / factor * 1000.0  # range -> depth, m -> mm
                out.append(depth_mm.astype(np.float32)[None])  # (1, H, W)
        return np.stack(out)

    t0 = time.time()
    imgs_train = render_set(train_scenes, args.poses, seed=10)
    imgs_test = render_set(test_scenes, 1, seed=11)
    print(f"rendered {len(imgs_train)}+{len(imgs_test)} images {H}x{W} "
          f"in {time.time() - t0:.0f}s")

    path = Path(args.workdir) / "prod_depth.hdf5"
    path.parent.mkdir(parents=True, exist_ok=True)
    with h5py.File(path, "w") as f:
        f.create_group("train").create_dataset("images", data=imgs_train)
        f.create_group("test").create_dataset("images", data=imgs_test)
        f.attrs["hfov"] = HFOV
        f.attrs["vfov"] = VFOV
        f.attrs["aspect_ratio"] = W / H
        f.attrs["is_depth"] = True
        f.attrs["is_spherical"] = False
    print(f"dataset -> {path}")


def stage_vae(args):
    from sdf_nmpc_tpu.data.h5 import train_dataset_from_h5
    from sdf_nmpc_tpu.training import VaeTrainConfig, train_vae

    (train_ds, valid_ds), metadata = train_dataset_from_h5(
        args.workdir, "prod_depth.hdf5", DMAX, train_valid_ratio=0.9,
        vae=True, col_map=True,
    )
    cfg = VaeTrainConfig(
        size_latent=args.latent, nb_epochs=args.vae_epochs,
        batch_size=args.vae_batch,
    )
    out = Path(args.workdir) / "vae_ckpt"
    out.mkdir(parents=True, exist_ok=True)
    _, _, history = train_vae(train_ds, valid_ds, metadata, out, cfg=cfg)
    (out / "history.json").write_text(json.dumps(history))


def stage_df(args):
    from sdf_nmpc_tpu.data.h5 import train_dataset_from_h5
    from sdf_nmpc_tpu.training import DfTrainConfig, train_df
    from sdf_nmpc_tpu.training.checkpoints import load_encoder_from_vae_ckpt

    (train_ds, valid_ds), metadata = train_dataset_from_h5(
        args.workdir, "prod_depth.hdf5", DMAX, train_valid_ratio=0.9, vae=False
    )
    H, W = metadata["shape_imgs"][-2:]
    encoder, enc_vars = load_encoder_from_vae_ckpt(
        Path(args.workdir) / "vae_ckpt", args.latent, H, W
    )
    cfg = DfTrainConfig(
        dmax=DMAX, nb_epochs=args.df_epochs, batch_size=args.df_batch,
        points_per_img=args.points_per_img,
        lr_start=args.df_lr, lr_nb_steps=args.df_lr_steps,
    )
    out = Path(args.workdir) / f"df_ckpt_{'_'.join(map(str, args.layers))}"
    out.mkdir(parents=True, exist_ok=True)
    _, _, history = train_df(
        train_ds, valid_ds, metadata, enc_vars, out, cfg=cfg,
        nn_kwargs={"layer_sizes": tuple(args.layers), "w0": args.w0,
                   "dropout_rate": 0.0},
        size_latent=args.latent,
        restart_from_epoch=args.restart_from_epoch,
        encoder_module=encoder,
    )
    (out / "history.json").write_text(json.dumps(history))


def _load_trained(args):
    """(vae, vae_vars, df_module, df_params, metadata-ish) from checkpoints."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from sdf_nmpc_tpu.nn.neural_df import NeuralDF
    from sdf_nmpc_tpu.nn.vae import Vae

    H, W = args.H, args.W
    vae = Vae(size_latent=args.latent, shape_imgs=(1, H, W),
              dropout_rate=0.0, batchnorm=True)
    key = jax.random.PRNGKey(0)
    template = vae.init({"params": key, "latent": key, "dropout": key},
                        jnp.zeros((1, H, W, 1)), train=True)
    blob = (Path(args.workdir) / "vae_ckpt" / "weights.msgpack").read_bytes()
    target = {"params": template["params"], "opt_state": None,
              "batch_stats": template.get("batch_stats", {})}
    restored = serialization.from_bytes(target, blob)
    vae_vars = {"params": restored["params"]}
    if restored["batch_stats"]:
        vae_vars["batch_stats"] = restored["batch_stats"]

    df = NeuralDF(size_latent=args.latent, layer_sizes=tuple(args.layers),
                  embed="oct", act="sin", w0=args.w0, dropout_rate=0.0)
    df_template = df.init(key, jnp.zeros(3 + args.latent), train=False)
    df_dir = Path(args.workdir) / f"df_ckpt_{'_'.join(map(str, args.layers))}"
    ep = getattr(args, "df_ckpt_epoch", None)
    ck = "weights.msgpack" if ep is None else f"epochs/e{ep}.msgpack"
    df_blob = (df_dir / ck).read_bytes()
    # train_df checkpoints the FULL flax variables dict under "params"
    df_restored = serialization.from_bytes(
        {"params": df_template, "opt_state": None, "batch_stats": {}},
        df_blob,
    )
    df_params = df_restored["params"]
    return vae, vae_vars, df, df_params


def _encode(vae, vae_vars, imgs01):
    """Range images [0,1] (S, H, W) -> latent means."""
    import jax.numpy as jnp

    return vae.apply(vae_vars, jnp.asarray(imgs01)[..., None],
                     method=lambda m, x: m.encoder(x))


def stage_save(args):
    """weights/ artifacts for the bench configs + accuracy workload."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from sdf_nmpc_tpu.sim import render_range_image
    from train_latent_sdf import generate_scenes

    vae, vae_vars, df, df_params = _load_trained(args)
    H, W = args.H, args.W

    # encoded-scene latents for the accuracy workload (origin views, range01)
    n = args.scenes
    train_scenes = (
        generate_scenes(n // 2, seed=0)
        + generate_scenes(n - n // 2, seed=1, blocking=True)
    )
    render = jax.jit(
        lambda sc: render_range_image(sc, jnp.zeros(3), jnp.eye(3), H, W,
                                      HFOV, VFOV, DMAX)
    )
    imgs = np.stack([np.asarray(render(sc)) for sc in train_scenes[:64]])
    lats = np.asarray(_encode(vae, vae_vars, imgs))

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    (out / "sdf.msgpack").write_bytes(serialization.to_bytes(df_params))
    enc_vars = {"params": vae_vars["params"]["encoder"]}
    if "batch_stats" in vae_vars:
        enc_vars["batch_stats"] = vae_vars["batch_stats"]["encoder"]
    (out / "vae_encoder.msgpack").write_bytes(serialization.to_bytes(enc_vars))
    dec_vars = {"params": vae_vars["params"]["decoder"]}
    if "batch_stats" in vae_vars:
        dec_vars["batch_stats"] = vae_vars["batch_stats"]["decoder"]
    (out / "vae_decoder.msgpack").write_bytes(serialization.to_bytes(dec_vars))
    np.save(out / "latents.npy", lats.astype(np.float32))

    meta = dict(
        size_latent=args.latent,
        layer_sizes=list(args.layers),
        embed="oct", act="sin", w0=args.w0,
        img=f"{H}x{W}", scenes=args.scenes,
        batchnorm=True,
        pipeline="h5+augment+composite",  # the framework engine, not train_latent_sdf
        loss="sign-weighted regression + grad MSE + direction + eikonal (50/0/1:60/5)",
        vae_epochs=args.vae_epochs, df_epochs=args.df_epochs,
        pose_mode=args.pose_mode, poses=args.poses,
        df_lr=args.df_lr, df_lr_steps=args.df_lr_steps,
        points_per_img=args.points_per_img,
        df_ckpt_epoch=getattr(args, "df_ckpt_epoch", None),
    )
    mf = out / "meta.json"
    if mf.exists():  # keep stats from a previous eval stage
        old = json.loads(mf.read_text())
        if "stats" in old:
            meta["stats"] = old["stats"]
    mf.write_text(json.dumps(meta))
    print(f"artifacts -> {out}/")


def stage_eval(args):
    """Closed-loop table on UNSEEN scenes: frozen / refresh / rec-feas."""
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.sim import render_range_image
    from train_latent_sdf import (
        evaluate_closed_loop,
        evaluate_perception_in_loop,
        generate_scenes,
    )

    vae, vae_vars, df, df_params = _load_trained(args)
    H, W = args.H, args.W
    test_scenes = generate_scenes(args.test_scenes, seed=999, blocking=True)
    render = jax.jit(
        lambda sc: render_range_image(sc, jnp.zeros(3), jnp.eye(3), H, W,
                                      HFOV, VFOV, DMAX)
    )
    imgs_test = np.stack([np.asarray(render(sc)) for sc in test_scenes])
    lat_test = np.asarray(_encode(vae, vae_vars, imgs_test))

    print("[frozen] latent from the origin view, frozen for the run")
    stats = evaluate_closed_loop(test_scenes, lat_test, df, df_params, args.latent)
    print("[refresh] re-render + re-encode every chunk")
    stats.update(evaluate_perception_in_loop(
        test_scenes, vae, vae_vars, df, df_params, args.latent, H, W))
    print("[refresh + recursive feasibility]")
    stats.update(evaluate_perception_in_loop(
        test_scenes, vae, vae_vars, df, df_params, args.latent, H, W,
        rec_feas=True))

    mf = Path(args.out) / "meta.json"
    meta = json.loads(mf.read_text()) if mf.exists() else {}
    meta["stats"] = stats
    mf.write_text(json.dumps(meta))
    print(f"stats -> {mf}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stages", nargs="+",
                    choices=["data", "vae", "df", "save", "eval"])
    ap.add_argument("--workdir", default="runs/prod_perception")
    ap.add_argument("--out", default="weights")
    ap.add_argument("--img", default="270x480")
    ap.add_argument("--scenes", type=int, default=256)
    ap.add_argument("--test-scenes", type=int, default=8)
    ap.add_argument("--poses", type=int, default=2, help="camera poses per scene")
    ap.add_argument("--pose-mode", choices=["jitter", "traj"], default="traj",
                    help="extra-pose distribution: 'traj' samples the flight "
                         "corridor (covers the refresh deployment mode); "
                         "'jitter' is the r4 near-origin fallback")
    ap.add_argument("--latent", type=int, default=128)
    ap.add_argument("--layers", type=int, nargs="+", default=[256, 256, 256, 256])
    ap.add_argument("--w0", type=float, default=20.0)
    ap.add_argument("--vae-epochs", type=int, default=40)
    ap.add_argument("--vae-batch", type=int, default=16)
    ap.add_argument("--df-epochs", type=int, default=40)
    ap.add_argument("--df-batch", type=int, default=16)
    # the reference trains 200 epochs at 5e-5 (df_train.py); a compressed
    # epoch budget takes a proportionally hotter cosine schedule
    ap.add_argument("--df-lr", type=float, default=5e-5)
    ap.add_argument("--df-lr-steps", type=int, default=20)
    ap.add_argument("--df-ckpt-epoch", type=int, default=None,
                    help="save/eval from this epoch checkpoint (default: latest)")
    ap.add_argument("--points-per-img", type=int, default=2500)
    ap.add_argument("--restart-from-epoch", type=int, default=0)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny sizes for a CPU smoke run of every stage")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU backend (this container's sitecustomize "
                         "registers the TPU tunnel by default)")
    args = ap.parse_args()

    if args.cpu or args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from sdf_nmpc_tpu.utils.xla_cache import enable_persistent_cache

    enable_persistent_cache()  # restarts skip the multi-minute TPU compiles

    if args.smoke:
        args.img = "45x80"
        args.scenes, args.test_scenes, args.poses = 12, 2, 1
        args.latent = 16
        args.layers = [32, 32, 32, 32]
        args.vae_epochs = args.df_epochs = 2
        args.vae_batch = args.df_batch = 4
        args.points_per_img = 100
        args.workdir = "runs/prod_perception_smoke"
        args.out = "runs/prod_perception_smoke/weights"

    args.H, args.W = (int(v) for v in args.img.split("x"))

    for st in args.stages:
        print(f"===== stage {st} =====", flush=True)
        t0 = time.time()
        {"data": stage_data, "vae": stage_vae, "df": stage_df,
         "save": stage_save, "eval": stage_eval}[st](args)
        print(f"===== stage {st} done in {time.time() - t0:.0f}s =====", flush=True)


if __name__ == "__main__":
    main()
