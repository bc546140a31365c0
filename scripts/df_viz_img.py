#!/usr/bin/env python
"""Sphere-trace the neural SDF zero level set along pixel rays and re-render a
depth image for visual comparison (reference scripts/neural_nets/df_viz_img.py
ray-marching loop :85-97 — vectorized over all rays at once here)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse
from pathlib import Path

import numpy as np


def sphere_trace(sdf_batch_fn, rays, t0=0.05, n_steps=40, t_max=5.0):
    """March all rays together: t <- t + sdf(o + t*d).  rays: (N, 3) unit."""
    import jax
    import jax.numpy as jnp

    def body(t, _):
        p = rays * t[:, None]
        d = sdf_batch_fn(p)
        t = jnp.clip(t + d, t0, t_max)
        return t, None

    t, _ = jax.lax.scan(body, jnp.full(rays.shape[0], t0), None, length=n_steps)
    return t


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from sdf_nmpc_tpu.data.h5 import test_dataset_from_h5
    from sdf_nmpc_tpu.data.points import pixel_grid
    from sdf_nmpc_tpu.nn import Encoder
    from df_test import load_sdf  # sibling script helper

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=".")
    ap.add_argument("--data", required=True)
    ap.add_argument("--sdf", required=True)
    ap.add_argument("--encoder", required=True)
    ap.add_argument("--layer-sizes", default="256_256_128_64")
    ap.add_argument("--size-latent", type=int, default=128)
    ap.add_argument("--dmax", type=float, default=5.0)
    ap.add_argument("--downsamp", type=int, default=5)
    ap.add_argument("--n-images", type=int, default=2)
    ap.add_argument("--out", default="df_viz_img_out")
    args = ap.parse_args()

    ds, metadata = test_dataset_from_h5(args.data_dir, args.data, args.dmax)
    sizes = [int(v) for v in args.layer_sizes.split("_")]
    module, variables = load_sdf(args.sdf, args.size_latent, sizes)

    from sdf_nmpc_tpu.training.checkpoints import load_encoder_from_vae_ckpt

    H, W = metadata["shape_imgs"][-2:]
    encoder, enc_vars = load_encoder_from_vae_ckpt(args.encoder, args.size_latent, H, W)

    h, w = H // args.downsamp, W // args.downsamp
    rays = pixel_grid(h, w, metadata["hfov"], metadata["vfov"], metadata["is_spherical"])
    rays = rays.reshape(3, -1).T
    rays = rays / np.linalg.norm(rays, axis=-1, keepdims=True)

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(min(args.n_images, len(ds))):
        img, _ = ds[i]
        img2d = np.asarray(img[0] if img.ndim == 3 else img)
        latent = encoder.apply(enc_vars, jnp.asarray(img2d)[None, :, :, None])[0]

        def sdf_batch(p):
            x = jnp.concatenate([p, jnp.tile(latent[None], (p.shape[0], 1))], axis=-1)
            return module.apply(variables, x)[:, 0]

        t = np.asarray(sphere_trace(sdf_batch, jnp.asarray(rays), t_max=args.dmax))
        rendered = t.reshape(h, w) / args.dmax

        fig, axes = plt.subplots(1, 2, figsize=(12, 4))
        axes[0].imshow(img2d, cmap="viridis", vmin=0, vmax=1)
        axes[0].set_title("input range image")
        axes[1].imshow(rendered, cmap="viridis", vmin=0, vmax=1)
        axes[1].set_title("sphere-traced neural SDF")
        fig.tight_layout()
        fig.savefig(out / f"render_img{i}.png", dpi=110)
        plt.close(fig)
        print(f"wrote {out / f'render_img{i}.png'}")


if __name__ == "__main__":
    main()
