#!/usr/bin/env python
"""3-D closest-point projection scatter: x - df(x)*grad(x) for GT vs NN
(reference scripts/neural_nets/df_viz_3D.py :91-117 — saves PNGs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse
from pathlib import Path

import numpy as np


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from sdf_nmpc_tpu.data import DfComputer, PosSampler
    from sdf_nmpc_tpu.data.h5 import test_dataset_from_h5
    from sdf_nmpc_tpu.nn import Encoder
    from df_test import load_sdf

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=".")
    ap.add_argument("--data", required=True)
    ap.add_argument("--sdf", required=True)
    ap.add_argument("--encoder", required=True)
    ap.add_argument("--layer-sizes", default="256_256_128_64")
    ap.add_argument("--size-latent", type=int, default=128)
    ap.add_argument("--dmax", type=float, default=5.0)
    ap.add_argument("--n-points", type=int, default=3000)
    ap.add_argument("--out", default="df_viz_3d_out")
    args = ap.parse_args()

    ds, metadata = test_dataset_from_h5(args.data_dir, args.data, args.dmax)
    sizes = [int(v) for v in args.layer_sizes.split("_")]
    module, variables = load_sdf(args.sdf, args.size_latent, sizes)

    from sdf_nmpc_tpu.training.checkpoints import load_encoder_from_vae_ckpt

    H, W = metadata["shape_imgs"][-2:]
    encoder, enc_vars = load_encoder_from_vae_ckpt(args.encoder, args.size_latent, H, W)

    df_cpt = DfComputer(True, args.dmax, metadata["hfov"], metadata["vfov"], 1.0,
                        is_spherical=metadata["is_spherical"])
    sampler = PosSampler(args.dmax, metadata["hfov"], metadata["vfov"])

    img, _ = ds[0]
    img2d = np.asarray(img[0] if img.ndim == 3 else img)
    latent = encoder.apply(enc_vars, jnp.asarray(img2d)[None, :, :, None])[0]

    pts = sampler.sample_pos_in_frustrum(jax.random.PRNGKey(0), args.n_points)
    gt_df, gt_grad = df_cpt.get_df(img2d, pts)

    def sdf_scalar(x):
        return module.apply(variables, jnp.concatenate([x, latent]))[0]

    nn_df = jax.vmap(lambda p: sdf_scalar(p))(pts)
    nn_grad = jax.vmap(jax.grad(sdf_scalar))(pts)

    ## closest-point projections x - df * grad_normalized
    def project(pts, df, grad):
        g = np.asarray(grad)
        n = np.linalg.norm(g, axis=-1, keepdims=True)
        g = g / np.where(n == 0, 1.0, n)
        return np.asarray(pts) - np.asarray(df)[:, None] * g

    proj_gt = project(pts, gt_df, -np.asarray(gt_grad))  # gt grad points away
    proj_nn = project(pts, nn_df, nn_grad)

    mask = np.asarray(gt_df) < 0.99  # only unsaturated points are informative
    fig = plt.figure(figsize=(12, 5))
    for k, (proj, name) in enumerate([(proj_gt, "GT"), (proj_nn, "NN")]):
        ax = fig.add_subplot(1, 2, k + 1, projection="3d")
        ax.scatter(proj[mask, 0], proj[mask, 1], proj[mask, 2], s=2)
        ax.set_title(f"{name} closest-point projections")
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    fig.savefig(out / "closest_points.png", dpi=110)
    print(f"wrote {out / 'closest_points.png'}")


if __name__ == "__main__":
    main()
