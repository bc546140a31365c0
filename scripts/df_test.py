#!/usr/bin/env python
"""SDF-network evaluation: per-elevation frustum slice contours, NN vs GT
(reference scripts/neural_nets/df_test.py — non-interactive, saves PNGs)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse
from pathlib import Path

import numpy as np


def load_sdf(ckpt_dir, size_latent, layer_sizes):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from sdf_nmpc_tpu.nn import NeuralDF

    module = NeuralDF(size_latent=size_latent, layer_sizes=layer_sizes,
                      embed="oct", act="sin", w0=20.0)
    template = module.init(jax.random.PRNGKey(0), jnp.zeros(3 + size_latent))
    # train_df checkpoints store the full flax variables dict under "params"
    blob = serialization.from_bytes(
        {"params": template, "opt_state": None, "batch_stats": {}},
        (Path(ckpt_dir) / "weights.msgpack").read_bytes(),
    )
    return module, blob["params"]


def main():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.data import DfComputer, PosSampler
    from sdf_nmpc_tpu.data.h5 import test_dataset_from_h5
    from sdf_nmpc_tpu.nn import Encoder

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=".")
    ap.add_argument("--data", required=True)
    ap.add_argument("--sdf", required=True, help="sdf checkpoint dir")
    ap.add_argument("--encoder", required=True, help="encoder checkpoint dir")
    ap.add_argument("--layer-sizes", default="256_256_128_64")
    ap.add_argument("--size-latent", type=int, default=128)
    ap.add_argument("--dmax", type=float, default=5.0)
    ap.add_argument("--elevations", default="-15,0,15")
    ap.add_argument("--n-images", type=int, default=3)
    ap.add_argument("--out", default="df_test_out")
    args = ap.parse_args()

    from flax import serialization

    ds, metadata = test_dataset_from_h5(args.data_dir, args.data, args.dmax)
    sizes = [int(v) for v in args.layer_sizes.split("_")]
    module, variables = load_sdf(args.sdf, args.size_latent, sizes)

    from sdf_nmpc_tpu.training.checkpoints import load_encoder_from_vae_ckpt

    H, W = metadata["shape_imgs"][-2:]
    encoder, enc_vars = load_encoder_from_vae_ckpt(args.encoder, args.size_latent, H, W)

    df_cpt = DfComputer(True, args.dmax, metadata["hfov"], metadata["vfov"], 1.0,
                        is_spherical=metadata["is_spherical"])
    sampler = PosSampler(args.dmax, metadata["hfov"], metadata["vfov"],
                         is_spherical=metadata["is_spherical"])

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    elevations = [float(e) for e in args.elevations.split(",")]

    for i in range(min(args.n_images, len(ds))):
        img, _ = ds[i]
        latent = encoder.apply(enc_vars, jnp.transpose(img[None, None], (0, 2, 3, 1)))[0] \
            if img.ndim == 2 else encoder.apply(enc_vars, jnp.transpose(img[None], (0, 2, 3, 1)))[0]
        img2d = img[0] if img.ndim == 3 else img

        fig, axes = plt.subplots(len(elevations), 2, figsize=(10, 4 * len(elevations)))
        for r, elev in enumerate(elevations):
            pts = sampler.grid_frustrum_slice(4900, elev)
            gt, _ = df_cpt.get_df(img2d, pts)
            nn_in = jnp.concatenate([pts, jnp.tile(latent[None], (pts.shape[0], 1))], axis=-1)
            pred = module.apply(variables, nn_in)[:, 0]
            g = int(np.sqrt(pts.shape[0]))
            X = np.asarray(pts[:, 0]).reshape(g, g)
            Y = np.asarray(pts[:, 1]).reshape(g, g)
            for c, (vals, name) in enumerate([(gt, "GT"), (pred, "NN")]):
                ax = axes[r, c] if len(elevations) > 1 else axes[c]
                cf = ax.contourf(X, Y, np.asarray(vals).reshape(g, g), levels=15, cmap="RdBu")
                ax.contour(X, Y, np.asarray(vals).reshape(g, g), levels=[0.0], colors="k")
                ax.set_title(f"{name} slice elev {elev} deg")
                fig.colorbar(cf, ax=ax)
        fig.tight_layout()
        fig.savefig(out / f"slices_img{i}.png", dpi=110)
        plt.close(fig)
        print(f"wrote {out / f'slices_img{i}.png'}")


if __name__ == "__main__":
    main()
