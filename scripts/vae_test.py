#!/usr/bin/env python
"""VAE evaluation panels: input / target / reconstruction / signed error
(reference scripts/neural_nets/vae_test.py — non-interactive, saves PNGs)."""

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

    from sdf_nmpc_tpu.data.h5 import test_dataset_from_h5
    from sdf_nmpc_tpu.nn import Vae

    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=".")
    ap.add_argument("--data", required=True)
    ap.add_argument("--vae", required=True, help="vae checkpoint dir")
    ap.add_argument("--size-latent", type=int, default=128)
    ap.add_argument("--dmax", type=float, default=5.0)
    ap.add_argument("--n-images", type=int, default=4)
    ap.add_argument("--out", default="vae_test_out")
    args = ap.parse_args()

    ds, metadata = test_dataset_from_h5(args.data_dir, args.data, args.dmax, vae=True, col_map=True)
    H, W = metadata["shape_imgs"][-2:]
    vae = Vae(size_latent=args.size_latent, shape_imgs=(1, H, W), dropout_rate=0.0)
    key = jax.random.PRNGKey(0)
    template = vae.init(
        {"params": key, "latent": key, "dropout": key},
        jnp.zeros((1, H, W, 1)), train=True,
    )
    blob = serialization.from_bytes(
        {"params": template["params"], "opt_state": None,
         "batch_stats": template.get("batch_stats", {})},
        (Path(args.vae) / "weights.msgpack").read_bytes(),
    )
    variables = {"params": blob["params"]}
    if "batch_stats" in template:
        variables["batch_stats"] = blob["batch_stats"]

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for i in range(min(args.n_images, len(ds))):
        img, label = ds[i]
        img2d = np.asarray(img[0] if img.ndim == 3 else img)
        lab2d = np.asarray(label[0] if label.ndim == 3 else label)
        recon = vae.apply(variables, jnp.asarray(img2d)[None, :, :, None])[0, :, :, 0]
        recon = np.asarray(recon)

        fig, axes = plt.subplots(2, 2, figsize=(12, 7))
        for ax, (data, title, cmap) in zip(
            axes.flat,
            [
                (img2d, "input", "viridis"),
                (lab2d, "target (collision-mapped)", "viridis"),
                (recon, "reconstruction", "viridis"),
                (recon - lab2d, "signed error", "RdBu"),
            ],
        ):
            im = ax.imshow(data, cmap=cmap)
            ax.set_title(title)
            fig.colorbar(im, ax=ax)
        fig.tight_layout()
        fig.savefig(out / f"vae_img{i}.png", dpi=110)
        plt.close(fig)
        print(f"wrote {out / f'vae_img{i}.png'}")


if __name__ == "__main__":
    main()
