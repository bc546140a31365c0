#!/usr/bin/env python
"""Quantify the encoder resolution-shift risk (VERDICT r3 item 8).

The encoder's adaptive pooling makes ANY input resolution shape-compatible
(reference utils/preprocessing.py:83-99 Reshape contract + vae.py
AdaptiveAvgPool), so feeding a resolution the encoder was not trained at
fails silently — the latent distribution shifts instead of erroring.  This
script measures that shift for the shipped production encoder: the same
scenes are rendered at the trained resolution and at an alternate one, both
are encoded, and the latent drift plus the induced NeuralDF output drift over
frustum sample points are reported.

    python scripts/resolution_shift.py [--alt 135x240] [--cpu]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--alt", default="135x240", help="alternate resolution HxW")
    ap.add_argument("--scenes", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from sdf_nmpc_tpu.data.pos_sampler import PosSampler
    from sdf_nmpc_tpu.nn.weights import load_prod_sdf, load_prod_encoder, meta_img_shape
    from sdf_nmpc_tpu.sim import render_range_image
    from train_latent_sdf import generate_scenes

    loaded = load_prod_encoder()
    if loaded is None:
        raise SystemExit("no trained encoder in weights/")
    enc, enc_vars, meta = loaded
    Ht, Wt = meta_img_shape(meta)
    Ha, Wa = (int(v) for v in args.alt.split("x"))
    print(f"trained resolution {Ht}x{Wt}; alternate {Ha}x{Wa}")

    hfov, vfov, dmax = 0.7592, 0.4903, 5.0
    scenes = generate_scenes(args.scenes, seed=999, blocking=True)

    def encode_at(H, W):
        render = jax.jit(
            lambda sc: render_range_image(sc, jnp.zeros(3), jnp.eye(3), H, W,
                                          hfov, vfov, dmax)
        )
        imgs = jnp.stack([render(sc) for sc in scenes])
        return np.asarray(
            enc.apply(enc_vars, imgs[..., None], method=lambda m, x: m.encoder(x))
            if hasattr(enc, "encoder")
            else enc.apply(enc_vars, imgs[..., None])
        )

    lat_t = encode_at(Ht, Wt)
    lat_a = encode_at(Ha, Wa)

    l2 = np.linalg.norm(lat_a - lat_t, axis=1)
    scale = np.linalg.norm(lat_t, axis=1)
    cos = np.sum(lat_a * lat_t, axis=1) / (
        np.linalg.norm(lat_a, axis=1) * scale + 1e-12
    )
    print(f"latent drift:   rel L2 mean {np.mean(l2 / scale):.3f}  "
          f"max {np.max(l2 / scale):.3f}   cosine mean {np.mean(cos):.4f}  "
          f"min {np.min(cos):.4f}")

    sdf_loaded = load_prod_sdf()
    if sdf_loaded is None:
        return
    module, params = sdf_loaded
    sampler = PosSampler(dmax, hfov, vfov, margin=30)
    pts = np.asarray(
        sampler.sample_pos_in_frustrum(jax.random.PRNGKey(0), 2048)
    )

    def df_of(lat):
        x = np.concatenate(
            [np.repeat(pts[None], len(scenes), 0),
             np.repeat(lat[:, None], pts.shape[0], 1)], axis=-1
        ).reshape(-1, 3 + lat.shape[1])
        return np.asarray(module.apply(params, jnp.asarray(x, jnp.float32)))[:, 0]

    df_t = df_of(lat_t.astype(np.float32))
    df_a = df_of(lat_a.astype(np.float32))
    d = np.abs(df_a - df_t)
    print(f"NeuralDF drift: mean {d.mean():.4f} m  p95 {np.percentile(d, 95):.4f} m  "
          f"max {d.max():.4f} m  (df range [{df_t.min():.2f}, {df_t.max():.2f}])")
    # sign flips are what flip the collision constraint
    margin = 0.22 + 0.05  # robot.xy + bound_margin scale
    flips = np.mean((df_t > margin) != (df_a > margin))
    print(f"constraint-side flips at the {margin:.2f} m bound: {flips * 100:.2f}%")


if __name__ == "__main__":
    main()
