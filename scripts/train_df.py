#!/usr/bin/env python
"""SDF-network training CLI (reference scripts/neural_nets/df_train.py).

Trains the NeuralDF variants on an HDF5 image dataset with a frozen VAE
encoder.  Example:

    python scripts/train_df.py --data data.hdf5 --encoder vae_ckpt/ --out runs/sdf
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse
import json
from pathlib import Path

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=".", help="directory holding the dataset")
    ap.add_argument("--data", required=True, help="hdf5 dataset file")
    ap.add_argument("--encoder", required=True, help="encoder checkpoint dir (weights.msgpack)")
    ap.add_argument("--out", required=True, help="output run directory")
    ap.add_argument("--dmax", type=float, default=5.0)
    ap.add_argument("--size-latent", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--batch-size", type=int, default=50)
    ap.add_argument("--points-per-img", type=int, default=2500)
    ap.add_argument("--restart-from-epoch", type=int, default=0)
    ap.add_argument(
        "--variants",
        default="128_128_128_128,256_256_128_64",
        help="comma-separated layer-size variants (reference trains two concurrently)",
    )
    args = ap.parse_args()

    from sdf_nmpc_tpu.data.h5 import train_dataset_from_h5
    from sdf_nmpc_tpu.training import DfTrainConfig, train_df
    from sdf_nmpc_tpu.training.checkpoints import load_encoder_from_vae_ckpt

    (train_ds, valid_ds), metadata = train_dataset_from_h5(
        args.data_dir, args.data, args.dmax, train_valid_ratio=0.9, vae=False
    )

    H, W = metadata["shape_imgs"][-2:]
    encoder, enc_vars = load_encoder_from_vae_ckpt(
        args.encoder, args.size_latent, H, W
    )

    cfg = DfTrainConfig(
        dmax=args.dmax, nb_epochs=args.epochs, batch_size=args.batch_size,
        points_per_img=args.points_per_img,
    )

    for variant in args.variants.split(","):
        sizes = [int(v) for v in variant.split("_")]
        out = Path(args.out) / variant
        out.mkdir(parents=True, exist_ok=True)
        print(f"=== training variant {variant} ===")
        _, _, history = train_df(
            train_ds, valid_ds, metadata, enc_vars, out, cfg=cfg,
            nn_kwargs={"layer_sizes": sizes}, size_latent=args.size_latent,
            restart_from_epoch=args.restart_from_epoch, encoder_module=encoder,
        )
        (out / "history.json").write_text(json.dumps(history))


if __name__ == "__main__":
    main()
