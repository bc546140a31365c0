#!/usr/bin/env python
"""beta-VAE training CLI (reference scripts/neural_nets/vae_train.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", default=".")
    ap.add_argument("--data", required=True, help="hdf5 dataset file")
    ap.add_argument("--out", required=True, help="output run directory")
    ap.add_argument("--dmax", type=float, default=5.0)
    ap.add_argument("--size-latent", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--restart-from-epoch", type=int, default=0)
    args = ap.parse_args()

    from sdf_nmpc_tpu.data.h5 import train_dataset_from_h5
    from sdf_nmpc_tpu.training import VaeTrainConfig, train_vae

    (train_ds, valid_ds), metadata = train_dataset_from_h5(
        args.data_dir, args.data, args.dmax, train_valid_ratio=0.9,
        vae=True, col_map=True,
    )

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    cfg = VaeTrainConfig(
        size_latent=args.size_latent, nb_epochs=args.epochs, batch_size=args.batch_size
    )
    _, _, history = train_vae(
        train_ds, valid_ds, metadata, out, cfg=cfg,
        restart_from_epoch=args.restart_from_epoch,
    )
    (out / "history.json").write_text(json.dumps(history))


if __name__ == "__main__":
    main()
