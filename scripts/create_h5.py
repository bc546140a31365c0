#!/usr/bin/env python
"""Merge several HDF5 image sets into one train/test dataset
(reference scripts/neural_nets/create_h5.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sources", nargs="+", help="input hdf5 files")
    ap.add_argument("--out", required=True)
    ap.add_argument("--ratio-test", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from sdf_nmpc_tpu.data.h5 import merge_h5

    out = merge_h5(args.sources, args.out, ratio_test=args.ratio_test, seed=args.seed)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
