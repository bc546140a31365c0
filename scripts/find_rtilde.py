#!/usr/bin/env python
"""Compute the stability terminal-cost constant r-tilde
(reference scripts/find_rtilde.py)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="default", help="config yaml path or 'default'")
    args = ap.parse_args()

    from sdf_nmpc_tpu.config import default_config, load_config
    from sdf_nmpc_tpu.theory import get_r_tilde_max

    cfg = default_config() if args.config == "default" else load_config(args.config)
    print(f"r_tilde_max = {get_r_tilde_max(cfg):.6f}")


if __name__ == "__main__":
    main()
