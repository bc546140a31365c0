#!/usr/bin/env python
"""Braking-distance analysis CLI (reference scripts/find_amax.py).

Modes: grid (compute a_max/bdist over a velocity ball, vectorized bisection on
device instead of per-velocity IPOPT), min_acc, poly_fit (closed-form least
squares), poly_eval, mlp_fit, mlp_eval.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse
import os
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", help="config yaml path (or 'default')")
    ap.add_argument("mode", choices=["grid", "min_acc", "poly_fit", "poly_eval", "mlp_fit", "mlp_eval"])
    ap.add_argument("--vmax", type=float, default=3.0)
    ap.add_argument("--step", type=float, default=0.05)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--out-dir", default=None)
    args = ap.parse_args()

    from sdf_nmpc_tpu import cache_dir
    from sdf_nmpc_tpu.config import default_config, load_config
    from sdf_nmpc_tpu.math import polynomial_3variate
    from sdf_nmpc_tpu.theory import (
        braking_grid, eval_surrogate, fit_mlp, fit_poly, min_braking_accel,
    )

    cfg = default_config() if args.config == "default" else load_config(args.config)
    path = Path(args.out_dir or (cache_dir() / "braking_dist" / cfg.name))
    path.mkdir(parents=True, exist_ok=True)
    tag = f"{args.vmax:g}_{args.step:g}"

    if args.mode == "grid":
        vel, bdist, amax = braking_grid(cfg, args.vmax, args.step)
        np.save(path / f"{tag}_vel.npy", vel)
        np.save(path / f"{tag}_bdist.npy", bdist)
        print(f"grid: {len(vel)} velocities; a_min = {amax.min():.3f}, saved to {path}")

    elif args.mode == "min_acc":
        vel = np.load(path / f"{tag}_vel.npy")
        bdist = np.load(path / f"{tag}_bdist.npy")
        print(f"amin: {min_braking_accel(vel, bdist):.4f}  (feeds cfg.mpc.stability.a_b_min)")

    elif args.mode == "poly_fit":
        vel = np.load(path / f"{tag}_vel.npy")
        bdist = np.load(path / f"{tag}_bdist.npy")
        coeffs = fit_poly(vel, bdist, degree=args.degree)
        out = path / f"bdist_poly_deg{args.degree}_{args.vmax:g}.npy"
        np.save(out, coeffs)
        print(f"saved {len(coeffs)} coefficients to {out}")

    elif args.mode == "poly_eval":
        vel = np.load(path / f"{tag}_vel.npy")
        bdist = np.load(path / f"{tag}_bdist.npy")
        coeffs = np.load(path / f"bdist_poly_deg{args.degree}_{args.vmax:g}.npy")
        poly, _ = polynomial_3variate(args.degree, coeffs)
        rmse, max_err = eval_surrogate(poly, vel, bdist)
        print(f"poly deg {args.degree}: rmse {rmse:.4f}, max error {max_err:.4f}")

    elif args.mode == "mlp_fit":
        vel = np.load(path / f"{tag}_vel.npy")
        bdist = np.load(path / f"{tag}_bdist.npy")
        module, params, loss = fit_mlp(vel, bdist)
        from flax import serialization

        (path / "bdist_mlp.msgpack").write_bytes(serialization.to_bytes(params))
        print(f"mlp fit final loss {loss:.6f}, saved to {path / 'bdist_mlp.msgpack'}")

    elif args.mode == "mlp_eval":
        import jax.numpy as jnp
        from flax import serialization

        from sdf_nmpc_tpu.nn.mlp import Mlp

        vel = np.load(path / f"{tag}_vel.npy")
        bdist = np.load(path / f"{tag}_bdist.npy")
        module = Mlp(size_out=1, layer_sizes=[20, 20, 20], inner_act=jnp.tanh)
        template = module.init(__import__("jax").random.PRNGKey(0), jnp.zeros(3))
        params = serialization.from_bytes(template, (path / "bdist_mlp.msgpack").read_bytes())
        rmse, max_err = eval_surrogate(lambda v: module.apply(params, v), vel, bdist)
        print(f"mlp: rmse {rmse:.4f}, max error {max_err:.4f}")


if __name__ == "__main__":
    main()
