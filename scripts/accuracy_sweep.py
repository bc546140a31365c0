#!/usr/bin/env python
"""Joint solver-knob sweep against the canonical accuracy workload.

Runs the 32 cold-start scenarios AND the fixed-state warm-tick replay
(sdf_nmpc_tpu/utils/accuracy.py, production 4x256/128-latent net) for a list
of cfg.solver override dicts, printing one table row per config:

    python scripts/accuracy_sweep.py                      # default grid
    python scripts/accuracy_sweep.py '[{"qp_ratio_cap": 3e6}]'
    ACC_SWEEP_CPU=1 python scripts/accuracy_sweep.py ...  # exact-f32 CPU run

On CPU the f32 arithmetic is exact (no MXU pass modes), isolating the
algorithmic knobs; on the TPU the same sweep measures the shipped contract
(BASELINE.md:33, u0 max <= 1e-3 cold and warm).  The per-config numbers feed
docs/performance.md and pick config/default.yaml's qp_* defaults.
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

DEFAULT_GRID = [
    {},  # shipped defaults
    {"qp_ratio_cap": 3e6},
    {"qp_ratio_cap": 1e7},
    {"qp_ratio_cap": 3e6, "qp_stiff_iters": 8},
    {"qp_stiff_k": 16, "qp_ratio_cap": 3e6},
]


def main():
    import jax

    if os.environ.get("ACC_SWEEP_CPU", "") == "1":
        jax.config.update("jax_platforms", "cpu")

    from sdf_nmpc_tpu.utils import accuracy

    grid = json.loads(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_GRID
    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})")
    print(f"# workload: {accuracy.N_SCEN} cold starts + warm replay, "
          f"net {accuracy.LAYERS} latent {accuracy.LATENT}")
    print(f"{'overrides':58s} {'cold max':>9s} {'cold mean':>9s} "
          f"{'warm max':>9s} {'tick0 max':>9s} {'ok':>7s} {'s':>6s}")
    for over in grid:
        t0 = time.perf_counter()
        import numpy as np

        ref = np.load(accuracy.REF_NPZ)["u0"]
        u0, status = accuracy.solve_batch(over or None)
        err = np.abs(u0 - ref).max(axis=1)
        warm = accuracy.check_warm_accuracy(over or None)
        dt = time.perf_counter() - t0
        tag = json.dumps(over, separators=(",", ":")) if over else "(defaults)"
        ok = f"{int((status == 0).sum())}+{warm['n_ok']}"
        print(
            f"{tag:58s} {err.max():9.2e} {err.mean():9.2e} "
            f"{warm['u0_max_err']:9.2e} {warm['u0_max_err_tick0']:9.2e} "
            f"{ok:>7s} {dt:6.0f}"
        )
        per_tick = " ".join(f"{v:.1e}" for v in warm["per_tick_max"])
        print(f"  per-tick max (tick0=cold-state replay): {per_tick}")


if __name__ == "__main__":
    main()
