#!/usr/bin/env python
"""On-HARDWARE accuracy check: the production f32 solve on the real TPU vs a
CPU f64/40-iter reference on identical scenarios.

CPU-only test suites cannot see TPU-specific numerics (the MXU lowers f32
matmuls to reduced-precision passes by default), so this script closes the
loop on the BASELINE accuracy contract on the actual chip:

    python scripts/accuracy_tpu.py ref      # CPU f64 reference -> tests/golden/
    python scripts/accuracy_tpu.py tpu      # TPU f32 run, compare
    python scripts/accuracy_tpu.py ref3     # config3 render->encode->solve f64 oracle
    python scripts/accuracy_tpu.py tpu3     # config3 f32 on-hw run, compare

The same workload runs inside ``python bench.py`` (u0_max_err in the bench
JSON artifact); the logic lives in sdf_nmpc_tpu/utils/accuracy.py.  The
config3 modes put the trained VAE encoder INSIDE the contract (VERDICT r4
item 4, BASELINE config 3).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "tpu"
    import jax

    if mode in ("ref", "ref3"):
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from sdf_nmpc_tpu.utils import accuracy

    if mode == "ref":
        path = accuracy.save_reference()
        print(f"reference u0 saved -> {path}")
    elif mode == "ref3":
        path = accuracy.save_config3_reference()
        print(f"config3 render->encode->solve oracle saved -> {path}")
    elif mode == "tpu3":
        out = accuracy.check_config3_accuracy()
        dev = jax.devices()[0]
        print(f"# device: {dev.device_kind} ({dev.platform})")
        print(
            "config3 (render -> trained-VAE encode -> solve) u0 error vs "
            f"CPU f64/40-iter oracle ({out['n_scen']} scenes):"
        )
        print(f"  max   {out['u0_max_err']:.2e}")
        print(f"  mean  {out['u0_mean_err']:.2e}")
        print(f"  status ok {out['n_ok']}/{out['n_scen']}")
    else:
        out = accuracy.check_accuracy()
        dev = jax.devices()[0]
        print(f"# device: {dev.device_kind} ({dev.platform})")
        print(
            f"on-hardware u0 error vs CPU f64/40-iter ({out['n_scen']} cold starts):"
        )
        print(f"  max   {out['u0_max_err']:.2e}")
        print(f"  mean  {out['u0_mean_err']:.2e}")
        print(f"  status ok {out['n_ok']}/{out['n_scen']}")


if __name__ == "__main__":
    main()
