#!/usr/bin/env python
"""Fixed-state warm-tick accuracy testbed (VERDICT r1 items 6 + 9b).

Warm-started RTI ticks converge in fewer QP iterations than cold starts; this
testbed measures the warm iteration floor on comparable footing by replaying
CAPTURED f64 warm states through each variant (see
sdf_nmpc_tpu/utils/accuracy.py).

    python scripts/warm_testbed.py ref              # CPU f64 capture -> tests/golden/
    python scripts/warm_testbed.py sweep            # replay budgets on this backend
    python scripts/warm_testbed.py check [iters]    # one budget (default cfg)
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "sweep"
    import jax

    if mode == "ref":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)

    from sdf_nmpc_tpu.utils import accuracy

    if mode == "ref":
        # optional second arg: model family (att_tau/props/rates/wrench/acc)
        # -> tests/golden/warm_ref_<model>.npz for the per-family warm oracle
        model = sys.argv[2] if len(sys.argv) > 2 else None
        path = accuracy.save_warm_reference(model)
        print(f"warm-state reference saved -> {path}")
        return

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})")
    if mode == "check":
        over = None
        if len(sys.argv) > 2:
            over = dict(qp_iters_warm=int(sys.argv[2]))
        out = accuracy.check_warm_accuracy(over)
        print(json.dumps(out))
        return

    # sweep warm budgets; stiff split scales with the total (same warm/stiff
    # ratio as the cold 11/8 schedule, 8-aligned where possible)
    print("warm budget sweep (replayed fixed states, err vs f64/40-iter):")
    for iters, stiff in [(19, 8), (16, 8), (14, 8), (12, 8), (12, 4), (10, 4), (8, 4), (8, 8), (6, 4)]:
        out = accuracy.check_warm_accuracy(
            dict(qp_iters_warm=iters, qp_stiff_iters_warm=stiff)
        )
        print(
            f"  iters={iters:2d} stiff={stiff}  max {out['u0_max_err']:.2e}  "
            f"mean {out['u0_mean_err']:.2e}  ok {out['n_ok']}/{out['n_ticks']}"
        )


if __name__ == "__main__":
    main()
