#!/usr/bin/env python
"""Independent-oracle golden fixtures + parity report (VERDICT r1 item 1).

The oracle (tests/oracle_rti.py) re-implements one acados-style RTI tick in
torch/numpy/scipy, sharing no solver code with the framework.  This script

    check [n]    -- run the oracle on the first n accuracy scenarios (default
                    4) under BOTH Levenberg-Marquardt conventions and print
                    u0 gaps vs the framework's f64/40-iter solve.
    ref          -- regenerate tests/golden/oracle_u0.npz: oracle u0 for the
                    32 canonical accuracy scenarios (neural-SDF config,
                    BASELINE config 2 shape), the sdf-off variant (BASELINE
                    config 1), and 8 rec-feas+stability scenarios.

Run on CPU; the oracle is f64 throughout.  History note: the first run of
this oracle exposed that the solver's original LM convention (penalty
centered on the defect-propagated trajectory) deviates from acados' (lm*I on
the sparse-QP step Hessian) by up to 1.4e-1 in cold-start u0 — the framework
was switched to the acados convention (solver/sqp.py LM rows) and all goldens
regenerated.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

GOLD = Path(__file__).resolve().parents[1] / "tests" / "golden" / "oracle_u0.npz"


def _setup(jax):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)


def _flax_params():
    from sdf_nmpc_tpu.nn import init_neural_df
    from sdf_nmpc_tpu.utils import accuracy

    _, p = init_neural_df(
        size_latent=accuracy.LATENT, layer_sizes=list(accuracy.LAYERS), seed=0
    )
    return p


def _oracle_u0(variant, n, lm_convention="acados", verbose=True):
    import oracle_rti as orc

    from sdf_nmpc_tpu.utils import accuracy

    cfg, ocp, layout = accuracy.build_setup(variant=variant)
    scen = accuracy.build_scenarios(cfg, ocp, layout)[:n]
    kw = {}
    if variant == "recfeas":
        kw["bdist_coeffs"] = accuracy.synthetic_bdist_coeffs(cfg)
    oc = orc.build_oracle_ocp(
        cfg,
        flax_params=None if variant == "nosdf" else _flax_params(),
        sdf_max_df=1.0,
        **kw,
    )
    u0s, opts = [], []
    for i, (x0, p, yr, W) in enumerate(scen):
        t0 = time.perf_counter()
        r = orc.rti_tick(oc, x0, p, yr, W, lm_convention=lm_convention)
        u0s.append(r["u0"])
        opts.append(r["qp_optimality"])
        if verbose:
            print(
                f"  {variant} scen {i}: qp opt {r['qp_optimality']:.1e} "
                f"({time.perf_counter() - t0:.1f} s)",
                flush=True,
            )
    return np.asarray(u0s), np.asarray(opts)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    import jax

    _setup(jax)
    from sdf_nmpc_tpu.utils import accuracy

    if mode == "check":
        n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
        u0_fw, status = accuracy.solve_batch(dict(dtype="float64", qp_iters=40))
        assert (status == 0).all()
        ref = np.load(GOLD.parent / "accuracy_ref_u0.npz")["u0"]
        print(f"framework f64 vs checked-in golden: {np.abs(u0_fw - ref).max():.2e}")
        for conv in ("acados", "framework"):
            u0s, opts = _oracle_u0("sdf", n, conv, verbose=False)
            errs = np.abs(u0s - u0_fw[:n]).max(axis=1)
            print(
                f"lm={conv:9s}: u0 max err vs framework-f64 {errs.max():.3e} "
                f"(per-scen {['%.1e' % e for e in errs]}), qp opt {opts.max():.1e}"
            )
        return

    if mode == "ref":
        out = {}
        for variant, n in (("sdf", 32), ("nosdf", 32), ("recfeas", 8)):
            u0s, opts = _oracle_u0(variant, n)
            out[f"{variant}_u0"] = u0s
            out[f"{variant}_opt"] = opts
            print(f"{variant}: {n} scenarios, worst qp optimality {opts.max():.1e}")
        GOLD.parent.mkdir(parents=True, exist_ok=True)
        np.savez(GOLD, **out)
        print(f"oracle goldens -> {GOLD}")
        return

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
