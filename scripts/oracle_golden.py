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
    from sdf_nmpc_tpu.utils import accuracy

    return accuracy.sdf_net()[1]  # trained checkpoint when present, else seed-0


def _sdf_kw():
    """NeuralDF hyperparameter VALUES for the oracle (embed mode, w0, freqs)
    — taken from the workload's module definition, not its code."""
    from sdf_nmpc_tpu.utils import accuracy

    mod = accuracy.sdf_net()[0]
    return dict(sdf_proj=mod.embed, sdf_w0=mod.w0, sdf_nb_freqs=mod.nb_freqs)


def _oracle_u0(variant, n, lm_convention="acados", verbose=True, model=None,
               N=None):
    import oracle_rti as orc

    from sdf_nmpc_tpu.utils import accuracy

    cfg, ocp, layout = accuracy.build_setup(variant=variant, model=model, N=N)
    scen = accuracy.build_scenarios(cfg, ocp, layout)[:n]
    kw = {}
    if variant == "recfeas":
        kw["bdist_coeffs"] = accuracy.synthetic_bdist_coeffs(cfg)
    if variant != "nosdf":
        kw.update(_sdf_kw())
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
        if GOLD.exists():  # incremental: keep keys not regenerated this run
            out.update({k: v for k, v in np.load(GOLD).items()})
        for key, variant, model, n in (
            ("sdf", "sdf", None, 32),
            ("nosdf", "nosdf", None, 32),
            ("recfeas", "recfeas", None, 8),
            # second independently-checked model family (VERDICT r2 item 3):
            # att_tau = first-order attitude lag + euler-rate map
            ("tau", "sdf", "att_tau", 8),
            # third family (VERDICT r3 item 4): per-rotor full rigid-body
            # dynamics + GTMRP allocation (reference quad_props.py:41-48)
            ("props", "sdf", "props", 8),
            # remaining families (round 4): all six quad models oracle-covered
            ("rates", "sdf", "rates", 8),
            ("wrench", "sdf", "wrench", 8),
            ("acc", "sdf", "acc", 8),
        ):
            u0s, opts = _oracle_u0(variant, n, model=model)
            out[f"{key}_u0"] = u0s
            out[f"{key}_opt"] = opts
            print(f"{key}: {n} scenarios, worst qp optimality {opts.max():.1e}")
        for key, variant, N, n in (("n40", "sdf", 40, 8),):
            u0s, opts = _oracle_u0(variant, n, N=N)
            out[f"{key}_u0"] = u0s
            out[f"{key}_opt"] = opts
            print(f"{key}: {n} scenarios, worst qp optimality {opts.max():.1e}")
        GOLD.parent.mkdir(parents=True, exist_ok=True)
        np.savez(GOLD, **out)
        print(f"oracle goldens -> {GOLD}")
        return

    if mode == "n40":
        # Riccati-regime contract (VERDICT r3 item 5): at N=40 the 'auto'
        # backend selects qp_riccati; these goldens give that regime the same
        # independent-oracle anchor the N=20 condensed path has.
        out = {k: v for k, v in np.load(GOLD).items()}
        u0s, opts = _oracle_u0("sdf", 8, N=40)
        out["n40_u0"], out["n40_opt"] = u0s, opts
        np.savez(GOLD, **out)
        print(f"n40: worst qp optimality {opts.max():.1e} -> {GOLD}")
        return

    if mode in ("tau", "props", "rates", "wrench", "acc"):
        # regenerate only one model family's keys (cheap incremental add)
        out = {k: v for k, v in np.load(GOLD).items()}
        u0s, opts = _oracle_u0("sdf", 8, model={"tau": "att_tau"}.get(mode, mode))
        out[f"{mode}_u0"], out[f"{mode}_opt"] = u0s, opts
        np.savez(GOLD, **out)
        print(f"{mode}: worst qp optimality {opts.max():.1e} -> {GOLD}")
        return

    if mode == "warm":
        # oracle ticks from the CAPTURED warm states (tests/golden/
        # warm_ref*.npz): feed each (X, U, x0) into rti_tick and pin the
        # oracle's u0 — closes the last self-referential golden (the warm
        # u0_ref was previously validated only against the framework itself).
        # Optional second arg: model family (att_tau/props/rates/wrench/acc)
        # -> oracle_warm_u0_<model>.npz from warm_ref_<model>.npz; the
        # default att keeps the original fixture names and the denser
        # 8-scenario x 3-tick grid (advisor r4: warm coverage was att-only).
        import oracle_rti as orc

        model = sys.argv[2] if len(sys.argv) > 2 else None
        cap = np.load(accuracy.warm_npz_path(model))
        cfg, ocp, layout = accuracy.build_setup(model=model)
        scen = accuracy.build_scenarios(cfg, ocp, layout)
        oc = orc.build_oracle_ocp(cfg, flax_params=_flax_params(), sdf_max_df=1.0,
                                  **_sdf_kw())
        if model in (None, "att"):
            scen_idx = list(range(0, accuracy.WARM_SCEN, 2))  # 8 of 16
            tick_idx = [1, 4, 7]  # early-warm, mid, steady
            out_npz = GOLD.parent / "oracle_warm_u0.npz"
        else:
            scen_idx = list(range(0, accuracy.WARM_SCEN, 4))  # 4 of 16
            tick_idx = [1, 7]  # early-warm, steady
            out_npz = GOLD.parent / f"oracle_warm_u0_{model}.npz"
        u0 = np.zeros((len(scen_idx), len(tick_idx), 4))
        gap = np.zeros((len(scen_idx), len(tick_idx)))
        for a, s in enumerate(scen_idx):
            _, p, yr, W = scen[s]
            for b, t in enumerate(tick_idx):
                r = orc.rti_tick(
                    oc, cap["x0"][s, t], p, yr, W, lm_convention="acados",
                    X=cap["X"][s, t], U=cap["U"][s, t],
                )
                u0[a, b] = r["u0"]
                gap[a, b] = np.abs(r["u0"] - cap["u0_ref"][s, t]).max()
                print(f"  scen {s} tick {t}: oracle-vs-capture {gap[a, b]:.2e}",
                      flush=True)
        np.savez(
            out_npz,
            u0=u0, scen_idx=np.asarray(scen_idx), tick_idx=np.asarray(tick_idx),
        )
        print(f"worst oracle-vs-capture gap {gap.max():.2e} -> {out_npz.name}")
        return

    raise SystemExit(f"unknown mode {mode!r}")


if __name__ == "__main__":
    main()
