#!/usr/bin/env python
"""Parallel regeneration of the independent-oracle goldens.

scripts/oracle_golden.py is sequential (hours of CPU for the full set: 32 sdf
+ 32 nosdf + 8 recfeas + 8 each tau/props/rates/wrench/acc + 8 n40 scipy
trust-constr solves).
The scenarios are independent, so this driver shards each variant's scenario
range over worker processes, collects the per-shard npz files, and assembles
tests/golden/oracle_u0.npz in one atomic write.

    python scripts/oracle_golden_par.py            # full set, default workers
    python scripts/oracle_golden_par.py --workers 8
    python scripts/oracle_golden_par.py --only sdf n40

Worker mode (internal): oracle_golden_par.py --shard KEY START END OUT
"""

import argparse
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tests"))

GOLD = Path(__file__).resolve().parents[1] / "tests" / "golden" / "oracle_u0.npz"

# key -> (variant, model, N, n_scenarios)
SPECS = {
    "sdf": ("sdf", None, None, 32),
    "nosdf": ("nosdf", None, None, 32),
    "recfeas": ("recfeas", None, None, 8),
    "tau": ("sdf", "att_tau", None, 8),
    "props": ("sdf", "props", None, 8),
    # remaining families (round 4): reference-dead models the framework wires
    "rates": ("sdf", "rates", None, 8),
    "wrench": ("sdf", "wrench", None, 8),
    "acc": ("sdf", "acc", None, 8),
    "n40": ("sdf", None, 40, 8),
}


def run_shard(key, start, end, out):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import oracle_rti as orc

    from sdf_nmpc_tpu.utils import accuracy

    variant, model, N, _ = SPECS[key]
    cfg, ocp, layout = accuracy.build_setup(variant=variant, model=model, N=N)
    scen = accuracy.build_scenarios(cfg, ocp, layout)[start:end]
    kw = {}
    if variant == "recfeas":
        kw["bdist_coeffs"] = accuracy.synthetic_bdist_coeffs(cfg)
    flax_params = None
    if variant != "nosdf":
        mod, flax_params = accuracy.sdf_net()
        kw.update(sdf_proj=mod.embed, sdf_w0=mod.w0, sdf_nb_freqs=mod.nb_freqs)
    oc = orc.build_oracle_ocp(cfg, flax_params=flax_params, sdf_max_df=1.0, **kw)
    u0s, opts = [], []
    for i, (x0, p, yr, W) in enumerate(scen):
        t0 = time.perf_counter()
        r = orc.rti_tick(oc, x0, p, yr, W, lm_convention="acados")
        u0s.append(r["u0"])
        opts.append(r["qp_optimality"])
        print(f"  {key}[{start + i}]: opt {r['qp_optimality']:.1e} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    np.savez(out, u0=np.asarray(u0s), opt=np.asarray(opts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", type=int, default=max(4, (os.cpu_count() or 8) // 4))
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--shard", nargs=4, default=None)
    args = ap.parse_args()

    if args.shard:
        key, start, end, out = args.shard
        run_shard(key, int(start), int(end), out)
        return

    keys = args.only or list(SPECS)
    tmpdir = Path(tempfile.mkdtemp(prefix="oracle_golden_"))
    # shard plan: split the 32-scenario sets into 8-scenario shards
    shards = []
    for key in keys:
        n = SPECS[key][3]
        step = 8
        for s in range(0, n, step):
            shards.append((key, s, min(s + step, n)))
    # longest first so the tail is short
    shards.sort(key=lambda t: -(t[2] - t[1]))

    procs = {}
    pending = list(shards)
    results = {}

    def launch(shard):
        key, s, e = shard
        out = tmpdir / f"{key}_{s}_{e}.npz"
        p = subprocess.Popen(
            [sys.executable, __file__, "--shard", key, str(s), str(e), str(out)],
        )
        procs[p.pid] = (p, shard, out)

    t0 = time.time()
    while pending or procs:
        while pending and len(procs) < args.workers:
            launch(pending.pop(0))
        time.sleep(5)
        for pid in list(procs):
            p, shard, out = procs[pid]
            rc = p.poll()
            if rc is None:
                continue
            del procs[pid]
            if rc != 0:
                raise SystemExit(f"shard {shard} failed rc={rc}")
            results[shard] = out
            print(f"shard {shard} done ({time.time() - t0:.0f}s elapsed)", flush=True)

    out = {}
    if GOLD.exists():  # keep keys not regenerated this run
        out.update({k: v for k, v in np.load(GOLD).items()})
    for key in keys:
        n = SPECS[key][3]
        u0s, opts = [], []
        for s in range(0, n, 8):
            e = min(s + 8, n)
            d = np.load(results[(key, s, e)])
            u0s.append(d["u0"])
            opts.append(d["opt"])
        out[f"{key}_u0"] = np.concatenate(u0s)
        out[f"{key}_opt"] = np.concatenate(opts)
        print(f"{key}: {n} scenarios, worst qp optimality "
              f"{out[f'{key}_opt'].max():.1e}")
    GOLD.parent.mkdir(parents=True, exist_ok=True)
    np.savez(GOLD, **out)
    print(f"oracle goldens -> {GOLD} ({time.time() - t0:.0f}s total)")


if __name__ == "__main__":
    main()
