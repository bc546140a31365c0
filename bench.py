"""Benchmark: batched neural-SDF NMPC throughput on one TPU chip.

Workload = BASELINE config 4: B concurrent SDF-NMPC scenarios (randomized
starts/latents), att model, N=20 horizon, neural SDF (4x256 MLP, 128-d latent)
as a soft state constraint, FoV constraints on, one SQP-RTI iteration per
solve (the reference's per-tick unit of work, ocp.py:109-110).

Metric: NMPC solves/s/chip.  vs_baseline: the reference's quantitative contract
is one solve per 10 ms control period on its embedded CPU (BASELINE.md:15,
config/default.yaml:55) == 100 solves/s; vs_baseline = solves_per_s / 100.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 8192))
ITERS = int(os.environ.get("BENCH_ITERS", 20))
BASELINE_SOLVES_PER_S = 100.0  # reference: 10 ms RT budget per solve


def main():
    import jax

    from __graft_entry__ import _build

    dev = jax.devices()[0]
    print(f"# device: {dev.device_kind} ({dev.platform})", file=sys.stderr)

    solver_over = json.loads(os.environ.get("BENCH_SOLVER_OVERRIDES", "null"))
    overrides = dict(solver=solver_over) if solver_over else None
    cfg, ocp, step, states, inputs = _build(cfg_overrides=overrides, batch=BATCH)
    vstep = jax.jit(jax.vmap(step))

    # steady-state ticks use the STEADY iteration budget (cfg.solver.
    # qp_iters_steady, the third phase of the controller's cold/warm/steady
    # schedule, each floor measured by the fixed-state replay testbed) — the
    # acados analogue is HPIPM early-exiting under primal warm start.  The
    # first (cold-start) solve keeps the full cold budget; the accuracy block
    # below gates all three budgets on this same hardware.
    from sdf_nmpc_tpu.solver import make_rti_step

    vstep_warm = jax.jit(jax.vmap(make_rti_step(ocp, cfg, with_evals=False, budget="steady")))

    # warmup / compile
    t0 = time.perf_counter()
    res = vstep(states, inputs)
    res.u0.block_until_ready()
    res_w = vstep_warm(res.state, inputs)
    res_w.u0.block_until_ready()
    print(f"# compile+first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    n_ok = int(np.asarray(res.status == 0).sum())
    assert n_ok == BATCH, f"only {n_ok}/{BATCH} scenarios solved OK"

    # steady state: iterate the warm-started solve (the per-tick work unit).
    # Timing methodology (docs/performance.md): through the axon tunnel,
    # neither block_until_ready nor per-iteration scalar fetches reliably
    # measure per-step time (the tunnel pipelines/acknowledges early).  The
    # robust measurement is the WALL-CLOCK SPAN of ITERS data-dependent steps
    # ended by one scalar fetch (the chain forbids skipping work), minus one
    # measured fetch RTT, divided by ITERS.
    float(np.asarray(res.u0[0, 0]))  # drain warmup
    t0 = time.perf_counter()
    float(np.asarray(res.u0[0, 0]))
    rtt = time.perf_counter() - t0  # pure fetch cost of an already-computed value
    states = res.state
    t0 = time.perf_counter()
    for _ in range(ITERS):
        res = vstep_warm(states, inputs)
        states = res.state
    float(np.asarray(res.u0[0, 0]))
    t_total = time.perf_counter() - t0

    t_step = max(1e-9, t_total - rtt) / ITERS
    solves_per_s = BATCH / t_step
    print(
        f"# mean step {t_step * 1e3:.2f} ms for {BATCH} solves "
        f"({ITERS} chained steps in {t_total:.2f} s, rtt {rtt * 1e3:.0f} ms)",
        file=sys.stderr,
    )

    # on-hardware accuracy next to the throughput (the BASELINE <=1e-3
    # contract, VERDICT r1 item 2): 32 hard cold starts vs the checked-in CPU
    # f64/40-iter reference.  A faster-but-wrong solver fails here.
    record = {
        "metric": "nmpc_solves_per_s_chip",
        "value": round(solves_per_s, 1),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
    }
    if os.environ.get("BENCH_SKIP_ACCURACY", "") != "1":
        from sdf_nmpc_tpu.utils import accuracy

        acc = accuracy.check_accuracy()
        print(
            f"# accuracy: u0 max {acc['u0_max_err']:.2e} mean "
            f"{acc['u0_mean_err']:.2e} ({acc['n_ok']}/{acc['n_scen']} ok)",
            file=sys.stderr,
        )
        record["u0_max_err"] = round(acc["u0_max_err"], 8)
        record["u0_mean_err"] = round(acc["u0_mean_err"], 8)
        # warm- and steady-budget accuracy on the same hardware (the
        # throughput loop above runs the steady budget; the controller serves
        # ticks 1..steady_after with the warm budget): fixed-state replay vs
        # the f64 golden states, each budget gated on the ticks it serves
        sa = int(cfg.solver.get("steady_after", 3))
        warm = accuracy.check_warm_accuracy(budget="warm")
        steady = accuracy.check_warm_accuracy(budget="steady")
        warm_max = max(warm["per_tick_max"][1 : sa + 1])
        steady_max = max(steady["per_tick_max"][sa + 1 :])
        print(
            f"# warm accuracy (ticks 1..{sa}): u0 max {warm_max:.2e}; "
            f"steady (ticks {sa + 1}+): u0 max {steady_max:.2e} "
            f"({warm['n_ok']}+{steady['n_ok']} ok)",
            file=sys.stderr,
        )
        record["u0_warm_max_err"] = round(warm_max, 8)
        record["u0_steady_max_err"] = round(steady_max, 8)
        record["accuracy_ok"] = bool(
            acc["u0_max_err"] <= 1e-3
            and warm_max <= 1e-3
            and steady_max <= 1e-3
            and acc["n_ok"] == acc["n_scen"]
            and warm["n_ok"] == warm["n_solves"]
            and steady["n_ok"] == steady["n_solves"]
        )
    print(json.dumps(record))


if __name__ == "__main__":
    main()
