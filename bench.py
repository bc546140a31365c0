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

    # warmup / compile
    t0 = time.perf_counter()
    res = vstep(states, inputs)
    res.u0.block_until_ready()
    print(f"# compile+first step: {time.perf_counter() - t0:.1f}s", file=sys.stderr)
    n_ok = int(np.asarray(res.status == 0).sum())
    assert n_ok == BATCH, f"only {n_ok}/{BATCH} scenarios solved OK"

    # steady state: iterate the warm-started solve (the per-tick work unit)
    states = res.state
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        res = vstep(states, inputs)
        res.u0.block_until_ready()
        times.append(time.perf_counter() - t0)
        states = res.state

    t_step = float(np.median(times))
    solves_per_s = BATCH / t_step
    print(
        f"# median step {t_step * 1e3:.2f} ms for {BATCH} solves "
        f"(p99 step {np.percentile(times, 99) * 1e3:.2f} ms)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "nmpc_solves_per_s_chip",
                "value": round(solves_per_s, 1),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
