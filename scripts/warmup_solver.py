#!/usr/bin/env python
"""Pre-compile the jitted solver and persist the XLA compilation cache.

The TPU-era analogue of the reference AOT build (scripts/build_solver.py ->
acados C codegen + gcc): there is no codegen here, but the first jit of the
batched SQP program is expensive; warming the persistent compilation cache
(stored under the package cache dir, keyed by config) makes later process
startups fast — the same role the reference's ~/.cache codegen dir played
(SURVEY.md §5.4).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?", default="default")
    ap.add_argument("--batch", type=int, default=4096)
    args = ap.parse_args()

    from sdf_nmpc_tpu import cache_dir

    import jax

    jax.config.update("jax_compilation_cache_dir", str(cache_dir() / "xla_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _build

    t0 = time.time()
    cfg, ocp, step, states, inputs = _build(batch=args.batch)
    vstep = jax.jit(jax.vmap(step))
    res = vstep(states, inputs)
    res.u0.block_until_ready()
    print(f"compiled + first step in {time.time() - t0:.1f}s "
          f"(cache: {cache_dir() / 'xla_cache'})")


if __name__ == "__main__":
    main()
