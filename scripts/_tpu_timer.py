"""Fetch-synchronized timing for TPU microbenches through the dev tunnel.

`block_until_ready` through the axon tunnel backend does NOT reliably await
execution (measured: a 32-step chained matmul program "completes" in 0.2 ms,
while fetching one scalar of its result takes the true ~900 ms).  The only
trustworthy sync is a device->host fetch of a SMALL piece of the result.

Pattern: run the op chained K times inside one jitted program (output feeds
the next input, so the device cannot overlap or skip), fetch one scalar,
subtract the measured RTT, divide by K.
"""

from __future__ import annotations

import time

import numpy as np


def _fetch(out):
    """Fetch one scalar from (the first array leaf of) out — the sync point."""
    import jax

    leaves = jax.tree_util.tree_leaves(out)
    x = leaves[0]
    # index down to a scalar before transferring (avoid pulling big buffers
    # through the ~MB/s tunnel)
    idx = tuple(0 for _ in x.shape)
    return float(np.asarray(x[idx]))


def measure_rtt(reps: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    one = jnp.float32(1.0)
    f = jax.jit(lambda x: x + 1.0)
    _fetch(f(one))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(f(one))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_chained(tag, body, mix, args, k: int = 16, reps: int = 5, rtt=None):
    """Median per-op seconds of `body` chained k times.

    body(*args) -> out; mix(out, *args) -> new args (must make every chained
    iteration data-dependent on the previous one).
    """
    import jax

    if rtt is None:
        rtt = measure_rtt()

    def fn(*a):
        def it(i, a_):
            return mix(body(*a_), *a_)

        return jax.lax.fori_loop(0, k, it, a)

    f = jax.jit(fn)
    _fetch(f(*args))  # compile + first run
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(f(*args))
        ts.append(time.perf_counter() - t0)
    t = max(0.0, float(np.median(ts)) - rtt) / k
    if tag:
        print(f"{tag:46s} {t * 1e3:8.3f} ms/op   (x{k}, rtt {rtt * 1e3:.1f} ms)")
    return t


def time_steps(vstep, states, inputs, iters: int = 12, state_of=None):
    """Per-step seconds of a warm-started step function, span method:
    `iters` data-dependent steps, one final scalar fetch, minus RTT.

    state_of(result) -> next states (default: result.state).
    """
    import time as _time

    if state_of is None:
        state_of = lambda r: r.state
    res = vstep(states, inputs)
    _fetch(res.u0)
    rtt = measure_rtt()
    states = state_of(res)
    t0 = _time.perf_counter()
    for _ in range(iters):
        res = vstep(states, inputs)
        states = state_of(res)
    _fetch(res.u0)
    return max(1e-9, (_time.perf_counter() - t0) - rtt) / iters
