#!/usr/bin/env python
"""The five BASELINE benchmark configurations (BASELINE.md / BASELINE.json):

  1. single waypoint NMPC, obstacle-free (SDF off)
  2. single solve with neural-SDF collision constraint, fixed latent
  3. full perception-to-control: depth image -> VAE encode -> SDF-NMPC
  4. batched 4096-scenario SDF-NMPC on one chip (randomized starts/latents)
  5. scenario sweep sharded over all available devices (multi-host when run
     under jax.distributed; on one host it exercises the same sharded path)

Each prints median latency / throughput.  `python benchmarks/run.py 1 2 4` to
select configs.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPEAT = 30


def _block(x):
    import jax

    leaves = jax.tree.leaves(x)
    for leaf in leaves:
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
            return


def _timeit(fn, *args, repeat=REPEAT):
    out = fn(*args)
    _block(out)
    ts = []
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn(*args)
        _block(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), float(np.percentile(ts, 99)), out


def setup(enable_sdf=True, latent=128, batch=1, solver=None):
    from __graft_entry__ import _build

    overrides = {} if enable_sdf else dict(flags=dict(enable_sdf=False))
    if solver:
        overrides = dict(overrides, solver=solver)
    return _build(cfg_overrides=overrides or None, latent=latent, batch=batch)


def config1():
    """Single obstacle-free solve (reference acados CPU workload)."""
    import jax

    cfg, ocp, step, states, inputs = setup(enable_sdf=False, batch=1)
    one = jax.jit(step)
    st = jax.tree.map(lambda x: x[0], states)
    inp = jax.tree.map(lambda x: x[0], inputs)
    med, p99, out = _timeit(one, st, inp)
    print(
        f"config 1 (single, SDF off):      median {med * 1e3:7.3f} ms  "
        f"p99 {p99 * 1e3:7.3f} ms  (budget 10 ms)"
    )


def config1_ondevice(k=100):
    """On-device single-solve latency: chain k sequential RTI steps inside ONE
    jitted program (removes host/tunnel dispatch from the measurement)."""
    import jax

    # B=1 is serial-latency bound: XLA's native Cholesky beats the
    # batch-first custom factorization there (cfg.solver.chol_impl)
    cfg, ocp, step, states, inputs = setup(
        enable_sdf=True, batch=1, solver=dict(chol_impl="xla")
    )
    st = jax.tree.map(lambda x: x[0], states)
    inp = jax.tree.map(lambda x: x[0], inputs)

    @jax.jit
    def chain(st):
        def body(st, _):
            res = step(st, inp)
            return res.state, res.u0

        stN, u0s = jax.lax.scan(body, st, None, length=k)
        return u0s

    med, p99, out = _timeit(chain, st, repeat=10)
    print(
        f"config 1b (on-device chain):     {med / k * 1e3:7.3f} ms/solve  "
        f"({k} chained solves in {med * 1e3:.1f} ms; budget 10 ms)"
    )


def config2():
    """Single solve with the neural SDF in the constraints, fixed latent."""
    import jax

    cfg, ocp, step, states, inputs = setup(enable_sdf=True, batch=1)
    one = jax.jit(step)
    st = jax.tree.map(lambda x: x[0], states)
    inp = jax.tree.map(lambda x: x[0], inputs)
    med, p99, out = _timeit(one, st, inp)
    print(
        f"config 2 (single, neural SDF):   median {med * 1e3:7.3f} ms  "
        f"p99 {p99 * 1e3:7.3f} ms  (budget 10 ms)"
    )


def config3():
    """Perception-to-control: encode a depth image then solve."""
    import jax
    import jax.numpy as jnp

    from sdf_nmpc_tpu.nn import Encoder

    cfg, ocp, step, states, inputs = setup(enable_sdf=True, batch=1)
    H, W = cfg.sensor.shape_imgs[-2:]
    enc = Encoder(1, cfg.nn.size_latent, dropout_rate=0.0, batchnorm=False)
    enc_vars = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, 1)))
    img = jnp.asarray(np.random.default_rng(0).uniform(size=(1, H, W, 1)), jnp.float32)

    latent_start = ocp.layout.latent_start
    one = jax.jit(step)
    st = jax.tree.map(lambda x: x[0], states)
    inp = jax.tree.map(lambda x: x[0], inputs)

    @jax.jit
    def encode_and_solve(img, st, inp):
        latent = enc.apply(enc_vars, img)[0]
        p = inp.p.at[:, latent_start:].set(latent[None, :])
        return one(st, inp._replace(p=p))

    med, p99, out = _timeit(encode_and_solve, img, st, inp)
    print(
        f"config 3 (encode + solve):       median {med * 1e3:7.3f} ms  "
        f"p99 {p99 * 1e3:7.3f} ms  (budget 10 ms)"
    )


def config4(batch=4096):
    """Batched scenario solve on one chip."""
    import jax

    cfg, ocp, step, states, inputs = setup(enable_sdf=True, batch=batch)
    vstep = jax.jit(jax.vmap(step))
    med, p99, out = _timeit(vstep, states, inputs, repeat=10)
    ok = int(np.asarray(out.status == 0).sum())
    print(
        f"config 4 (batch {batch}):          median {med * 1e3:7.1f} ms  "
        f"-> {batch / med:8.0f} solves/s/chip  (ok {ok}/{batch})"
    )


def config5(per_device=512):
    """Sharded sweep over all devices (multi-host via jax.distributed)."""
    import jax

    from sdf_nmpc_tpu.parallel import make_batched_step, make_mesh, shard_batch

    n_dev = len(jax.devices())
    batch = per_device * n_dev
    cfg, ocp, step, states, inputs = setup(enable_sdf=True, batch=batch)
    mesh = make_mesh()
    bstep = make_batched_step(ocp, cfg, mesh=mesh)
    states = shard_batch(states, mesh)
    inputs = shard_batch(inputs, mesh)
    med, p99, (results, stats) = _timeit(bstep, states, inputs, repeat=10)
    print(
        f"config 5 (sharded, {n_dev} dev):     median {med * 1e3:7.1f} ms  "
        f"-> {batch / med:8.0f} solves/s aggregate  "
        f"(ok {int(stats.n_ok)}/{batch})"
    )


def main():
    picks = [int(a) for a in sys.argv[1:]] or [1, 2, 3, 4, 5]
    fns = {1: config1, 2: config2, 3: config3, 4: config4, 5: config5, 6: config1_ondevice}
    import jax

    print(f"# device(s): {[str(d) for d in jax.devices()][:4]} ...")
    for p in picks:
        fns[p]()


if __name__ == "__main__":
    main()
