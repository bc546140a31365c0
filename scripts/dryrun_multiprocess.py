#!/usr/bin/env python
"""Two-process `jax.distributed` dryrun of the multi-host scale-out path.

VERDICT r4 item 5: `parallel.initialize_multihost` (the jax.distributed
coordination path — the DCN analogue, SURVEY.md §5.8) had zero callers and
zero tests; every multi-device artifact ran single-process over
`--xla_force_host_platform_device_count`.  This script exercises the
multi-PROCESS path end-to-end, as close to multi-host as one machine gets:

  parent  : picks a free coordinator port, spawns 2 child processes, each
            pinned to the CPU backend with 4 virtual devices
  child i : initialize_multihost("localhost:<port>", 2, i) -> GLOBAL mesh of
            8 devices spanning both processes; then
              1. one sharded batched NMPC solve (tiny shapes) over the global
                 mesh — stats reductions (n_ok, kkt aggregates) are real
                 cross-process collectives (Gloo on CPU standing in for DCN)
              2. process_allgather(u0) compared against the same batch
                 through a plain single-device vmap in the same process:
                 the multi-process sharded solve must reproduce the
                 single-process numerics (tolerance as in
                 __graft_entry__.dryrun_multichip: f32 refusion drift)
              3. one data-parallel SDF training step: replicated params,
                 scenario-sharded batch, loss/grads reduced across processes;
                 the updated params must match a local single-device step on
                 the full batch

Run:  python scripts/dryrun_multiprocess.py            (parent)
Used by tests/test_multiprocess.py; the checked-in run log lives under
docs/artifacts/ (evidence-chain convention, tests/test_docs_evidence.py).
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

N_PROC = 2
LOCAL_DEVICES = 4
TOL_U0 = 1e-5  # same contract as __graft_entry__.dryrun_multichip
TOL_TRAIN = 1e-5


def _child(process_id: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    sys.path.insert(0, str(REPO))
    from sdf_nmpc_tpu.parallel import initialize_multihost

    # the function under test: joins the distributed runtime and returns the
    # GLOBAL mesh (all devices of all processes)
    mesh = initialize_multihost(
        coordinator_address=f"localhost:{port}",
        num_processes=N_PROC,
        process_id=process_id,
    )
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES, jax.devices()
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    from __graft_entry__ import _build
    from sdf_nmpc_tpu.nn import init_neural_df
    from sdf_nmpc_tpu.parallel import SCENARIO_AXIS, make_batched_step
    from sdf_nmpc_tpu.solver import make_rti_step

    # ---- 1. sharded batched NMPC solve over the global mesh ----
    batch = 2 * N_PROC * LOCAL_DEVICES
    cfg, ocp, _, states, inputs = _build(
        cfg_overrides=dict(mpc=dict(N=4), solver=dict(qp_iters=4)),
        latent=8,
        batch=batch,
        layer_sizes=(16, 16, 16, 16),
    )
    # _build is seed-deterministic, so every process holds the SAME full
    # batch host-side; lift it into global arrays sharded over the mesh
    shard = NamedSharding(mesh, P(SCENARIO_AXIS))

    def to_global(tree):
        return jax.tree.map(
            lambda x: jax.make_array_from_callback(
                np.shape(x), shard, lambda idx, _x=np.asarray(x): _x[idx]
            ),
            tree,
        )

    g_states, g_inputs = to_global(states), to_global(inputs)
    batched = make_batched_step(ocp, cfg, mesh=mesh)
    results, stats = batched(g_states, g_inputs)
    results.u0.block_until_ready()
    n_ok = int(stats.n_ok)  # replicated scalar — a cross-process reduction
    assert n_ok == batch, f"[p{process_id}] sharded solve failed: {stats}"

    u0_global = np.asarray(
        multihost_utils.process_allgather(results.u0, tiled=True)
    )

    # local single-device reference on the SAME full batch
    plain = jax.jit(jax.vmap(make_rti_step(ocp, cfg, with_evals=False)))
    res_plain = plain(
        jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), states),
        jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), inputs),
    )
    d_u0 = np.abs(u0_global - np.asarray(res_plain.u0)).max()
    assert d_u0 <= TOL_U0, (
        f"[p{process_id}] multi-process sharded u0 differs from "
        f"single-process u0 by {d_u0}"
    )

    # ---- 2. data-parallel training step across processes ----
    module, params = init_neural_df(
        size_latent=8, layer_sizes=(16, 16, 16, 16), seed=1
    )
    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)
    repl = NamedSharding(mesh, P())

    B = 8 * N_PROC * LOCAL_DEVICES
    rng = np.random.default_rng(1)
    x_full = rng.normal(size=(B, 11)).astype(np.float32)
    y_full = rng.normal(size=(B, 1)).astype(np.float32)
    gx = jax.make_array_from_callback(x_full.shape, shard, lambda i: x_full[i])
    gy = jax.make_array_from_callback(y_full.shape, shard, lambda i: y_full[i])
    g_params = jax.tree.map(
        lambda p: jax.make_array_from_callback(
            np.shape(p), repl, lambda idx, _p=np.asarray(p): _p[idx]
        ),
        params,
    )
    g_opt = jax.tree.map(
        lambda p: jax.make_array_from_callback(
            np.shape(p), repl, lambda idx, _p=np.asarray(p): _p[idx]
        )
        if hasattr(p, "shape")
        else p,
        opt_state,
    )

    def train_step(params, opt_state, x, y):
        def loss_fn(p):
            pred = module.apply(p, x)
            return jnp.mean((pred - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    jstep = jax.jit(train_step)
    new_params, _, loss = jstep(g_params, g_opt, gx, gy)
    loss = float(loss)  # replicated — identical on every process

    # local single-device reference
    ref_params, _, ref_loss = jax.jit(train_step)(
        params, opt_state, jnp.asarray(x_full), jnp.asarray(y_full)
    )
    d_loss = abs(loss - float(ref_loss))
    d_params = max(
        float(np.abs(np.asarray(a) - np.asarray(b)).max())
        for a, b in zip(jax.tree.leaves(new_params), jax.tree.leaves(ref_params))
    )
    assert d_loss <= TOL_TRAIN and d_params <= TOL_TRAIN, (
        f"[p{process_id}] DP train step mismatch: d_loss={d_loss} d_params={d_params}"
    )

    print(
        f"[p{process_id}] ok: {len(jax.devices())} global devices over "
        f"{N_PROC} processes, {batch} scenario solves (n_ok={n_ok}, "
        f"d_u0={d_u0:.2e}), DP train loss {loss:.6f} "
        f"(d_loss={d_loss:.2e}, d_params={d_params:.2e})",
        flush=True,
    )
    jax.distributed.shutdown()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main() -> int:
    port = _free_port()
    env = dict(os.environ)
    env.update(
        XLA_FLAGS=f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",  # keep the container's TPU tunnel out
    )
    procs = [
        subprocess.Popen(
            [sys.executable, __file__, "--child", str(i), str(port)],
            env=env,
            cwd=str(REPO),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(N_PROC)
    ]
    outs = []
    rc = 0
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        outs.append(out)
        sys.stdout.write(out)
        if p.returncode != 0 or f"[p{i}] ok:" not in out:
            rc = 1
    if rc == 0:
        print(f"dryrun_multiprocess ok: {N_PROC} processes x "
              f"{LOCAL_DEVICES} devices, coordinator localhost:{port}")
    else:
        print("dryrun_multiprocess FAILED", file=sys.stderr)
    return rc


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        _child(int(sys.argv[2]), int(sys.argv[3]))
    else:
        sys.exit(main())
