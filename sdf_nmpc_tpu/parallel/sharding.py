"""Scenario-parallel scale-out: mesh construction + sharded batched solves.

The reference solves ONE OCP per process on CPU (SURVEY.md §2.2: no
distributed backend at all).  The TPU-native scaling axis is the *scenario*
batch: thousands of independent NMPC problems (different x0 / latents / refs)
vmapped into one program and sharded over a device mesh.  XLA inserts the
collectives; aggregate statistics (convergence counts, mean KKT residual)
ride ICI via ``jnp.mean/sum`` on sharded arrays — the analogue of the NCCL
reductions the reference never had (SURVEY.md §5.8).

Multi-host: the same code runs under ``jax.distributed.initialize`` with a
global mesh; nothing here is host-count-specific.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ocp import OcpSpec
from ..solver import SolveInputs, SolverState, make_rti_step

SCENARIO_AXIS = "scenario"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the scenario axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (SCENARIO_AXIS,))


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> Mesh:
    """Join the JAX distributed runtime and return the global scenario mesh.

    Call once per host before building solvers.  With no arguments, relies on
    the cluster environment (TPU pod metadata / SLURM) for auto-detection —
    the standard `jax.distributed.initialize` path (SURVEY.md §5.8).  The
    returned mesh spans ALL devices in the job; scenario sharding over it is
    embarrassingly parallel, with stats reductions riding ICI within a slice
    and DCN across hosts.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    return make_mesh()


class BatchStats(NamedTuple):
    n_ok: jax.Array  # scalar: scenarios with OK status
    n_failed: jax.Array
    max_kkt: jax.Array
    mean_kkt: jax.Array


def make_batched_step(ocp: OcpSpec, cfg, mesh: Optional[Mesh] = None,
                      with_evals: bool = False, budget: str = "cold"):
    """Jitted batched RTI step: (states[B], inputs[B]) -> (results[B], stats).

    With a mesh, the scenario axis is sharded across devices via NamedSharding
    constraints; stats reductions become cross-device collectives.  Per-node
    diagnostics default OFF in the batched path (they re-run the SDF network).
    budget: QP iteration schedule ("cold"/"warm", solver/sqp.py) — batch
    drivers hold one step per budget and pick per tick like Nmpc does.
    """
    step = make_rti_step(ocp, cfg, with_evals=with_evals, budget=budget)
    vstep = jax.vmap(step)

    def batched(states: SolverState, inputs: SolveInputs):
        if mesh is not None:
            shard = NamedSharding(mesh, P(SCENARIO_AXIS))
            states = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, shard), states)
            inputs = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, shard), inputs)
        results = vstep(states, inputs)
        ok = (results.status == 0).astype(jnp.int32)
        stats = BatchStats(
            n_ok=jnp.sum(ok),
            n_failed=jnp.sum(1 - ok),
            max_kkt=jnp.max(results.kkt_residual),
            mean_kkt=jnp.mean(results.kkt_residual),
        )
        return results, stats

    return jax.jit(batched)


def replicate_inputs(inputs: SolveInputs, batch: int) -> SolveInputs:
    """Tile single-scenario inputs along a new scenario axis."""
    return jax.tree.map(lambda x: jnp.tile(x[None], (batch,) + (1,) * x.ndim), inputs)


def stack_tree(items):
    """Stack a list of identical pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *items)


def shard_batch(tree, mesh: Mesh):
    """Device-put a batched pytree with the scenario axis sharded."""
    shard = NamedSharding(mesh, P(SCENARIO_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, shard), tree)
