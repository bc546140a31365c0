"""Batched closed-loop simulation: controller-in-the-loop rollouts on device.

The reference's closed-loop validation runs one robot in external Gazebo
worlds (SURVEY.md §4).  Here the whole loop — RTI solve, command map, plant
integration, reference update, collision monitoring — is one ``lax.scan``
over control ticks, vmappable over thousands of (scenario, scene) pairs: a
batched Monte-Carlo evaluation harness the reference has no analogue of.

Plant model = the prediction model integrated with erk4 at the control period
(optionally with parameter perturbations / input disturbance via hooks).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp import OcpSpec
from ..solver import SolveInputs, init_state, make_rti_step
from ..solver.integrator import erk4


class ClosedLoopResult(NamedTuple):
    xs: jax.Array  # (T+1, nx) state trajectory
    us: jax.Array  # (T, nu) applied inputs
    statuses: jax.Array  # (T,) solver statuses
    min_clearance: jax.Array  # scalar: min scene SDF along the trajectory
    tracking_error: jax.Array  # scalar: final position error to the target


def make_closed_loop(
    ocp: OcpSpec,
    cfg,
    n_ticks: int,
    scene_sdf_fn: Optional[Callable] = None,
    disturbance_fn: Optional[Callable] = None,
):
    """Build rollout(x0, inputs) -> ClosedLoopResult (pure; jit/vmap freely).

    inputs        -- SolveInputs held fixed over the rollout (frozen latent /
                     reference), as in the reference's frozen-observation
                     regime between images.
    scene_sdf_fn  -- optional world-frame oracle for clearance monitoring:
                     either p3 -> sd, or (p3, scene) -> sd when the rollout is
                     called with a ``scene`` argument (scene-as-data keeps ONE
                     compilation across many scenes and vmaps over them).
    disturbance_fn-- optional (tick, x, u) -> xdot perturbation added to the
                     plant dynamics.
    """
    step = make_rti_step(ocp, cfg)
    dt_ctrl = cfg.mpc.T / cfg.mpc.N
    f = ocp.model.f

    def plant(x, u, k):
        if disturbance_fn is None:
            return erk4(f, x, u, dt_ctrl)
        return erk4(lambda xv, uv: f(xv, uv) + disturbance_fn(k, xv, uv), x, u, dt_ctrl)

    def rollout(x0, inputs: SolveInputs, scene=None) -> ClosedLoopResult:
        x0 = jnp.asarray(x0, inputs.x0.dtype)
        st0 = init_state(ocp, x0, x0.dtype)

        def tick(carry, k):
            x, st = carry
            res = step(st, inputs._replace(x0=x))
            u = res.u0
            x_next = plant(x, u, k)
            if scene_sdf_fn is None:
                clear = jnp.inf
            elif scene is None:
                clear = scene_sdf_fn(x_next[:3])
            else:
                clear = scene_sdf_fn(x_next[:3], scene)
            return (x_next, res.state), (x_next, u, res.status, clear)

        (xT, _), (xs, us, statuses, clears) = jax.lax.scan(
            tick, (x0, st0), jnp.arange(n_ticks)
        )
        xs = jnp.concatenate([x0[None], xs], axis=0)
        target = inputs.yref[-1, :3]  # final reference position
        return ClosedLoopResult(
            xs=xs,
            us=us,
            statuses=statuses,
            min_clearance=jnp.min(clears),
            tracking_error=jnp.linalg.norm(xT[:3] - target),
        )

    return rollout


def make_closed_loop_perception(
    ocp: OcpSpec,
    cfg,
    n_chunks: int,
    ticks_per_chunk: int,
    observe_fn: Callable,
    scene_sdf_fn: Optional[Callable] = None,
):
    """Closed loop WITH the perception cycle in the loop.

    Reproduces the deployed timing structure (reference README.md:208-257 and
    the frozen-observation regime of controller.py:50-55): every
    ``ticks_per_chunk`` control ticks a new observation is taken from the
    CURRENT pose — ``observe_fn(x, scene) -> (W_p_Co, W_R_Co, latent)``
    (typically render + encode) — and frozen into the parameter vector for the
    next chunk.  Outer scan over observations, inner scan over control ticks;
    everything stays one jitted program.

    Returns rollout(x0, inputs, scene) -> ClosedLoopResult (total ticks =
    n_chunks * ticks_per_chunk).
    """
    step = make_rti_step(ocp, cfg)
    dt_ctrl = cfg.mpc.T / cfg.mpc.N
    f = ocp.model.f
    layout = ocp.layout
    N = ocp.N

    def _write_obs(p, W_p_Co, W_R_Co, latent):
        p = p.at[:, jnp.asarray(layout.W_p_Co)].set(W_p_Co[None, :])
        p = p.at[:, jnp.asarray(layout.W_R_Co)].set(W_R_Co.reshape(9)[None, :])
        p = p.at[:, layout.latent_start :].set(latent[None, :])
        return p

    def rollout(x0, inputs: SolveInputs, scene) -> ClosedLoopResult:
        x0 = jnp.asarray(x0, inputs.x0.dtype)
        st0 = init_state(ocp, x0, x0.dtype)

        def chunk(carry, _):
            x, st, p = carry
            W_p_Co, W_R_Co, latent = observe_fn(x, scene)
            p = _write_obs(p, W_p_Co, W_R_Co, latent)

            def tick(carry, k):
                x, st = carry
                res = step(st, inputs._replace(x0=x, p=p))
                x_next = erk4(f, x, res.u0, dt_ctrl)
                clear = (
                    scene_sdf_fn(x_next[:3], scene)
                    if scene_sdf_fn is not None
                    else jnp.inf
                )
                return (x_next, res.state), (x_next, res.u0, res.status, clear)

            (x, st), outs = jax.lax.scan(tick, (x, st), jnp.arange(ticks_per_chunk))
            return (x, st, p), outs

        (xT, _, _), (xs, us, statuses, clears) = jax.lax.scan(
            chunk, (x0, st0, jnp.asarray(inputs.p, x0.dtype)), None, length=n_chunks
        )
        xs = xs.reshape(-1, xs.shape[-1])
        us = us.reshape(-1, us.shape[-1])
        statuses = statuses.reshape(-1)
        clears = clears.reshape(-1)
        xs = jnp.concatenate([x0[None], xs], axis=0)
        target = inputs.yref[-1, :3]
        return ClosedLoopResult(
            xs=xs,
            us=us,
            statuses=statuses,
            min_clearance=jnp.min(clears),
            tracking_error=jnp.linalg.norm(xT[:3] - target),
        )

    return rollout


def summarize(results: ClosedLoopResult) -> dict:
    """Batch-level aggregates (vmapped ClosedLoopResult)."""
    return {
        "n": int(np.asarray(results.tracking_error).size),
        "success_rate": float(np.mean(np.asarray(results.statuses == 0).all(axis=-1))),
        "mean_tracking_error": float(np.mean(np.asarray(results.tracking_error))),
        "worst_clearance": float(np.min(np.asarray(results.min_clearance))),
        "collision_rate": float(np.mean(np.asarray(results.min_clearance) < 0.0)),
    }
