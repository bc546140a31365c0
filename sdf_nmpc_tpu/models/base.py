"""Model abstraction: a dynamics model is a bundle of pure functions + static dims.

Replaces the reference's mutable ``BaseModel`` CasADi-symbol container
(sdf_nmpc/model/base_model.py:7-168).  Where the reference accumulates MX
expressions via ``add_cost_stage`` / ``add_const_stage`` hooks, here a model is
an immutable :class:`ModelSpec` of jnp functions, and the OCP layer
(sdf_nmpc_tpu/ocp.py) composes additional cost/constraint functions on top —
function composition instead of symbolic graph mutation.

All callables are pure and traceable:
  f(x, u)        -> xdot            continuous dynamics
  y(x, u, p)     -> (ny,)           stage NLS residual outputs
  yN(x, p)       -> (nyN,)          terminal NLS residual outputs
  u_to_*(x,u,p)  -> command vector  command maps
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np

GRAVITY = 9.81


@dataclasses.dataclass(frozen=True)
class ModelSpec:
    """Immutable dynamics-model description (reference BaseModel analogue)."""

    name: str
    nx: int
    nu: int
    ny: int
    nyN: int
    f: Callable  # f(x, u) -> xdot
    y: Callable  # y(x, u, p) -> (ny,)
    yN: Callable  # yN(x, p) -> (nyN,)
    u_hover: np.ndarray
    lbu: np.ndarray
    ubu: np.ndarray
    formate_ref: Callable  # formate_ref(ref, n_extra) -> (yr, W) numpy
    u_to_acc: Optional[Callable] = None
    u_to_TRPYr: Optional[Callable] = None
    u_to_props: Optional[Callable] = None
    u_to_cmd: Optional[Callable] = None
    # f in "lanes form" for the Pallas linearization kernel
    # (ops/lin_kernels.py): f_lanes(x (nx, L), u (nu, L)) -> (nx, L) with
    # elementwise component arithmetic only.  Optional — models without it
    # linearize through the jacfwd fallback path.
    f_lanes: Optional[Callable] = None
    # stage residual in lanes form: y_lanes(x (nx, L), u (nu, L),
    # q_d (4, L)) -> (ny, L); lets the linearization kernel emit the cost
    # rows' Jacobians in the same fused pass.
    y_lanes: Optional[Callable] = None
    # world-frame velocity extractor (x -> (3,)): the recursive-feasibility
    # terminal ingredients hook here instead of assuming a state layout
    # (the reference wires rec-feas generically through model hooks,
    # gen_model.py:73-121).  None = model exposes no world velocity and
    # cannot run recursive_feasibility.
    vel_world: Optional[Callable] = None


def terminal_gate_enabled(cfg) -> bool:
    """Whether the terminal residual is gated by the sdf flag parameter.

    Mirrors the condition at e.g. quad_rollpitchyawrate.py:52-55: the gate is
    active iff enable_sdf AND recursive_feasibility AND stability.
    """
    fl = cfg.flags
    return bool(fl.enable_sdf and fl.recursive_feasibility and fl.stability)


# ---------------------------------------------------------------------------
# Lanes-form building blocks (ops/lin_kernels.py kernels): quaternion /
# rotation component algebra for (k, L) lane-stacked arrays.  All expressions
# are elementwise — no matmuls, no trailing-axis reductions — so they lower
# cleanly in Pallas TPU kernels.
# ---------------------------------------------------------------------------


def lanes_quat(qraw):
    """Normalized components (q0..q3) and rotation entries R[i][j] for
    (4, L) lane-stacked quaternions (math.py quat2rot formulas)."""
    import jax
    import jax.numpy as jnp

    inv = jax.lax.rsqrt(jnp.maximum((qraw * qraw).sum(0), 1e-30))
    q0, q1, q2, q3 = qraw[0] * inv, qraw[1] * inv, qraw[2] * inv, qraw[3] * inv
    R = [
        [q0 * q0 + q1 * q1 - q2 * q2 - q3 * q3, 2 * (q1 * q2 - q0 * q3),
         2 * (q1 * q3 + q0 * q2)],
        [2 * (q1 * q2 + q0 * q3), q0 * q0 - q1 * q1 + q2 * q2 - q3 * q3,
         2 * (q2 * q3 - q0 * q1)],
        [2 * (q1 * q3 - q0 * q2), 2 * (q2 * q3 + q0 * q1),
         q0 * q0 - q1 * q1 - q2 * q2 + q3 * q3],
    ]
    return (q0, q1, q2, q3), R


def lanes_mv3(R, v):
    """R @ v for component-list rotation R and 3-list v of (L,) arrays."""
    return [R[i][0] * v[0] + R[i][1] * v[1] + R[i][2] * v[2] for i in range(3)]


def lanes_mv3t(R, v):
    """R^T @ v."""
    return [R[0][i] * v[0] + R[1][i] * v[1] + R[2][i] * v[2] for i in range(3)]


def lanes_quat_deriv(q, w):
    """hamilton(q, (0, w)) / 2 in components (math.py:138)."""
    q0, q1, q2, q3 = q
    return [
        0.5 * (-q1 * w[0] - q2 * w[1] - q3 * w[2]),
        0.5 * (q0 * w[0] + q2 * w[2] - q3 * w[1]),
        0.5 * (q0 * w[1] - q1 * w[2] + q3 * w[0]),
        0.5 * (q0 * w[2] + q1 * w[1] - q2 * w[0]),
    ]
