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


def terminal_gate_enabled(cfg) -> bool:
    """Whether the terminal residual is gated by the sdf flag parameter.

    Mirrors the condition at e.g. quad_rollpitchyawrate.py:52-55: the gate is
    active iff enable_sdf AND recursive_feasibility AND stability.
    """
    fl = cfg.flags
    return bool(fl.enable_sdf and fl.recursive_feasibility and fl.stability)
