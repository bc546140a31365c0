"""Composable cost/constraint row builders for the OCP.

The function-composition counterpart of the reference's BaseModel add-hooks +
cost_const_helpers (sdf_nmpc/model/cost_const_helpers.py): each helper returns
row tuples ``(fn, lower, upper, z1, z2)`` (constraints) or ``(fn, weight)``
(cost rows) consumable by ``build_ocp(..., extra_*=...)``.

Row function signatures: stage constraint/cost fns take (x, u, p) -> scalar;
terminal fns take (x, p) -> scalar.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .ocp import camera_frame_position
from .params import ParamLayout
from . import math as m


def _slack_pair(cfg, slack):
    if slack is None:
        hard = cfg.solver.hard_slack
        return float(hard[0]), float(hard[1])
    return float(slack[0]), float(slack[1])


def fov_const_normals(cfg, h_const=True, v_const=True, slack=None):
    """Half-space FoV constraints (the reference's unused alternative,
    cost_const_helpers.py:6-45): for each fov plane, the flag-gated signed
    distance to the plane must be >= 0 (upper bound dmax is vacuous)."""
    layout = ParamLayout.from_cfg(cfg)
    _, co_p_c = camera_frame_position(cfg, layout)
    z1, z2 = _slack_pair(cfg, slack)
    dmax = float(cfg.sensor.dmax)
    rows = []

    def plane_row(normal):
        n = jnp.asarray(normal / np.linalg.norm(normal), dtype=jnp.float32)

        def fn(x, u, p):
            return layout.get_flag(p) * jnp.dot(n, co_p_c(x, p))

        return (fn, 0.0, dmax, z1, z2)

    th = np.tan(cfg.sensor.hfov)
    tv = np.tan(cfg.sensor.vfov)
    if h_const:
        rows.append(plane_row(np.array([th, -1.0, 0.0])))
        rows.append(plane_row(np.array([th, 1.0, 0.0])))
    if v_const:
        rows.append(plane_row(np.array([tv, 0.0, -1.0])))
        rows.append(plane_row(np.array([tv, 0.0, 1.0])))
    return rows


def roll_const(cfg, slack=None):
    """Stage+terminal roll bound (cost_const_helpers.py:105-108).
    Returns (stage_rows, term_rows)."""
    z1, z2 = _slack_pair(cfg, slack)
    lim = float(cfg.robot.limits.roll)

    def roll_of(x):
        return m.quat2euler(x[3:7] / jnp.linalg.norm(x[3:7]))[0]

    stage = [(lambda x, u, p: roll_of(x), -lim, lim, z1, z2)]
    term = [(lambda x, p: roll_of(x), -lim, lim, z1, z2)]
    return stage, term


def pitch_const(cfg, slack=None):
    """Stage+terminal pitch bound (cost_const_helpers.py:111-114)."""
    z1, z2 = _slack_pair(cfg, slack)
    lim = float(cfg.robot.limits.pitch)

    def pitch_of(x):
        return m.quat2euler(x[3:7] / jnp.linalg.norm(x[3:7]))[1]

    stage = [(lambda x, u, p: pitch_of(x), -lim, lim, z1, z2)]
    term = [(lambda x, p: pitch_of(x), -lim, lim, z1, z2)]
    return stage, term


def vel_const(cfg, stage=True, term=False, slack=None):
    """Velocity box constraints per axis (cost_const_helpers.py:79-102).
    Returns (stage_rows, term_rows); expressed as general rows on x[7:10]."""
    z1, z2 = _slack_pair(cfg, slack)
    lim = cfg.robot.limits
    bounds = [float(lim.vx), float(lim.vy), float(lim.vz)]
    stage_rows, term_rows = [], []
    for i, b in enumerate(bounds):
        if stage:
            stage_rows.append((lambda x, u, p, j=7 + i: x[j], -b, b, z1, z2))
        if term:
            term_rows.append((lambda x, p, j=7 + i: x[j], -b, b, z1, z2))
    return stage_rows, term_rows


def yxvel_cost(cfg, w_y: float, w_z: float):
    """Stage cost rows on body vy/vz (cost_const_helpers.py:117-120).
    Returns [(fn, weight), ...]."""
    return [
        (lambda x, u, p: x[8], float(w_y)),
        (lambda x, u, p: x[9], float(w_z)),
    ]
