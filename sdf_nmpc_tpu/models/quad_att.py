"""Roll/pitch/yawrate quadrotor model — the paper's main control model.

Behavioral parity with reference sdf_nmpc/model/quad_rollpitchyawrate.py:
  * nx=10 (p, q, v), nu=4 = (gamma=T/m, roll, pitch, wz), all normalized to
    [0,1]/[-1,1] then scaled by cfg.robot.limits (reference :26-29)
  * yaw-decomposed attitude: the commanded roll/pitch tilt a frame V that
    carries only the current yaw; W_a = W_R_V·V_R_B·(0,0,gamma) - g·e3
    (reference :32-35); quaternion kinematics driven by yaw rate only (:36)
  * u_hover = g/gamma_max (:44)
  * stage residual y = (p, q_e[3], v, roll, pitch, wz, W_a[2]), ny=11 (:51)
  * terminal residual yN = (p, q_e[3]), nyN=4, gated by the flag parameter iff
    sdf+rec_feas+stability (:52-55)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import math as m
from ..params import ParamLayout
from .base import GRAVITY, ModelSpec, terminal_gate_enabled


def make_model(cfg) -> ModelSpec:
    lim = cfg.robot.limits
    layout = ParamLayout.from_cfg(cfg)
    gate = terminal_gate_enabled(cfg)
    mass = float(cfg.robot.mass)

    def _split(x):
        p = x[:3]
        q = x[3:7]
        q = q / jnp.linalg.norm(q)
        v = x[7:]
        return p, q, v

    def _wrb_wa(q, u):
        gamma = u[0] * lim.gamma
        roll = u[1] * lim.roll
        pitch = u[2] * lim.pitch
        theta_z = jnp.arctan2(q[3], q[0])
        qyaw = jnp.stack([jnp.cos(theta_z), 0.0 * theta_z, 0.0 * theta_z, jnp.sin(theta_z)])
        V_R_B = m.euler2rot(jnp.stack([roll, pitch, jnp.zeros_like(roll)]))
        W_R_V = m.quat2rot(qyaw)
        W_R_B = W_R_V @ V_R_B
        W_a = W_R_B @ jnp.stack([0.0 * gamma, 0.0 * gamma, gamma]) + jnp.array([0.0, 0.0, -GRAVITY])
        return W_R_B, W_a

    def f(x, u):
        _, q, v = _split(x)
        wz = u[3] * lim.wz
        _, W_a = _wrb_wa(q, u)
        dq = m.hamilton_prod(q, jnp.stack([0.0 * wz, 0.0 * wz, 0.0 * wz, wz])) / 2
        return jnp.concatenate([v, dq, W_a])

    def y(x, u, p):
        pos, q, v = _split(x)
        roll = u[1] * lim.roll
        pitch = u[2] * lim.pitch
        wz = u[3] * lim.wz
        _, W_a = _wrb_wa(q, u)
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        return jnp.concatenate([pos, q_e[3:4], v, jnp.stack([roll, pitch, wz, W_a[2]])])

    def yN(x, p):
        pos, q, _ = _split(x)
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        out = jnp.concatenate([pos, q_e[3:4]])
        if gate:
            out = out * layout.get_flag(p)
        return out

    def u_to_acc(x, u, p):
        _, q, _ = _split(x)
        wz = u[3] * lim.wz
        W_R_B, W_a = _wrb_wa(q, u)
        return jnp.concatenate([W_R_B.T @ W_a, wz[None]])

    def u_to_TRPYr(x, u, p):
        return jnp.stack([u[0] * lim.gamma * mass, u[1] * lim.roll, u[2] * lim.pitch, u[3] * lim.wz])

    def formate_ref(ref, n_extra: int = 0):
        """(yr, W) packing; reference quad_rollpitchyawrate.py:62-65."""
        yr = np.concatenate([ref.p, [0.0], ref.v, [0.0, 0.0], [ref.wz], [0.0], np.zeros(n_extra)])
        W = np.concatenate(
            [ref.Wp, [ref.Wq[2]], ref.Wv, ref.Wq[:2], ref.Ww[2:3], [ref.Wa], np.zeros(n_extra)]
        )
        return yr, W

    return ModelSpec(
        name="quad_rollpitchyawrate",
        nx=10,
        nu=4,
        ny=11,
        nyN=4,
        f=f,
        y=y,
        yN=yN,
        u_hover=np.array([GRAVITY / lim.gamma, 0.0, 0.0, 0.0]),
        lbu=np.array([0.0, -1.0, -1.0, -1.0]),
        ubu=np.array([1.0, 1.0, 1.0, 1.0]),
        formate_ref=formate_ref,
        u_to_acc=u_to_acc,
        u_to_TRPYr=u_to_TRPYr,
    )
