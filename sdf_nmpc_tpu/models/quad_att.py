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

import jax
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

    def f_lanes(x, u):
        """f for (nx, L)/(nu, L) lane-stacked inputs (ops/lin_kernels.py).

        Same arithmetic as ``f`` with the rotation products expanded in
        components: W_R_V = Rz(2*atan2(q3, q0)) has r02=r12=r20=r21=0 and
        r11=r00, and V_R_B @ (0,0,gamma) is gamma times euler2rot's third
        column at yaw=0.  Equivalence with ``f`` is golden-tested
        (tests/test_ops.py)."""
        qraw = x[3:7]
        inv = jax.lax.rsqrt(jnp.maximum((qraw * qraw).sum(0), 1e-30))
        q0, q1, q2, q3 = qraw[0] * inv, qraw[1] * inv, qraw[2] * inv, qraw[3] * inv
        v = x[7:10]
        gamma = u[0] * lim.gamma
        roll = u[1] * lim.roll
        pitch = u[2] * lim.pitch
        wz = u[3] * lim.wz
        # cos/sin of atan2(q3, q0) algebraically (atan2 has no Mosaic
        # lowering, and this form is exact): c = q0/|q03|, s = q3/|q03|
        rinv = jax.lax.rsqrt(jnp.maximum(q0 * q0 + q3 * q3, 1e-30))
        c, s = q0 * rinv, q3 * rinv
        r00 = c * c - s * s  # = r11
        r10 = 2 * c * s  # = -r01
        cr, sr = jnp.cos(roll), jnp.sin(roll)
        cp, sp = jnp.cos(pitch), jnp.sin(pitch)
        b0 = gamma * (cr * sp)
        b1 = gamma * (-sr)
        b2 = gamma * (cr * cp)
        a0 = r00 * b0 - r10 * b1
        a1 = r10 * b0 + r00 * b1
        a2 = (c * c + s * s) * b2 - GRAVITY
        h = 0.5 * wz
        return jnp.stack(
            [v[0], v[1], v[2], -h * q3, h * q2, -h * q1, h * q0, a0, a1, a2],
            axis=0,
        )

    def y_lanes(x, u, q_d):
        """Stage residual for (nx, L)/(nu, L)/(4, L) lane-stacked inputs
        (ops/lin_kernels.py): same arithmetic as ``y`` with the Hamilton
        product expanded (only q_e's z-component appears in y) and W_a[2]
        from the yaw-decomposed form (see f_lanes).  Golden-tested against
        ``y`` (tests/test_ops.py)."""
        qraw = x[3:7]
        inv = jax.lax.rsqrt(jnp.maximum((qraw * qraw).sum(0), 1e-30))
        q0, q1, q2, q3 = qraw[0] * inv, qraw[1] * inv, qraw[2] * inv, qraw[3] * inv
        # quat_invert re-normalizes (math.py:131): mirror the second divide
        s = jax.lax.rsqrt(jnp.maximum(q0 * q0 + q1 * q1 + q2 * q2 + q3 * q3, 1e-30))
        qi0, qi1, qi2, qi3 = q0 * s, -q1 * s, -q2 * s, -q3 * s
        qd0, qd1, qd2, qd3 = q_d[0], q_d[1], q_d[2], q_d[3]
        # hamilton(q_d, qi) z-component (math.py:138)
        qe3 = qd0 * qi3 + qd1 * qi2 - qd2 * qi1 + qd3 * qi0
        gamma = u[0] * lim.gamma
        roll = u[1] * lim.roll
        pitch = u[2] * lim.pitch
        wz = u[3] * lim.wz
        rinv = jax.lax.rsqrt(jnp.maximum(q0 * q0 + q3 * q3, 1e-30))
        c, sy = q0 * rinv, q3 * rinv
        a2 = (c * c + sy * sy) * (gamma * jnp.cos(roll) * jnp.cos(pitch)) - GRAVITY
        return jnp.stack(
            [x[0], x[1], x[2], qe3, x[7], x[8], x[9], roll, pitch, wz, a2],
            axis=0,
        )

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
        f_lanes=f_lanes,
        y_lanes=y_lanes,
        # world-frame velocity (rec-feas hook; state layout p,q,v)
        vel_world=lambda x: x[7:10],
    )
