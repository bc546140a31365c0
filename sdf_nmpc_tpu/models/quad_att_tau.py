"""Roll/pitch/yawrate quadrotor model with first-order attitude lag.

Parity with reference sdf_nmpc/model/quad_rollpitchyawrate_tau.py: same
interface as quad_att but the commanded roll/pitch act through a first-order
lag tau=0.12 s (:19-20): dot_roll = (roll_des - roll)/tau (:35-37), with
euler-rate -> body-rate mapping via deuler_avel_map (:37); thrust acts along
the *current* attitude (W_a = quat2rot(q)·(0,0,gamma) - g·e3, :33).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import math as m
from ..params import ParamLayout
from .base import GRAVITY, ModelSpec, terminal_gate_enabled

TAU_ROLL = 0.12
TAU_PITCH = 0.12


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

    def f(x, u):
        _, q, v = _split(x)
        eta = m.quat2euler(q)
        gamma = u[0] * lim.gamma
        roll_des = u[1] * lim.roll
        pitch_des = u[2] * lim.pitch
        wz = u[3] * lim.wz

        W_R_B = m.quat2rot(q)
        W_a = W_R_B @ jnp.stack([0.0 * gamma, 0.0 * gamma, gamma]) + jnp.array([0.0, 0.0, -GRAVITY])
        dot_roll = (roll_des - eta[0]) / TAU_ROLL
        dot_pitch = (pitch_des - eta[1]) / TAU_PITCH
        w = m.deuler_avel_map(eta) @ jnp.stack([dot_roll, dot_pitch, jnp.zeros_like(dot_roll)])
        dq = m.hamilton_prod(q, jnp.stack([jnp.zeros_like(wz), w[0], w[1], wz])) / 2
        return jnp.concatenate([v, dq, W_a])

    def f_lanes(x, u):
        """f for (nx, L)/(nu, L) lane-stacked inputs (ops/lin_kernels.py).

        quat2euler / deuler_avel_map / the quat2rot third column expanded in
        components; golden-tested against ``f`` (tests/test_ops.py)."""
        qraw = x[3:7]
        inv = jax.lax.rsqrt(jnp.maximum((qraw * qraw).sum(0), 1e-30))
        q0, q1, q2, q3 = qraw[0] * inv, qraw[1] * inv, qraw[2] * inv, qraw[3] * inv
        v = x[7:10]
        gamma = u[0] * lim.gamma
        roll_des = u[1] * lim.roll
        pitch_des = u[2] * lim.pitch
        wz = u[3] * lim.wz
        # quat2euler roll/pitch rows (math.py quat2euler); atan2/asin have no
        # Mosaic lowering — polynomial forms (~1 f32 ulp, math.py)
        roll = m.atan2_poly(2 * (q0 * q1 + q2 * q3), 1 - 2 * (q1 * q1 + q2 * q2))
        pitch = m.asin_poly(2 * (q0 * q2 - q3 * q1))
        # W_a = gamma * (third column of quat2rot(q)) - g e3
        a0 = gamma * (2 * (q1 * q3 + q0 * q2))
        a1 = gamma * (2 * (q2 * q3 - q0 * q1))
        a2 = gamma * (q0 * q0 - q1 * q1 - q2 * q2 + q3 * q3) - GRAVITY
        dot_roll = (roll_des - roll) / TAU_ROLL
        dot_pitch = (pitch_des - pitch) / TAU_PITCH
        sr, cr = jnp.sin(roll), jnp.cos(roll)
        sp, cp = jnp.sin(pitch), jnp.cos(pitch)
        # w = deuler_avel_map(eta) @ (dot_roll, dot_pitch, 0)
        w0 = dot_roll + (sp * sr / cp) * dot_pitch
        w1 = cr * dot_pitch
        # dq = hamilton(q, (0, w0, w1, wz)) / 2
        return jnp.stack(
            [
                v[0], v[1], v[2],
                0.5 * (-q1 * w0 - q2 * w1 - q3 * wz),
                0.5 * (q0 * w0 + q2 * wz - q3 * w1),
                0.5 * (q0 * w1 - q1 * wz + q3 * w0),
                0.5 * (q0 * wz + q1 * w1 - q2 * w0),
                a0, a1, a2,
            ],
            axis=0,
        )

    def y_lanes(x, u, q_d):
        """Stage residual for lane-stacked inputs (ops/lin_kernels.py);
        W_a[2] along the CURRENT attitude (quat2rot third column);
        golden-tested against ``y`` (tests/test_ops.py)."""
        qraw = x[3:7]
        inv = jax.lax.rsqrt(jnp.maximum((qraw * qraw).sum(0), 1e-30))
        q0, q1, q2, q3 = qraw[0] * inv, qraw[1] * inv, qraw[2] * inv, qraw[3] * inv
        s = jax.lax.rsqrt(jnp.maximum(q0 * q0 + q1 * q1 + q2 * q2 + q3 * q3, 1e-30))
        qi0, qi1, qi2, qi3 = q0 * s, -q1 * s, -q2 * s, -q3 * s
        qe3 = q_d[0] * qi3 + q_d[1] * qi2 - q_d[2] * qi1 + q_d[3] * qi0
        gamma = u[0] * lim.gamma
        a2 = gamma * (q0 * q0 - q1 * q1 - q2 * q2 + q3 * q3) - GRAVITY
        return jnp.stack(
            [
                x[0], x[1], x[2], qe3, x[7], x[8], x[9],
                u[1] * lim.roll, u[2] * lim.pitch, u[3] * lim.wz, a2,
            ],
            axis=0,
        )

    def y(x, u, p):
        pos, q, v = _split(x)
        roll_des = u[1] * lim.roll
        pitch_des = u[2] * lim.pitch
        wz = u[3] * lim.wz
        gamma = u[0] * lim.gamma
        W_a = m.quat2rot(q) @ jnp.stack([0.0 * gamma, 0.0 * gamma, gamma]) + jnp.array(
            [0.0, 0.0, -GRAVITY]
        )
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        return jnp.concatenate([pos, q_e[3:4], v, jnp.stack([roll_des, pitch_des, wz, W_a[2]])])

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
        gamma = u[0] * lim.gamma
        wz = u[3] * lim.wz
        W_R_B = m.quat2rot(q)
        W_a = W_R_B @ jnp.stack([0.0 * gamma, 0.0 * gamma, gamma]) + jnp.array([0.0, 0.0, -GRAVITY])
        return jnp.concatenate([W_R_B.T @ W_a, wz[None]])

    def u_to_TRPYr(x, u, p):
        return jnp.stack([u[0] * lim.gamma * mass, u[1] * lim.roll, u[2] * lim.pitch, u[3] * lim.wz])

    def formate_ref(ref, n_extra: int = 0):
        yr = np.concatenate([ref.p, [0.0], ref.v, [0.0, 0.0], [ref.wz], [0.0], np.zeros(n_extra)])
        W = np.concatenate(
            [ref.Wp, [ref.Wq[2]], ref.Wv, ref.Wq[:2], ref.Ww[2:3], [ref.Wa], np.zeros(n_extra)]
        )
        return yr, W

    return ModelSpec(
        name="quad_rollpitchyawrate_tau",
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
