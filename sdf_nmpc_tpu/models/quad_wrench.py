"""Wrench (thrust + inertia-normalized torques) quadrotor model.

Parity with reference sdf_nmpc/model/quad_wrench.py: nx=13 (p, q, v_body, w),
nu=4 = (gamma, normalized torques); body-frame translational dynamics like
quad_rates; rotational dynamics dw = torques (the reference's gyroscopic term
``cs.cross(w, w)`` is identically zero, quad_wrench.py:38 — behavior kept);
y = (p, eta[:2], q_e[3], R·v, w), ny=nyN=12.

Unreachable from the reference factory (gen_model.py:19) and formate_ref used
an undefined ``wz_ref`` (quad_wrench.py:52) — wired and fixed here
(SURVEY.md §7.4).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import math as m
from ..params import ParamLayout
from .base import (GRAVITY, ModelSpec, lanes_mv3, lanes_mv3t,
                   lanes_quat, lanes_quat_deriv)


def make_model(cfg) -> ModelSpec:
    lim = cfg.robot.limits
    layout = ParamLayout.from_cfg(cfg)
    mass = float(cfg.robot.mass)
    inertia = np.diag(np.asarray(cfg.robot.inertia, dtype=float))

    def _split(x):
        p = x[:3]
        q = x[3:7]
        q = q / jnp.linalg.norm(q)
        v = x[7:10]
        w = x[10:]
        return p, q, v, w

    def f(x, u):
        _, q, v, w = _split(x)
        gamma = u[0] * lim.gamma
        torques = u[1:] * lim.torques
        R = m.quat2rot(q)
        dq = m.hamilton_prod(q, jnp.concatenate([jnp.zeros(1), w])) / 2
        dv = R.T @ jnp.array([0.0, 0.0, -GRAVITY]) + jnp.stack([0.0 * gamma, 0.0 * gamma, gamma])
        return jnp.concatenate([R @ v, dq, dv, torques])

    def f_lanes(x, u):
        """f for (nx, L)/(nu, L) lane-stacked inputs (ops/lin_kernels.py);
        golden-tested against ``f`` (tests/test_ops.py).  Preserves the
        reference's gyroscopic-term quirk (dw = torques only)."""
        import jax.numpy as jnp

        q, R = lanes_quat(x[3:7])
        v = [x[7], x[8], x[9]]
        w = [x[10], x[11], x[12]]
        gamma = u[0] * lim.gamma
        dp = lanes_mv3(R, v)
        dq = lanes_quat_deriv(q, w)
        dv = [-GRAVITY * R[2][0], -GRAVITY * R[2][1], -GRAVITY * R[2][2] + gamma]
        dw = [u[1] * lim.torques, u[2] * lim.torques, u[3] * lim.torques]
        return jnp.stack(dp + dq + dv + dw, axis=0)

    def y(x, u, p):
        pos, q, v, w = _split(x)
        eta = m.quat2euler(q)
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        return jnp.concatenate([pos, eta[:2], q_e[3:4], m.quat2rot(q) @ v, w])

    def yN(x, p):
        pos, q, v, w = _split(x)
        eta = m.quat2euler(q)
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        return jnp.concatenate([pos, eta[:2], q_e[3:4], m.quat2rot(q) @ v, w])

    def u_to_cmd(x, u, p):
        torques = u[1:] * lim.torques
        return jnp.concatenate(
            [jnp.stack([mass * u[0] * lim.gamma]), jnp.asarray(inertia) @ torques]
        )

    def formate_ref(ref, n_extra: int = 0):
        yr = np.concatenate([ref.p, [0.0, 0.0, 0.0], ref.v, [0.0, 0.0, ref.wz], np.zeros(n_extra)])
        W = np.concatenate([ref.Wp, ref.Wq, ref.Wv, ref.Ww, np.zeros(n_extra)])
        return yr, W

    return ModelSpec(
        name="quad_wrench",
        nx=13,
        nu=4,
        ny=12,
        nyN=12,
        f=f,
        y=y,
        yN=yN,
        # Intent fix (same class as the props hover fix): reference
        # quad_wrench.py:28 stores the RAW g against the normalized [0, 1]
        # thrust box (gamma limit scales u[0]); the raw value sits 9x outside
        # the box and makes the first-tick QP so badly scaled that an IP
        # solver needs ~100 iterations to converge.  Normalized hover thrust:
        u_hover=np.array([GRAVITY / lim.gamma, 0.0, 0.0, 0.0]),
        lbu=np.array([0.0, -1.0, -1.0, -1.0]),
        ubu=np.array([1.0, 1.0, 1.0, 1.0]),
        formate_ref=formate_ref,
        f_lanes=f_lanes,
        u_to_cmd=u_to_cmd,
        # world-frame velocity (rec-feas hook): state v is BODY-frame here
        vel_world=lambda x: m.quat2rot(x[3:7] / jnp.linalg.norm(x[3:7])) @ x[7:10],
    )
