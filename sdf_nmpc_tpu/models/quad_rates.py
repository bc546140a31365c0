"""Body-rate quadrotor model with BODY-frame velocity state.

Parity with reference sdf_nmpc/model/quad_rates.py: nx=10 (p, q, v_body), nu=4
= (gamma, wx, wy, wz); dynamics dp = R·v, dv = R^T·(-g e3) + gamma e3 (:31-35);
stage residual y = (p, eta[:2], q_e[3], R·v, w), ny=12; terminal drops w,
nyN=9.

The reference leaves this model unreachable from the factory (gen_model.py:18
is ``pass``) and its formate_ref references an undefined ``wz_ref``
(quad_rates.py:50) — SURVEY.md §7.4.  Here it is fully wired and the intended
``ref.wz`` is used.
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

    def _split(x):
        p = x[:3]
        q = x[3:7]
        q = q / jnp.linalg.norm(q)
        v = x[7:]
        return p, q, v

    def _w(u):
        return jnp.stack([u[1] * lim.wx, u[2] * lim.wy, u[3] * lim.wz])

    def f(x, u):
        _, q, v = _split(x)
        gamma = u[0] * lim.gamma
        w = _w(u)
        R = m.quat2rot(q)
        dq = m.hamilton_prod(q, jnp.concatenate([jnp.zeros(1), w])) / 2
        dv = R.T @ jnp.array([0.0, 0.0, -GRAVITY]) + jnp.stack([0.0 * gamma, 0.0 * gamma, gamma])
        return jnp.concatenate([R @ v, dq, dv])

    def f_lanes(x, u):
        """f for (nx, L)/(nu, L) lane-stacked inputs (ops/lin_kernels.py);
        golden-tested against ``f`` (tests/test_ops.py)."""
        import jax.numpy as jnp

        q, R = lanes_quat(x[3:7])
        v = [x[7], x[8], x[9]]
        gamma = u[0] * lim.gamma
        w = [u[1] * lim.wx, u[2] * lim.wy, u[3] * lim.wz]
        dp = lanes_mv3(R, v)
        dq = lanes_quat_deriv(q, w)
        # R^T (0,0,-g) + (0,0,gamma)
        dv = [-GRAVITY * R[2][0], -GRAVITY * R[2][1], -GRAVITY * R[2][2] + gamma]
        return jnp.stack(dp + dq + dv, axis=0)

    def y(x, u, p):
        pos, q, v = _split(x)
        eta = m.quat2euler(q)
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        return jnp.concatenate([pos, eta[:2], q_e[3:4], m.quat2rot(q) @ v, _w(u)])

    def yN(x, p):
        pos, q, v = _split(x)
        eta = m.quat2euler(q)
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        return jnp.concatenate([pos, eta[:2], q_e[3:4], m.quat2rot(q) @ v])

    def u_to_cmd(x, u, p):
        return jnp.concatenate([jnp.stack([mass * u[0] * lim.gamma]), _w(u)])

    def formate_ref(ref, n_extra: int = 0):
        yr = np.concatenate([ref.p, [0.0, 0.0, 0.0], ref.v, [0.0, 0.0, ref.wz], np.zeros(n_extra)])
        W = np.concatenate([ref.Wp, ref.Wq, ref.Wv, ref.Ww, np.zeros(n_extra)])
        return yr, W

    return ModelSpec(
        name="quad_rates",
        nx=10,
        nu=4,
        ny=12,
        nyN=9,
        f=f,
        y=y,
        yN=yN,
        u_hover=np.array([GRAVITY / lim.gamma, 0.0, 0.0, 0.0]),
        lbu=np.array([0.0, -1.0, -1.0, -1.0]),
        ubu=np.array([1.0, 1.0, 1.0, 1.0]),
        formate_ref=formate_ref,
        f_lanes=f_lanes,
        u_to_cmd=u_to_cmd,
        # world-frame velocity (rec-feas hook): state v is BODY-frame here
        vel_world=lambda x: m.quat2rot(x[3:7] / jnp.linalg.norm(x[3:7])) @ x[7:10],
    )
