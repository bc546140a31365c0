"""Per-rotor (motor-speed) quadrotor model with full rigid-body dynamics.

Parity with reference sdf_nmpc/model/quad_props.py: nx=13 (p, q, v_world, w),
nu=4 normalized motor speeds; allocation matrices Gf/Gt built from
cfg.robot.alloc.motors via the GTMRP construction (:20-27, motor alpha/beta
angles used as radians exactly as the reference does); W_a = R·Gf·wp²/m - g·e3,
dw = J⁻¹(Gt·wp² - w×Jw) (:41-48); hover speed wh = sqrt(mg/(4·cf)) (:51);
y = (p, eta[:2], q_e[3], v, w, wp) ny=16, yN drops wp, nyN=12.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import math as m
from ..params import ParamLayout
from .base import (GRAVITY, ModelSpec, lanes_mv3, lanes_quat,
                   lanes_quat_deriv)


def _allocation_from_cfg(cfg):
    """Build per-motor allocation (reference quad_props.py:20-27)."""
    motors = [list(mt) for mt in cfg.robot.alloc.motors]
    px, py, pz, alpha, beta, sign = (list(col) for col in zip(*motors))
    n = len(sign)
    cf = [float(cfg.robot.alloc.cf)] * n
    ct = [float(cfg.robot.alloc.ct)] * n
    R = [
        m.axis_rot("z", i * (np.pi / (n / 2)))
        @ m.axis_rot("y", beta[i])
        @ m.axis_rot("x", (-1) ** i * alpha[i])
        for i in range(n)
    ]
    pos = np.array([px, py, pz]).T
    Gf, Gt = m.gtmrp_matrix(R, pos, sign, cf, ct)
    Gf = np.asarray(cf) * Gf
    Gt = np.asarray(cf) * Gt
    return Gf, Gt


def make_model(cfg) -> ModelSpec:
    lim = cfg.robot.limits
    layout = ParamLayout.from_cfg(cfg)
    mass = float(cfg.robot.mass)
    J = np.diag(np.asarray(cfg.robot.inertia, dtype=float))
    Jinv = np.linalg.inv(J)
    Gf, Gt = _allocation_from_cfg(cfg)
    wh = float(np.sqrt(mass * GRAVITY / 4 / cfg.robot.alloc.cf))

    Gf_j, Gt_j, J_j, Jinv_j = (jnp.asarray(a) for a in (Gf, Gt, J, Jinv))

    def _split(x):
        p = x[:3]
        q = x[3:7]
        q = q / jnp.linalg.norm(q)
        v = x[7:10]
        w = x[10:]
        return p, q, v, w

    def f(x, u):
        _, q, v, w = _split(x)
        wp = u * lim.wp
        W_R_B = m.quat2rot(q)
        W_a = W_R_B @ (Gf_j @ (wp**2)) / mass + jnp.array([0.0, 0.0, -GRAVITY])
        dq = m.hamilton_prod(q, jnp.concatenate([jnp.zeros(1), w])) / 2
        dw = Jinv_j @ (Gt_j @ (wp**2) - jnp.cross(w, J_j @ w))
        return jnp.concatenate([v, dq, W_a, dw])

    def f_lanes(x, u):
        """f for (nx, L)/(nu, L) lane-stacked inputs (ops/lin_kernels.py);
        golden-tested against ``f``.  The constant allocation/inertia
        matrices unroll into scalar-coefficient expressions."""
        import jax.numpy as jnp

        q, R = lanes_quat(x[3:7])
        v = [x[7], x[8], x[9]]
        w = [x[10], x[11], x[12]]
        t = [(u[i] * lim.wp) ** 2 for i in range(4)]
        gf = [sum(float(Gf[i, j]) * t[j] for j in range(4)) for i in range(3)]
        gt = [sum(float(Gt[i, j]) * t[j] for j in range(4)) for i in range(3)]
        W_a = lanes_mv3(R, gf)
        W_a = [W_a[0] / mass, W_a[1] / mass, W_a[2] / mass - GRAVITY]
        dq = lanes_quat_deriv(q, w)
        # J @ w (J diagonal from cfg), cross(w, Jw), Jinv @ (...)
        Jw = [float(J[i, i]) * w[i] for i in range(3)]
        cr = [
            w[1] * Jw[2] - w[2] * Jw[1],
            w[2] * Jw[0] - w[0] * Jw[2],
            w[0] * Jw[1] - w[1] * Jw[0],
        ]
        dw = [float(Jinv[i, i]) * (gt[i] - cr[i]) for i in range(3)]
        return jnp.stack(v + dq + W_a + dw, axis=0)

    def y(x, u, p):
        pos, q, v, w = _split(x)
        eta = m.quat2euler(q)
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        return jnp.concatenate([pos, eta[:2], q_e[3:4], v, w, u * lim.wp])

    def yN(x, p):
        pos, q, v, w = _split(x)
        eta = m.quat2euler(q)
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        return jnp.concatenate([pos, eta[:2], q_e[3:4], v, w])

    def u_to_props(x, u, p):
        return u * lim.wp

    def u_to_acc(x, u, p):
        _, q, _, w = _split(x)
        wp = u * lim.wp
        W_R_B = m.quat2rot(q)
        W_a = W_R_B @ (Gf_j @ (wp**2)) / mass + jnp.array([0.0, 0.0, -GRAVITY])
        return jnp.concatenate([W_R_B.T @ W_a, w[2:3]])

    def formate_ref(ref, n_extra: int = 0):
        yr = np.concatenate(
            [ref.p, [0.0, 0.0, 0.0], ref.v, [0.0, 0.0, ref.wz], [wh] * 4, np.zeros(n_extra)]
        )
        W = np.concatenate([ref.Wp, ref.Wq, ref.Wv, ref.Ww, [ref.Wa] * 4, np.zeros(n_extra)])
        return yr, W

    return ModelSpec(
        name="quad_props",
        nx=13,
        nu=4,
        ny=16,
        nyN=12,
        f=f,
        y=y,
        yN=yN,
        # reference sets u_hover to the raw speed wh (quad_props.py:52) even
        # though u is normalized to [0,1]; we use the normalized hover speed,
        # which is the intended warm-start value.
        u_hover=np.full(4, wh / lim.wp),
        lbu=np.zeros(4),
        ubu=np.ones(4),
        formate_ref=formate_ref,
        f_lanes=f_lanes,
        # world-frame velocity (rec-feas hook; state layout p,q,v)
        vel_world=lambda x: x[7:10],
        u_to_acc=u_to_acc,
        u_to_props=u_to_props,
    )
