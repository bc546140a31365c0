"""World-frame acceleration quadrotor model (kinematic integrator).

Parity with reference sdf_nmpc/model/quad_acc.py: nx=10 (p,q,v), nu=4 =
(normalized world acc, yawrate), ny=11, nyN=7; kinematic dynamics (:27-34);
stage residual y=(p, q_e[3], v, W_a, wz) (:42); terminal y=(p, q_e[3], v) with
flag gating under sdf+rec_feas+stability (:43-47).

The reference's ``formate_ref`` references an undefined ``p`` (quad_acc.py:55,
SURVEY.md §7.4); here the weight set travels with the Ref object (the intended
behavior), consistent with every other model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import math as m
from ..params import ParamLayout
from .base import ModelSpec, terminal_gate_enabled


def make_model(cfg) -> ModelSpec:
    lim = cfg.robot.limits
    layout = ParamLayout.from_cfg(cfg)
    gate = terminal_gate_enabled(cfg)

    def _split(x):
        p = x[:3]
        q = x[3:7]
        q = q / jnp.linalg.norm(q)
        v = x[7:]
        return p, q, v

    def _wa(u):
        return jnp.stack([u[0] * lim.ax, u[1] * lim.ay, u[2] * lim.az])

    def f(x, u):
        _, q, v = _split(x)
        wz = u[3] * lim.wz
        dq = m.hamilton_prod(q, jnp.stack([0.0 * wz, 0.0 * wz, 0.0 * wz, wz])) / 2
        return jnp.concatenate([v, dq, _wa(u)])

    def f_lanes(x, u):
        """f for (nx, L)/(nu, L) lane-stacked inputs (ops/lin_kernels.py);
        golden-tested against ``f`` (tests/test_ops.py)."""
        qraw = x[3:7]
        inv = jax.lax.rsqrt(jnp.maximum((qraw * qraw).sum(0), 1e-30))
        q0, q1, q2, q3 = qraw[0] * inv, qraw[1] * inv, qraw[2] * inv, qraw[3] * inv
        v = x[7:10]
        h = 0.5 * u[3] * lim.wz
        return jnp.stack(
            [
                v[0], v[1], v[2],
                -h * q3, h * q2, -h * q1, h * q0,
                u[0] * lim.ax, u[1] * lim.ay, u[2] * lim.az,
            ],
            axis=0,
        )

    def y_lanes(x, u, q_d):
        """Stage residual for lane-stacked inputs (ops/lin_kernels.py);
        golden-tested against ``y`` (tests/test_ops.py)."""
        qraw = x[3:7]
        inv = jax.lax.rsqrt(jnp.maximum((qraw * qraw).sum(0), 1e-30))
        q0, q1, q2, q3 = qraw[0] * inv, qraw[1] * inv, qraw[2] * inv, qraw[3] * inv
        s = jax.lax.rsqrt(jnp.maximum(q0 * q0 + q1 * q1 + q2 * q2 + q3 * q3, 1e-30))
        qi0, qi1, qi2, qi3 = q0 * s, -q1 * s, -q2 * s, -q3 * s
        qe3 = q_d[0] * qi3 + q_d[1] * qi2 - q_d[2] * qi1 + q_d[3] * qi0
        return jnp.stack(
            [
                x[0], x[1], x[2], qe3, x[7], x[8], x[9],
                u[0] * lim.ax, u[1] * lim.ay, u[2] * lim.az, u[3] * lim.wz,
            ],
            axis=0,
        )

    def y(x, u, p):
        pos, q, v = _split(x)
        wz = u[3] * lim.wz
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        return jnp.concatenate([pos, q_e[3:4], v, _wa(u), wz[None]])

    def yN(x, p):
        pos, q, v = _split(x)
        q_d = layout.get_q_d(p)
        q_e = m.hamilton_prod(q_d, m.quat_invert(q))
        out = jnp.concatenate([pos, q_e[3:4], v])
        if gate:
            out = out * layout.get_flag(p)
        return out

    def u_to_acc(x, u, p):
        _, q, _ = _split(x)
        W_R_B = m.quat2rot(q)
        wz = u[3] * lim.wz
        return jnp.concatenate([W_R_B.T @ _wa(u), wz[None]])

    def formate_ref(ref, n_extra: int = 0):
        """Intended packing of reference quad_acc.py:54-58 (with the undefined-
        variable bug fixed): weights follow the Ref's active set."""
        yr = np.concatenate([ref.p, [0.0], ref.v, [0.0, 0.0, 0.0], [ref.wz], np.zeros(n_extra)])
        W = np.concatenate(
            [ref.Wp, ref.Wq[2:3], ref.Wv, [ref.Wa, ref.Wa, ref.Wa], [ref.Ww[2]], np.zeros(n_extra)]
        )
        return yr, W

    return ModelSpec(
        name="quad_acc",
        nx=10,
        nu=4,
        ny=11,
        nyN=7,
        f=f,
        y=y,
        yN=yN,
        u_hover=np.zeros(4),
        lbu=np.array([-1.0, -1.0, -1.0, -1.0]),
        ubu=np.array([1.0, 1.0, 1.0, 1.0]),
        formate_ref=formate_ref,
        u_to_acc=u_to_acc,
        f_lanes=f_lanes,
        y_lanes=y_lanes,
        # world-frame velocity (rec-feas hook; state layout p,q,v)
        vel_world=lambda x: x[7:10],
    )
