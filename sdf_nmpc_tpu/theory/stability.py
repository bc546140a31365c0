"""Stability terminal-cost constant r-tilde.

Reference: sdf_nmpc/utils/stability.py — it derives r_tilde symbolically with
sympy (symbolic_r_tilde:6-41) and maximizes it over the input box with a
random-start scipy SLSQP (get_r_tilde_max:44-75).

The sympy inequality  input_cost_bound - input_cost = 0  is linear in
r_tilde, so the closed form is simply

    r_tilde(T, phi, theta) = (U' R U) / (dt^2 |T * R(phi,theta) e3 - g e3|^2)

with U = [T - g, phi, theta] and R = diag(acc_w, att_w0, att_w1).  We maximize
it deterministically: dense jnp grid over the box, then a local gradient-ascent
polish — reproducible where the reference's random start is not.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..math import GRAVITY


def r_tilde_value(T, phi, theta, *, g, dt, r1, r2, r3):
    """Closed-form r_tilde (the single root of the reference's sympy solve)."""
    # body z-axis in world frame for (roll=phi, pitch=theta, yaw=0):
    Re3 = jnp.stack(
        [
            jnp.sin(theta) * jnp.cos(phi),
            -jnp.sin(phi),
            jnp.cos(theta) * jnp.cos(phi),
        ],
        axis=-1,
    )
    U_tilde = T[..., None] * Re3 - jnp.asarray([0.0, 0.0, g])
    denom = dt**2 * jnp.sum(U_tilde**2, axis=-1)
    num = r1 * (T - g) ** 2 + r2 * phi**2 + r3 * theta**2
    return num / jnp.maximum(denom, 1e-12)


def get_r_tilde_max(cfg, grid_n: int = 96, polish_iters: int = 200, lr: float = 1e-3) -> float:
    """Maximum of r_tilde over the thrust/attitude box (reference
    get_r_tilde_max:44-75), deterministic grid + ascent polish."""
    g = GRAVITY
    dt = cfg.mpc.T / cfg.mpc.N
    wts = cfg.mpc.weights.set_const_off
    r1, r2, r3 = float(wts.acc), float(wts.att[0]), float(wts.att[1])
    lim = cfg.robot.limits
    T_lo, T_hi = 0.0, float(lim.gamma)
    phi_m, theta_m = float(lim.roll), float(lim.pitch)

    kw = dict(g=g, dt=dt, r1=r1, r2=r2, r3=r3)
    Ts = jnp.linspace(T_lo, T_hi, grid_n)
    phis = jnp.linspace(-phi_m, phi_m, grid_n)
    thetas = jnp.linspace(-theta_m, theta_m, grid_n)
    Tg, Pg, Hg = jnp.meshgrid(Ts, phis, thetas, indexing="ij")
    vals = r_tilde_value(Tg.ravel(), Pg.ravel(), Hg.ravel(), **kw)
    best = jnp.argmax(vals)
    x = jnp.stack([Tg.ravel()[best], Pg.ravel()[best], Hg.ravel()[best]])

    neg = lambda x: -r_tilde_value(x[0], x[1], x[2], **kw)
    grad = jax.grad(neg)

    lo = jnp.asarray([T_lo, -phi_m, -theta_m])
    hi = jnp.asarray([T_hi, phi_m, theta_m])

    def body(i, x):
        return jnp.clip(x - lr * grad(x), lo, hi)

    x = jax.lax.fori_loop(0, polish_iters, body, x)
    return float(r_tilde_value(x[0], x[1], x[2], **kw))
