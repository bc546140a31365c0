"""Explicit Runge-Kutta integrators with per-interval step size.

TPU-native replacement for acados' generated ERK integrator + sensitivity
propagation (reference ocp.py:106 ``integrator_type='ERK'``; SURVEY.md §2.3
N1).  Sensitivities come for free from ``jax.jacfwd`` through the integrator —
no hand-derived variational equations.
"""

from __future__ import annotations

import jax


def erk4(f, x, u, dt):
    """Classic RK4 step of the control-affine ODE xdot = f(x, u).

    dt may be a traced scalar (per-interval steps are solver inputs, matching
    the reference's non-uniform shooting grid, ocp.py:96-97).
    """
    k1 = f(x, u)
    k2 = f(x + 0.5 * dt * k1, u)
    k3 = f(x + 0.5 * dt * k2, u)
    k4 = f(x + dt * k3, u)
    return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)


def erk4_with_sensitivities(f, x, u, dt):
    """(x_next, A, B): step plus exact discrete sensitivities of the RK4 map.

    A = d x_next / d x  (nx, nx),  B = d x_next / d u  (nx, nu).
    Forward-mode is the right tool: nx+nu tangents of a cheap rollout.
    """
    step = lambda x_, u_: erk4(f, x_, u_, dt)
    x_next = step(x, u)
    A = jax.jacfwd(step, argnums=0)(x, u)
    B = jax.jacfwd(step, argnums=1)(x, u)
    return x_next, A, B
