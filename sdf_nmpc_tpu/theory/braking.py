"""Braking-distance analysis: max deceleration per velocity direction, and
polynomial / MLP surrogates of the braking distance.

Reference: scripts/find_amax.py.  The reference solves one IPOPT NLP per grid
velocity (BrakingAccNlp:49-76) in a serial loop; here the same program

    max |a|^2   over (T, roll, pitch) in their boxes
    s.t. a colinear with -v,  a = -g e3 + R(roll, pitch, 0) (0, 0, T/m)

is solved for ALL directions at once by penalty-regularized projected gradient
ascent, vmapped on device.  The surrogate fits:

  * fit_poly: closed-form least squares on the 3-variate monomial basis
    (replaces the IPOPT least-squares of find_amax.py:208-230)
  * fit_mlp:  optax Adam on the tanh MLP (find_amax.py:233-267)

Braking distance: bdist(v) = 0.5 |v|^2 / a_max(v_hat).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..math import GRAVITY, euler2rot, polynomial_3variate_exponents


def _accel(T_m, roll, pitch):
    """World acceleration for mass-normalized thrust + attitude (yaw 0)."""
    R = euler2rot(jnp.stack([roll, pitch, jnp.zeros_like(roll)], axis=-1))
    thrust = jnp.stack([jnp.zeros_like(T_m), jnp.zeros_like(T_m), T_m], axis=-1)
    e3 = jnp.asarray([0.0, 0.0, -GRAVITY])
    return jnp.einsum("...ij,...j->...i", R, thrust) + e3


def max_braking_accel(v_dirs, cfg, iters: int = 60):
    """a_max for each unit velocity direction (N, 3) -> (N,).

    The colinearity constraint is eliminated analytically: a deceleration of
    magnitude s along -vhat requires the mass-normalized thrust vector
    f = g e3 - s vhat, which is feasible iff |f| <= gamma_max and the attitude
    realizing it (roll = asin(-f_y/|f|), pitch = atan2(f_x, f_z) for yaw 0)
    lies in the attitude box.  Feasibility is monotone in s along each
    direction's constraint path, so a fixed-iteration bisection vectorized
    over all directions gives the exact maximum — replacing the reference's
    per-direction IPOPT solves (find_amax.py:49-76) with one jitted program.
    """
    lim = cfg.robot.limits
    gamma_max = float(lim.gamma)
    roll_max, pitch_max = float(lim.roll), float(lim.pitch)
    v_dirs = jnp.asarray(v_dirs, jnp.float64)
    v_dirs = v_dirs / jnp.linalg.norm(v_dirs, axis=-1, keepdims=True)

    e3g = jnp.asarray([0.0, 0.0, GRAVITY])

    def feasible(s, vhat):
        f = e3g - s[..., None] * vhat
        T = jnp.linalg.norm(f, axis=-1)
        safe_T = jnp.maximum(T, 1e-9)
        fhat = f / safe_T[..., None]
        roll = jnp.arcsin(jnp.clip(-fhat[..., 1], -1.0, 1.0))
        pitch = jnp.arctan2(fhat[..., 0], fhat[..., 2])
        att_ok = (jnp.abs(roll) <= roll_max) & (jnp.abs(pitch) <= pitch_max)
        # T ~ 0 (free fall) is feasible with any attitude
        return (T <= gamma_max) & (att_ok | (T < 1e-6))

    def run(vhat):
        lo = jnp.asarray(0.0, jnp.float64)
        hi = jnp.asarray(gamma_max + GRAVITY, jnp.float64)

        def body(i, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            ok = feasible(mid, vhat)
            return (jnp.where(ok, mid, lo), jnp.where(ok, hi, mid))

        lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
        return lo

    amax = jax.jit(jax.vmap(run))(v_dirs)
    return np.asarray(amax)


def braking_grid(cfg, vmax: float = 3.0, step: float = 0.05):
    """(vel, bdist) over the ball grid |v| < vmax (find_amax.py:159-186)."""
    v = np.arange(-vmax, vmax + 0.01, step)
    vel = np.stack(np.meshgrid(v, v, v, indexing="ij"), axis=-1).reshape(-1, 3)
    vel = vel[np.linalg.norm(vel, axis=1) < vmax]
    vel = vel[np.linalg.norm(vel, axis=1) > 1e-9]
    vhat = vel / np.linalg.norm(vel, axis=1, keepdims=True)
    amax = max_braking_accel(vhat, cfg)
    norms = np.linalg.norm(vel, axis=1)
    bdist = np.where(amax > 1e-8, 0.5 * norms**2 / np.maximum(amax, 1e-8), 0.0)
    return vel, bdist, amax


def min_braking_accel(vel, bdist):
    """a_b_min over a grid result (find_amax.py:189-196) — feeds
    cfg.mpc.stability.a_b_min."""
    idx = bdist > 1e-8
    return float(np.min(np.linalg.norm(vel[idx], axis=1) ** 2 / 2 / bdist[idx]))


def fit_poly(vel, bdist, degree: int = 4):
    """Least-squares 3-variate polynomial coefficients (closed form)."""
    exps = polynomial_3variate_exponents(degree)
    design = np.prod(vel[:, None, :] ** exps[None], axis=-1)  # (N, n_terms)
    coeffs, *_ = np.linalg.lstsq(design, bdist, rcond=None)
    return coeffs


def eval_surrogate(poly_fn, vel, bdist):
    """(rmse, max_err) of a surrogate on grid data (find_amax.py:269-290)."""
    pred = np.asarray(jax.vmap(poly_fn)(jnp.asarray(vel)))
    err = pred.flatten() - bdist
    return float(np.sqrt(np.mean(err**2))), float(np.max(np.abs(err)))


def fit_mlp(vel, bdist, layer_sizes=(20, 20, 20), epochs: int = 200,
            batch_size: int = 256, lr: float = 1e-3, seed: int = 0):
    """tanh-MLP surrogate trained with Adam (find_amax.py:233-267)."""
    import optax

    from ..nn.mlp import Mlp

    module = Mlp(size_out=1, layer_sizes=list(layer_sizes), inner_act=jnp.tanh)
    params = module.init(jax.random.PRNGKey(seed), jnp.zeros(3))
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    x = jnp.asarray(vel, jnp.float32)
    y = jnp.asarray(bdist, jnp.float32)[:, None]

    @jax.jit
    def train_step(params, opt_state, xb, yb):
        def loss_fn(p):
            return jnp.mean((module.apply(p, xb) - yb) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = x.shape[0]
    rng = np.random.default_rng(seed)
    loss = None
    for _ in range(epochs):
        order = rng.permutation(n)
        for i in range(0, n, batch_size):
            sl = order[i : i + batch_size]
            params, opt_state, loss = train_step(params, opt_state, x[sl], y[sl])
    return module, params, float(loss)
