"""Batched condensed-QP solver: Mehrotra predictor-corrector interior point
with analytic slack elimination (HPIPM's soft-constraint structure).

TPU-native replacement for FULL_CONDENSING_HPIPM (reference ocp.py:113-116;
SURVEY.md §2.3 N2).  Design points driven by the hardware:

  * fixed iteration budget, no early exit — every scenario in a vmapped batch
    runs the same instruction stream; convergence is reported, not branched on
  * the slack/dual blocks of the KKT system are diagonal per constraint row and
    eliminate in closed form each Newton step (exactly as HPIPM does), so the
    only linear solve is one dense (nz, nz) Cholesky per iteration; over a
    vmapped scenario batch these become batched GEMMs/Cholesky on the MXU
  * Mehrotra predictor-corrector: the factorization is computed ONCE per
    iteration and reused for the affine and the corrected directions, with the
    centering parameter sigma = (mu_aff/mu)^3 chosen adaptively — roughly
    halving the iterations needed vs fixed-sigma path following (the
    factorization dominates the per-iteration cost on TPU)

Problem (one scenario; all data comes from the condensing stage):

    min_{z,s}  0.5 z'Hz + g'z + sum_i z1_i (sl_i + su_i)
                                + 0.5 z2_i (sl_i^2 + su_i^2)
    s.t.  lh - sl <= c0 + C z <= uh + su,   sl, su >= 0,   lb <= z <= ub

which is acados' slacked nonlinear-constraint QP after condensing
(zl/Zl/zu/Zu semantics of reference ocp.py:85-92 with zu=zl, Zu=Zl).  Hard
rows are represented with large (z1, z2) — see sdf_nmpc_tpu/ocp.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .linalg import spd_factor_batched, spd_factor_solve

_BIG = 1e8  # stand-in for infinite bounds (keeps IEEE arithmetic finite)


class QpData(NamedTuple):
    """One condensed QP (add leading batch axes via vmap)."""

    H: jax.Array  # (nz, nz) Hessian (PSD; includes LM regularization)
    g: jax.Array  # (nz,)
    C: jax.Array  # (nc, nz) general-constraint rows (may be nc=0)
    c0: jax.Array  # (nc,) row values at z=0
    lh: jax.Array  # (nc,) lower bounds
    uh: jax.Array  # (nc,) upper bounds
    z1: jax.Array  # (nc,) L1 slack penalty weights
    z2: jax.Array  # (nc,) L2 slack penalty weights
    lb: jax.Array  # (nz,) box lower
    ub: jax.Array  # (nz,) box upper


class QpDuals(NamedTuple):
    """Full interior-point state for warm starting the next (re-linearized)
    QP: slacks + all six dual families.  Row structure is tick-invariant, so
    carrying these across RTI ticks lets a small iteration budget re-converge
    a slightly-changed QP (acados qp_solver_warm_start=2 analogue)."""

    sl: jax.Array
    su: jax.Array
    lam_l: jax.Array
    lam_u: jax.Array
    gam_l: jax.Array
    gam_u: jax.Array
    nu_l: jax.Array
    nu_u: jax.Array


class QpResult(NamedTuple):
    dz: jax.Array  # (nz,)
    kkt_residual: jax.Array  # scalar inf-norm of primal stationarity
    complementarity: jax.Array  # scalar final average complementarity
    duals: QpDuals = None


def _mu_of(qp, lh, uh, dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, n_terms):
    w = qp.c0 + qp.C @ dz
    total = jnp.dot(dz - qp.lb, nu_l) + jnp.dot(qp.ub - dz, nu_u)
    if qp.c0.shape[0]:
        total = total + (
            jnp.dot(w + sl - lh, lam_l)
            + jnp.dot(uh + su - w, lam_u)
            + jnp.dot(sl, gam_l)
            + jnp.dot(su, gam_u)
        )
    return total / n_terms


def solve_qp(
    qp: QpData,
    iters: int = 8,
    mu0: float = 0.1,
    box_margin: float = 1e-6,
    eps_min: float = 0.0,  # kept for call compatibility; unused
    chol_impl: str = "auto",
    warm_duals: QpDuals = None,
) -> QpResult:
    """Solve one condensed QP (`iters` predictor-corrector iterations).
    vmap over a leading batch axis for scenarios.

    chol_impl: 'custom' (batch-first blocked factorization, solver/linalg.py),
    'xla' (jnp.linalg), or 'auto' (custom on TPU — where XLA's batched
    Cholesky measured 72% of the whole RTI step — XLA elsewhere, where its
    factorization is fine and the unrolled custom path only inflates compile
    time)."""
    del eps_min
    if chol_impl == "auto":
        chol_impl = "custom" if jax.default_backend() == "tpu" else "xla"
    use_custom = chol_impl == "custom" 
    nz = qp.g.shape[0]
    nc = qp.c0.shape[0]
    dtype = qp.g.dtype
    eye = jnp.eye(nz, dtype=dtype)

    lh = jnp.maximum(qp.lh, -_BIG)
    uh = jnp.minimum(qp.uh, _BIG)
    z1 = qp.z1
    z2 = qp.z2

    width = qp.ub - qp.lb
    dz = jnp.clip(
        jnp.zeros(nz, dtype),
        qp.lb + box_margin * (1 + width),
        qp.ub - box_margin * (1 + width),
    )
    mu = jnp.asarray(mu0, dtype)
    tau = jnp.asarray(0.995, dtype)
    # floors keeping divisions away from underflow for the dtype
    mu_min = jnp.asarray(1e3 * jnp.finfo(dtype).eps, dtype)
    p_floor = mu_min * 1e-2
    d_floor = jnp.asarray(1e-14, dtype)
    # cap on dual/slack ratios entering the Schur complement: active rows with
    # large penalty duals otherwise push the Newton-matrix condition number
    # past what the dtype can factorize (f32 especially)
    ratio_cap = jnp.asarray(0.1 / jnp.finfo(dtype).eps, dtype)
    n_terms = 2 * nz + 4 * nc

    w0 = qp.c0 + qp.C @ dz
    if warm_duals is None:
        sl = jnp.maximum(lh - w0, 0.0) + 0.1
        su = jnp.maximum(w0 - uh, 0.0) + 0.1
        lam_l = mu / (w0 + sl - lh)
        lam_u = mu / (uh + su - w0)
        gam_l = mu / sl
        gam_u = mu / su
        nu_l = mu / (dz - qp.lb)
        nu_u = mu / (qp.ub - dz)
    else:
        # previous tick's IP state; re-feasibilize slacks against the new rows
        # and floor everything strictly positive
        d = warm_duals
        sl = jnp.maximum(jnp.maximum(d.sl, lh - w0 + 1e-6), p_floor)
        su = jnp.maximum(jnp.maximum(d.su, w0 - uh + 1e-6), p_floor)
        lam_l = jnp.maximum(d.lam_l, d_floor)
        lam_u = jnp.maximum(d.lam_u, d_floor)
        gam_l = jnp.maximum(d.gam_l, d_floor)
        gam_u = jnp.maximum(d.gam_u, d_floor)
        nu_l = jnp.maximum(d.nu_l, d_floor)
        nu_u = jnp.maximum(d.nu_u, d_floor)
        mu = jnp.maximum(
            _mu_of(qp, lh, uh, dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u,
                   n_terms),
            mu_min,
        )

    def _max_step(v, dv):
        """Largest alpha with v + alpha*dv > 0 (elementwise min)."""
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.min(ratio) if ratio.size else jnp.asarray(jnp.inf, v.dtype)

    def _compl(dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u):
        return _mu_of(qp, lh, uh, dz, sl, su, lam_l, lam_u, gam_l, gam_u,
                      nu_l, nu_u, n_terms)

    def body(carry, _):
        dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu = carry

        w = qp.c0 + qp.C @ dz
        tl = w + sl - lh
        tu = uh + su - w
        bl = dz - qp.lb
        bu = qp.ub - dz

        # residuals of the KKT stationarity rows
        r_z = qp.H @ dz + qp.g - qp.C.T @ (lam_l - lam_u) - nu_l + nu_u
        r_sl = z1 + z2 * sl - lam_l - gam_l
        r_su = z1 + z2 * su - lam_u - gam_u

        # Schur coefficients (shared by both directions)
        ql = jnp.minimum(lam_l / tl, ratio_cap)
        qu = jnp.minimum(lam_u / tu, ratio_cap)
        pl = jnp.minimum(gam_l / sl, ratio_cap)
        pu = jnp.minimum(gam_u / su, ratio_cap)
        d_l = z2 + ql + pl
        d_u = z2 + qu + pu
        eta_l = ql * (z2 + pl) / d_l
        eta_u = qu * (z2 + pu) / d_u
        rbl = jnp.minimum(nu_l / bl, ratio_cap)
        rbu = jnp.minimum(nu_u / bu, ratio_cap)

        M = qp.H + (qp.C.T * (eta_l + eta_u)) @ qp.C + jnp.diag(rbl + rbu)
        jitter = 10 * jnp.finfo(dtype).eps * (1.0 + jnp.max(jnp.diag(M)))
        if use_custom:
            L, n_orig = spd_factor_batched(M + jitter * eye)
        else:
            L, n_orig = jnp.linalg.cholesky(M + jitter * eye), nz

        def direction(m_tl, m_tu, m_sl, m_su, m_bl, m_bu):
            """Newton direction for given per-pair complementarity targets.
            Reuses the factorization L (rhs-only changes)."""
            a_l = m_tl / tl - lam_l
            a_u = m_tu / tu - lam_u
            b_l = -r_sl + a_l + m_sl / sl - gam_l
            b_u = -r_su + a_u + m_su / su - gam_u
            const_l = a_l - ql * b_l / d_l
            const_u = a_u - qu * b_u / d_u
            rhs = (
                -r_z
                + qp.C.T @ (const_l - const_u)
                + (m_bl / bl - nu_l)
                - (m_bu / bu - nu_u)
            )
            if use_custom:
                ddz = spd_factor_solve(L, n_orig, rhs)
            else:
                ddz = jax.scipy.linalg.cho_solve((L, True), rhs)
            ddz = jnp.where(jnp.all(jnp.isfinite(ddz)), ddz, jnp.zeros_like(ddz))
            dw = qp.C @ ddz
            dsl = (b_l - ql * dw) / d_l
            dsu = (b_u + qu * dw) / d_u
            dlam_l = a_l - ql * (dw + dsl)
            dlam_u = a_u - qu * (dsu - dw)
            dgam_l = (m_sl - gam_l * sl) / sl - pl * dsl
            dgam_u = (m_su - gam_u * su) / su - pu * dsu
            dnu_l = (m_bl - nu_l * bl) / bl - rbl * ddz
            dnu_u = (m_bu - nu_u * bu) / bu + rbu * ddz
            return ddz, dw, dsl, dsu, dlam_l, dlam_u, dgam_l, dgam_u, dnu_l, dnu_u

        def step_len(d, frac):
            ddz, dw, dsl, dsu, dlam_l, dlam_u, dgam_l, dgam_u, dnu_l, dnu_u = d
            return jnp.minimum(1.0, frac * jnp.minimum(
                jnp.minimum(
                    jnp.minimum(_max_step(sl, dsl), _max_step(su, dsu)),
                    jnp.minimum(_max_step(tl, dw + dsl), _max_step(tu, dsu - dw)),
                ),
                jnp.minimum(
                    jnp.minimum(
                        jnp.minimum(_max_step(lam_l, dlam_l), _max_step(lam_u, dlam_u)),
                        jnp.minimum(_max_step(gam_l, dgam_l), _max_step(gam_u, dgam_u)),
                    ),
                    jnp.minimum(
                        jnp.minimum(_max_step(nu_l, dnu_l), _max_step(nu_u, dnu_u)),
                        jnp.minimum(_max_step(bl, ddz), _max_step(bu, -ddz)),
                    ),
                ),
            ))

        zero_c = jnp.zeros_like(sl)
        zero_z = jnp.zeros_like(dz)

        # ---- predictor: pure Newton (affine) direction ----
        aff = direction(zero_c, zero_c, zero_c, zero_c, zero_z, zero_z)
        alpha_aff = step_len(aff, 1.0)
        (adz, adw, adsl, adsu, adlam_l, adlam_u, adgam_l, adgam_u, adnu_l, adnu_u) = aff

        mu_cur = _compl(dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u)
        mu_aff = _compl(
            dz + alpha_aff * adz,
            sl + alpha_aff * adsl,
            su + alpha_aff * adsu,
            lam_l + alpha_aff * adlam_l,
            lam_u + alpha_aff * adlam_u,
            gam_l + alpha_aff * adgam_l,
            gam_u + alpha_aff * adgam_u,
            nu_l + alpha_aff * adnu_l,
            nu_u + alpha_aff * adnu_u,
        )
        sigma = jnp.clip((jnp.maximum(mu_aff, 0.0) / jnp.maximum(mu_cur, d_floor)) ** 3, 1e-4, 1.0)
        mu_t = jnp.maximum(sigma * mu_cur, mu_min)

        # ---- corrector: centering + second-order complementarity terms ----
        corr = direction(
            mu_t - adlam_l * (adw + adsl),
            mu_t - adlam_u * (adsu - adw),
            mu_t - adgam_l * adsl,
            mu_t - adgam_u * adsu,
            mu_t - adnu_l * adz,
            mu_t + adnu_u * adz,
        )
        alpha = step_len(corr, tau)
        (ddz, dw, dsl, dsu, dlam_l, dlam_u, dgam_l, dgam_u, dnu_l, dnu_u) = corr

        dz = dz + alpha * ddz
        sl = jnp.maximum(sl + alpha * dsl, p_floor)
        su = jnp.maximum(su + alpha * dsu, p_floor)
        lam_l = jnp.maximum(lam_l + alpha * dlam_l, d_floor)
        lam_u = jnp.maximum(lam_u + alpha * dlam_u, d_floor)
        gam_l = jnp.maximum(gam_l + alpha * dgam_l, d_floor)
        gam_u = jnp.maximum(gam_u + alpha * dgam_u, d_floor)
        nu_l = jnp.maximum(nu_l + alpha * dnu_l, d_floor)
        nu_u = jnp.maximum(nu_u + alpha * dnu_u, d_floor)

        mu = jnp.maximum(_compl(dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u), mu_min)
        return (dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu), None

    carry0 = (dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu)
    (dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu), _ = jax.lax.scan(
        body, carry0, None, length=iters
    )

    stationarity = qp.H @ dz + qp.g - qp.C.T @ (lam_l - lam_u) - nu_l + nu_u
    kkt = jnp.max(jnp.abs(stationarity))
    return QpResult(
        dz=dz, kkt_residual=kkt, complementarity=mu,
        duals=QpDuals(sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u),
    )
