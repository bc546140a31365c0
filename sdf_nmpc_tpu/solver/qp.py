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

from .linalg import spd_factor_batched, spd_factor_solve, spd_factor_solve_mrhs

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


def _merit(qp, lh, uh, z):
    """Exact penalized objective at z (slacks analytically minimized):
    F(z) = 0.5 z'Hz + g'z + sum_i z1_i v_i + 0.5 z2_i v_i^2 per side, with
    v = constraint violation.  Box bounds are hard: evaluate at the projected
    point and add an exact-penalty distance so off-box iterates always lose."""
    zc = jnp.clip(z, qp.lb, qp.ub)
    f = 0.5 * zc @ (qp.H @ zc) + qp.g @ zc
    if qp.c0.shape[0]:
        w = qp.c0 + qp.C @ zc
        vl = jnp.maximum(lh - w, 0.0)
        vu = jnp.maximum(w - uh, 0.0)
        f = f + jnp.sum(qp.z1 * (vl + vu) + 0.5 * qp.z2 * (vl**2 + vu**2))
    return f + _BIG * jnp.sum(jnp.abs(z - zc))


def _mu_of(qp, lh, uh, w, dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, n_terms):
    """Average complementarity.  w = c0 + C @ dz is passed in — every caller
    already holds it (or an exact linear update of it), so no matvec here."""
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
    ir_steps: int = 1,
    compute_dtype=None,
    ratio_cap_override: float = None,
    k_stiff: int = 16,
    stiff_iters: int = None,
) -> QpResult:
    """Solve one condensed QP (`iters` predictor-corrector iterations).
    vmap over a leading batch axis for scenarios.

    chol_impl: 'custom' (batch-first blocked factorization, solver/linalg.py),
    'xla' (jnp.linalg), or 'auto' (custom on TPU — where XLA's batched
    Cholesky measured 72% of the whole RTI step — XLA elsewhere, where its
    factorization is fine and the unrolled custom path only inflates compile
    time).

    ir_steps: iterative-refinement sweeps on each Newton solve.  The soft-
    constraint penalty weights push cond(M) to where an f32 factorization
    alone costs ~5e-3 absolute u0 error (measured; the rest of the pipeline
    in f32 contributes only ~2e-6).  Each sweep is one (nz,nz) matvec + one
    reused-factor solve — O(n^2), noise next to the O(n^3) factorization —
    and drops the floor by ~an order of magnitude per sweep.

    compute_dtype: numerics-attribution hook — if set, the IP vector
    arithmetic (residuals, gaps, Schur coefficients, updates) runs in this
    dtype while the factorization+solve stay in the data dtype.  Used by
    attribution experiments (docs/performance.md); None for production."""
    del eps_min
    if chol_impl == "auto":
        # fused = whole-iteration IP kernel (ops/ip_kernel.py): the entire
        # Mehrotra iteration runs VMEM-resident, 22.8k -> 28.6k solves/s over
        # the composed per-piece kernels at production batch
        # (docs/performance.md).  Unsupported configurations (f64, warm
        # duals, ir_steps) fall back to the composed 'pallas' path
        # below, and unbatched (B=1) calls take the custom_vmap primal —
        # XLA Cholesky, the B=1 winner — so 'fused' is safe at every batch.
        chol_impl = "fused" if jax.default_backend() == "tpu" else "xla"
    if chol_impl == "fused":
        # whole-iteration fused IP kernel (ops/ip_kernel.py): covers the
        # production configuration; anything else falls back to the composed
        # pallas path below
        n_stiff_req = min(stiff_iters if stiff_iters is not None else iters,
                          iters)
        supported = (
            jnp.dtype(qp.g.dtype) == jnp.float32
            and warm_duals is None
            and compute_dtype is None
            and ir_steps == 0
            and qp.c0.shape[0] > 0
            # the fused kernel's stiff pass needs 8-aligned k (sublane
            # tiling) AND k <= nc: its argmax-and-mask top-k would select
            # duplicate rows once all nc rows are masked, silently corrupting
            # the Woodbury correction — the composed path clamps to
            # min(k_stiff, nc) and handles arbitrary k via the XLA
            # small-Cholesky fallback, so any other split falls back to it
            and (n_stiff_req == 0
                 or (k_stiff % 8 == 0 and qp.c0.shape[0] >= k_stiff))
        )
        if supported:
            from ..ops.ip_kernel import make_fused_solve

            fused = make_fused_solve(
                iters=iters,
                n_warm=iters - n_stiff_req if k_stiff > 0 else iters,
                k_stiff=k_stiff,
                mu0=mu0,
                box_margin=box_margin,
                ratio_cap_override=ratio_cap_override,
            )
            dz_f, kkt_f, mu_f, *duals_f = fused(
                qp.H, qp.g, qp.C, qp.c0, qp.lh, qp.uh, qp.z1, qp.z2,
                qp.lb, qp.ub,
            )
            return QpResult(
                dz=dz_f,
                kkt_residual=kkt_f,
                complementarity=mu_f,
                duals=QpDuals(*duals_f),
            )
        chol_impl = "pallas"
    use_custom = chol_impl == "custom"
    if chol_impl == "pallas" and jnp.dtype(qp.g.dtype) == jnp.float64:
        chol_impl = "xla"  # the lanes kernels are f32; keep f64 runs exact
    if chol_impl == "pallas":
        from ..ops.qp_kernels import (
            newton_factor_solve,
            newton_resolve,
            stiff_factor_solve,
            stiff_resolve,
        )
    factor_dtype = qp.g.dtype
    if compute_dtype is not None:
        qp = QpData(*[jnp.asarray(v, compute_dtype) for v in qp])
        if warm_duals is not None:
            warm_duals = QpDuals(*[jnp.asarray(v, compute_dtype) for v in warm_duals])
    nz = qp.g.shape[0]
    nc = qp.c0.shape[0]
    dtype = qp.g.dtype

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
    # floors keeping divisions away from underflow for the dtype (the stiff-
    # row split tolerates much smaller gaps than a capped Schur form did)
    mu_min = jnp.asarray(32 * jnp.finfo(dtype).eps, dtype)
    p_floor = mu_min * 1e-2
    d_floor = jnp.asarray(1e-14, dtype)
    # cap on dual/slack ratios entering the Schur complement: active rows with
    # large penalty duals otherwise push the Newton-matrix condition number
    # past what the dtype can factorize (f32 especially)
    ratio_cap = jnp.asarray(
        0.1 / jnp.finfo(dtype).eps if ratio_cap_override is None else ratio_cap_override,
        dtype,
    )
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
            _mu_of(qp, lh, uh, w0, dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l,
                   nu_u, n_terms),
            mu_min,
        )

    def _max_step(v, dv):
        """Largest alpha with v + alpha*dv > 0 (elementwise min)."""
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.min(ratio) if ratio.size else jnp.asarray(jnp.inf, v.dtype)

    def _compl(w, dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u):
        return _mu_of(qp, lh, uh, w, dz, sl, su, lam_l, lam_u, gam_l, gam_u,
                      nu_l, nu_u, n_terms)

    def make_body(k_stiff_eff: int, emit_dz: bool = False):
      def body(carry, it_idx):
        (dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu,
         best_dz, best_m) = carry
        k_stiff = k_stiff_eff

        # gaps below their own floating-point cancellation noise are
        # meaningless — flooring there (not at `tiny`) keeps the barrier
        # ratios finite AND faithful to what the dtype can actually resolve
        eps = jnp.finfo(dtype).eps
        w = qp.c0 + qp.C @ dz
        tl = jnp.maximum(w + sl - lh, 4 * eps * (1.0 + jnp.abs(w) + sl))
        tu = jnp.maximum(uh + su - w, 4 * eps * (1.0 + jnp.abs(w) + su))
        bl = jnp.maximum(dz - qp.lb, 4 * eps * (1.0 + jnp.abs(dz)))
        bu = jnp.maximum(qp.ub - dz, 4 * eps * (1.0 + jnp.abs(dz)))

        # residuals of the KKT stationarity rows
        Hdz = qp.H @ dz
        r_z = Hdz + qp.g - qp.C.T @ (lam_l - lam_u) - nu_l + nu_u
        r_sl = z1 + z2 * sl - lam_l - gam_l
        r_su = z1 + z2 * su - lam_u - gam_u

        # best-iterate tracking at body ENTRY: the exact penalized objective
        # from products already in hand (Hdz, w) — no extra matvecs.  The
        # iterate is always strictly inside the box (step fractions + floors),
        # so _merit's exact-penalty box term is identically zero here.  The
        # final iterate is scored once after the scan; the initial point
        # (it_idx 0) is excluded, so the candidate set is exactly the
        # end-of-body tracking's {dz_1..dz_iters} — scoring the zero step too
        # measurably degrades warm ticks (merit noise picks it over the
        # converged step).
        vl = jnp.maximum(lh - w, 0.0)
        vu = jnp.maximum(w - uh, 0.0)
        m_cur = (
            0.5 * jnp.dot(dz, Hdz)
            + jnp.dot(qp.g, dz)
            + jnp.sum(z1 * (vl + vu) + 0.5 * z2 * (vl**2 + vu**2))
        )
        better = (m_cur < best_m) & (it_idx > 0)
        best_dz = jnp.where(better, dz, best_dz)
        best_m = jnp.where(better, m_cur, best_m)

        # ---- stiff-row split ----
        # Newton matrix M = H + C'·diag(eta)·C + diag(rb).  Near-active rows
        # drive eta -> lam/gap ~ 1/mu^2-scale; folding them into M makes its
        # f32 factorization meaningless (measured: the entire f32 accuracy
        # floor of the solver, docs/performance.md).  Instead the k_stiff
        # largest-eta rows are EXCLUDED from the factored matrix A and applied
        # exactly through the Woodbury identity
        #   M^-1 b = A^-1 b - A^-1 Cs' T^-1 Cs A^-1 b,
        #   T = diag(1/eta_s) + Cs A^-1 Cs'
        # (the well-conditioned augmented-KKT form of the same system): A's
        # conditioning is bounded by the (k_stiff+1)-th eta and T's by
        # cond(A)-scale — both f32-friendly regardless of how active the
        # stiff rows get.  Mild (non-selected) rows keep the ratio_cap
        # backstop, applied to the RATIOS so the Newton system stays
        # self-consistent (matrix, rhs and recovery all see the same
        # coefficients).  Stiff BOX ratios are left exact: they only enlarge
        # diagonal entries, which is benign for a Cholesky factorization.
        ql_raw = lam_l / tl
        qu_raw = lam_u / tu
        pl_raw = gam_l / sl
        pu_raw = gam_u / su

        def _eta_of(ql_, qu_, pl_, pu_):
            d_l_ = z2 + ql_ + pl_
            d_u_ = z2 + qu_ + pu_
            return ql_ * (z2 + pl_) / d_l_ + qu_ * (z2 + pu_) / d_u_

        k_s = min(k_stiff, nc)
        if k_s > 0:
            eta_raw = _eta_of(ql_raw, qu_raw, pl_raw, pu_raw)
            _, sidx = jax.lax.top_k(eta_raw, k_s)
            stiff = jnp.zeros((nc,), bool).at[sidx].set(True)
            Cs = qp.C[sidx]  # (k_s, nz)
            cap = jnp.where(stiff, jnp.inf, ratio_cap)
        else:
            cap = ratio_cap
        ql = jnp.minimum(ql_raw, cap)
        qu = jnp.minimum(qu_raw, cap)
        pl = jnp.minimum(pl_raw, cap)
        pu = jnp.minimum(pu_raw, cap)
        d_l = z2 + ql + pl
        d_u = z2 + qu + pu
        eta_l = ql * (z2 + pl) / d_l
        eta_u = qu * (z2 + pu) / d_u
        eta = eta_l + eta_u
        rbl = nu_l / bl
        rbu = nu_u / bu
        rb = rbl + rbu

        if k_s > 0:
            d_s = eta[sidx]  # exact (uncapped) stiff coefficients
            eta_mild = jnp.where(stiff, 0.0, eta)
        else:
            eta_mild = eta
        if nc:
            A = qp.H + (qp.C.T * eta_mild) @ qp.C + jnp.diag(rb)
        else:
            A = qp.H + jnp.diag(rb)
        # relative jitter: scale-invariant, does not drown mild rows when the
        # diagonal carries huge (benign) box entries
        diagA = jnp.diag(A)
        A = A + jnp.diag(10 * jnp.finfo(factor_dtype).eps * (jnp.abs(diagA) + 1.0))
        def _coeffs(m_tl, m_tu, m_sl, m_su):
            a_l = m_tl / tl - lam_l
            a_u = m_tu / tu - lam_u
            b_l = -r_sl + a_l + m_sl / sl - gam_l
            b_u = -r_su + a_u + m_su / su - gam_u
            return a_l, a_u, b_l, b_u

        def _rhs_of(m_tl, m_tu, m_sl, m_su, m_bl, m_bu):
            a_l, a_u, b_l, b_u = _coeffs(m_tl, m_tu, m_sl, m_su)
            const_l = a_l - ql * b_l / d_l
            const_u = a_u - qu * b_u / d_u
            return (
                -r_z
                + qp.C.T @ (const_l - const_u)
                + (m_bl / bl - nu_l)
                - (m_bu / bu - nu_u)
            )

        def _recover(ddz, m_tl, m_tu, m_sl, m_su, m_bl, m_bu):
            a_l, a_u, b_l, b_u = _coeffs(m_tl, m_tu, m_sl, m_su)
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

        # ---- stacked factor + solves ----
        # The predictor rhs and the Woodbury columns Cs' are both known before
        # the factorization, so ONE factor+multi-solve covers them (on the
        # pallas backend this is a single VMEM-resident kernel pass); the
        # corrector reuses the factor through solve_more.
        zero_c = jnp.zeros_like(sl)
        zero_z = jnp.zeros_like(dz)
        aff_t = (zero_c, zero_c, zero_c, zero_c, zero_z, zero_z)
        rhs_aff = _rhs_of(*aff_t)

        Af = jnp.asarray(A, factor_dtype)
        fused_stiff = chol_impl == "pallas" and k_s > 0 and k_s % 8 == 0
        if fused_stiff:
            # the ENTIRE stiff solve — factor A, Woodbury columns, T build +
            # factor, correction — runs as one fused lanes-kernel pass
            # (ops/qp_kernels.py stiff_factor_solve); the composed form paid
            # XLA-side batched small GEMMs (T build, Cs@x, Xs'y per apply)
            # with pad-to-MXU-tile HBM traffic (docs/performance.md)
            d_s_inv = jnp.minimum(1.0 / jnp.maximum(d_s, 1e-30), 1e30)
            Cs_f = jnp.asarray(Cs, factor_dtype)
            X1, sf_handle = stiff_factor_solve(
                Af,
                jnp.asarray(rhs_aff[None], factor_dtype),
                Cs_f,
                jnp.asarray(d_s_inv, factor_dtype),
            )
            X1 = X1.astype(dtype)
            solve_more = lambda R: stiff_resolve(
                *sf_handle, Cs_f, jnp.asarray(R, factor_dtype)
            ).astype(dtype)
            woodbury = lambda x: x
        else:
            RHS1 = rhs_aff[None]
            if k_s > 0:
                RHS1 = jnp.concatenate([RHS1, Cs], axis=0)
            RHS1 = jnp.asarray(RHS1, factor_dtype)
            if chol_impl == "pallas":
                X1, Lh = newton_factor_solve(Af, RHS1)
                solve_more = lambda R: newton_resolve(
                    Lh, jnp.asarray(R, factor_dtype)
                ).astype(dtype)
                X1 = X1.astype(dtype)
            elif use_custom:
                fac, n_orig = spd_factor_batched(Af)

                def solve_more(R):
                    Rf = jnp.asarray(R, factor_dtype)
                    if R.shape[0] == 1:  # vector path: lane ops, no k=1 GEMMs
                        return spd_factor_solve(fac, n_orig, Rf[0])[None].astype(
                            dtype
                        )
                    return spd_factor_solve_mrhs(fac, n_orig, Rf.T).T.astype(dtype)

                X1 = solve_more(RHS1)
            else:
                Lx = jnp.linalg.cholesky(Af)
                solve_more = lambda R: jax.scipy.linalg.cho_solve(
                    (Lx, True), jnp.asarray(R, factor_dtype).T
                ).T.astype(dtype)
                X1 = solve_more(RHS1)

            if k_s > 0:
                Xs = X1[1:]  # (k_s, nz) rows = A^-1 Cs_i
                d_s_inv = jnp.minimum(1.0 / jnp.maximum(d_s, 1e-30), 1e30)
                T = Cs @ Xs.T + jnp.diag(d_s_inv)
                T = T + jnp.diag(
                    10 * jnp.finfo(factor_dtype).eps * (jnp.abs(jnp.diag(T)) + 1e-30)
                )
                Lt = jnp.linalg.cholesky(jnp.asarray(T, factor_dtype))
                t_solve = lambda b: jax.scipy.linalg.cho_solve(
                    (Lt, True), jnp.asarray(b, factor_dtype)
                ).astype(dtype)
                woodbury = lambda x: x - Xs.T @ t_solve(Cs @ x)
            else:
                woodbury = lambda x: x

        def _m_apply(x):
            """Exact Newton-matrix product (mild rows capped, stiff exact)."""
            out = qp.H @ x + rb * x
            if nc:
                out = out + qp.C.T @ (eta_mild * (qp.C @ x))
            if k_s > 0:
                out = out + Cs.T @ (d_s * (Cs @ x))
            return out

        def _finish_solve(x0_raw, rhs):
            x = woodbury(x0_raw)
            for _ in range(ir_steps):
                x = x + woodbury(solve_more((rhs - _m_apply(x))[None])[0])
            return jnp.where(jnp.all(jnp.isfinite(x)), x, jnp.zeros_like(x))

        def direction_from(x_raw, rhs, targets):
            ddz = _finish_solve(x_raw, rhs)
            return _recover(ddz, *targets)

        def direction(targets):
            rhs = _rhs_of(*targets)
            return direction_from(solve_more(rhs[None])[0], rhs, targets)

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

        # ---- predictor: pure Newton (affine) direction (solution row 0 of
        # the stacked factor+solve above) ----
        aff = direction_from(X1[0], rhs_aff, aff_t)
        alpha_aff = step_len(aff, 1.0)
        (adz, adw, adsl, adsu, adlam_l, adlam_u, adgam_l, adgam_u, adnu_l, adnu_u) = aff

        mu_cur = _compl(w, dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u)
        # w at the affine point via the exact direction product dw = C @ adz
        # (already computed in _recover) — no fresh matvec
        mu_aff = _compl(
            w + alpha_aff * adw,
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
        corr = direction((
            mu_t - adlam_l * (adw + adsl),
            mu_t - adlam_u * (adsu - adw),
            mu_t - adgam_l * adsl,
            mu_t - adgam_u * adsu,
            mu_t - adnu_l * adz,
            mu_t + adnu_u * adz,
        ))
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

        # w at the updated point via the corrector's exact dw = C @ ddz; the
        # next body entry recomputes w from scratch, so no drift accumulates
        mu = jnp.maximum(
            _compl(w + alpha * dw, dz, sl, su, lam_l, lam_u, gam_l, gam_u,
                   nu_l, nu_u),
            mu_min,
        )
        return (dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu,
                best_dz, best_m), (dz if emit_dz else None)

      return body

    # two-phase schedule: early iterations (mu large) never hit the ratio cap,
    # so they run the cheap capped body; the stiff Woodbury split is reserved
    # for the last `stiff_iters` where near-active rows matter.  Halves the
    # split's throughput cost at identical accuracy (docs/performance.md).
    best0 = jnp.full((), jnp.inf, dtype)
    carry = (dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu, dz, best0)
    n_stiff = min(stiff_iters if stiff_iters is not None else iters, iters)
    n_warm = iters - n_stiff if k_stiff > 0 else iters
    dz_tail = None
    if n_warm > 0:
        carry, _ = jax.lax.scan(make_body(0), carry, jnp.arange(n_warm))
    if iters - n_warm > 0:
        carry, dz_tail = jax.lax.scan(
            make_body(k_stiff, emit_dz=True), carry, jnp.arange(n_warm, iters)
        )
    (dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu, best_dz, best_m) = carry
    # the scan scored iterates at body entry; score the final one here
    m_fin = _merit(qp, lh, uh, dz)
    best_dz = jnp.where(m_fin < best_m, dz, best_dz)
    dz = best_dz
    if dz_tail is not None and dz_tail.shape[0] >= 4:
        # tail-averaged iterate: near its floating-point floor the f32 IP
        # WANDERS around the optimum instead of converging (f64 with the same
        # code converges; docs/performance.md "acados LM convention" section).
        # The wander is near-zero-mean, so the mean of the last stiff-phase
        # iterates cancels most of it; the exact-penalty merit picks between
        # the averaged point and the best single iterate, so this can never
        # lose.  Ulp-level robustness matters: the wander pattern changes with
        # platform rounding (CPU vs 8-virtual-device CPU vs MXU pass modes).
        n_tail = min(8, dz_tail.shape[0])
        dz_avg = jnp.mean(dz_tail[-n_tail:], axis=0)
        m_avg = _merit(qp, lh, uh, dz_avg)
        dz = jnp.where(m_avg < jnp.minimum(best_m, m_fin), dz_avg, dz)

    duals = QpDuals(sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u)
    # kkt reported on the IP iterate (pure IP convergence diagnostic, the
    # acados QP-status analogue).  Algorithmic duals on rows whose gap sits at the floating-point floor
    # can exceed their KKT bound lam <= z1 + z2*s (from the slack
    # stationarity row with gam >= 0); clamping to that bound keeps the
    # report's cancellation noise at the problem's own scale.  The hard box
    # is scored with the projected-gradient criterion instead of its
    # (unbounded) duals.
    lam_l_r = jnp.minimum(lam_l, z1 + z2 * sl)
    lam_u_r = jnp.minimum(lam_u, z1 + z2 * su)
    grad_lag = qp.H @ dz + qp.g - qp.C.T @ (lam_l_r - lam_u_r)
    kkt = jnp.max(jnp.abs(dz - jnp.clip(dz - grad_lag, qp.lb, qp.ub)))
    return QpResult(
        dz=dz, kkt_residual=kkt, complementarity=mu,
        duals=duals,
    )
