"""Stage-wise (Riccati) QP backend: Mehrotra interior point whose Newton
systems are solved by a batched Riccati recursion instead of a dense
factorization of the condensed Hessian.

TPU-native analogue of acados' PARTIAL_CONDENSING/sparse HPIPM modes
(reference ocp.py:113 uses FULL_CONDENSING_HPIPM at N=20; HPIPM itself is a
Riccati-based IPM — SURVEY.md §2.3 N2).  The condensed backend (solver/qp.py)
factors one (N*nu, N*nu) matrix per IP iteration: O(N^3 nu^3) flops and
O(N^2) condensing work.  This backend keeps the multiple-shooting structure:
each IP iteration runs ONE backward Riccati sweep (N steps of (nx+nu)-block
algebra, a ``lax.scan``) and reuses its factorization for the predictor and
corrector directions — O(N (nx+nu)^3).  The crossover favors Riccati for
long horizons (N >~ 40 at these block sizes); at the reference's N=20 the
condensed path stays the default.

Same problem class as solver/qp.py (slacked soft rows + hard du box), with
rows kept stage-local:

    min   sum_k 1/2 dx_k'Q_k dx_k + du_k'Ssu_k dx_k + 1/2 du_k'R_k du_k
              + q_k'dx_k + r_k'du_k   (+ terminal k=N state terms)
              + sum_rows z1 (sl+su) + 1/2 z2 (sl^2+su^2)
    s.t.  dx_0 = e0,   dx_{k+1} = A_k dx_k + B_k du_k + b_k
          lh - sl <= c_k + Cx_k dx_k + Cu_k du_k <= uh + su
          (terminal rows on dx_N),   lb <= du <= ub

The slack/dual elimination per row is identical to the condensed backend
(each row contributes a rank-1 barrier term eta to the stage Hessian and a
gradient correction); the dense ``C``-matrix products become stage-wise
(nh, nx/nu) contractions.

Stiff-row split (same f32-accuracy treatment as the condensed backend,
solver/qp.py): the k_stiff rows with the largest barrier coefficient are
EXCLUDED from the stage Hessians and applied exactly through the Woodbury
identity.  The Riccati recursion plays the role of A^-1: each selected row,
expressed as a stage-local gradient, gets one linear backward resolve sweep
(reusing the factorization), and the k x k Woodbury system corrects both the
predictor and the corrector directions.  Mild rows keep the ratio_cap
backstop.  This brings qp_backend=riccati to the same <=1e-3 f32 contract as
the condensed backend (tests/test_qp_riccati.py, docs/performance.md).

Iterates stay dynamics-feasible by construction: the initial iterate rolls
the clipped hover step forward through the linearized dynamics, and every
Newton direction satisfies the homogeneous constraint (ddx_0 = 0,
ddx_{k+1} = A ddx_k + B ddu_k), so feasibility is preserved under any step
length.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = 1e8


class StageQpData(NamedTuple):
    """One stage-structured QP (add leading batch axes via vmap)."""

    Q: jax.Array  # (N+1, nx, nx) state Hessians (incl. terminal; PSD + LM)
    q: jax.Array  # (N+1, nx)
    R: jax.Array  # (N, nu, nu)
    r: jax.Array  # (N, nu)
    Ssu: jax.Array  # (N, nu, nx) cross terms d2/du ddx
    A: jax.Array  # (N, nx, nx)
    B: jax.Array  # (N, nx, nu)
    b: jax.Array  # (N, nx) shooting defects
    e0: jax.Array  # (nx,) initial-state defect x0 - X_0
    Cx: jax.Array  # (N, nh, nx) stage row state Jacobians (nh may be 0)
    Cu: jax.Array  # (N, nh, nu)
    c: jax.Array  # (N, nh) row values at (dx, du) = 0
    lh: jax.Array  # (nh,)
    uh: jax.Array  # (nh,)
    z1: jax.Array  # (N, nh) L1 slack weights (cost-scaled per stage)
    z2: jax.Array  # (N, nh)
    CxN: jax.Array  # (nhN, nx) terminal rows
    cN: jax.Array  # (nhN,)
    lhN: jax.Array
    uhN: jax.Array
    z1N: jax.Array
    z2N: jax.Array
    lb: jax.Array  # (N, nu) du box lower
    ub: jax.Array  # (N, nu)


class RiccatiQpResult(NamedTuple):
    ddx: jax.Array  # (N+1, nx)
    ddu: jax.Array  # (N, nu)
    kkt_residual: jax.Array
    complementarity: jax.Array


def _riccati_factor(Qb, qb, Rb, rb_, Sb, A, B):
    """Backward sweep: factorize + solve for the affine direction in one pass.

    Homogeneous dynamics (ddx_0 = 0, no defect term — iterates are feasible).
    Returns (K, kff, chol_F, G, P_path) where resolve-only sweeps can reuse
    (K, chol_F, G).
    """
    PN = Qb[-1]
    pN = qb[-1]

    def bwd(carry, xs):
        P, p = carry
        Qk, qk, Rk, rk, Sk, Ak, Bk = xs
        PB = P @ Bk  # (nx, nu)
        F = Rk + Bk.T @ PB
        F = 0.5 * (F + F.T)
        G = Sk + Bk.T @ (P @ Ak)  # (nu, nx)
        h = rk + Bk.T @ p
        L = jnp.linalg.cholesky(F)
        K = -jax.scipy.linalg.cho_solve((L, True), G)
        kff = -jax.scipy.linalg.cho_solve((L, True), h)
        P_new = Qk + Ak.T @ (P @ Ak) + G.T @ K
        P_new = 0.5 * (P_new + P_new.T)
        p_new = qk + Ak.T @ p + G.T @ kff
        return (P_new, p_new), (K, kff, L, G)

    (_, _), (K, kff, Ls, G) = jax.lax.scan(
        bwd, (PN, pN), (Qb[:-1], qb[:-1], Rb, rb_, Sb, A, B), reverse=True
    )
    return K, kff, Ls, G


def _riccati_resolve(K, Ls, G, qb, rb_, A, B):
    """Linear backward sweep for a new gradient rhs, reusing the factorization."""
    del G  # gains K already encode -F^-1 G

    def bwd(p, xs):
        qk, rk, Kk, Lk, Ak, Bk = xs
        h = rk + Bk.T @ p
        kff = -jax.scipy.linalg.cho_solve((Lk, True), h)
        # p_new = qk + A'p + G'kff; with K = -F^-1 G, G'kff = -K'F kff = K'h... use G via K:
        # G' kff = (-F K)' kff = -K' F kff = K' h   (since F kff = -h)
        p_new = qk + Ak.T @ p + Kk.T @ h
        return p_new, kff

    _, kff = jax.lax.scan(bwd, qb[-1], (qb[:-1], rb_, K, Ls, A, B), reverse=True)
    return kff


def _rollout(K, kff, A, B, nx, dtype):
    """Forward pass under homogeneous dynamics from ddx_0 = 0."""

    def fwd(dx, xs):
        Kk, kffk, Ak, Bk = xs
        du = Kk @ dx + kffk
        dx_next = Ak @ dx + Bk @ du
        return dx_next, (dx, du)

    dxN, (dx, du) = jax.lax.scan(fwd, jnp.zeros(nx, dtype), (K, kff, A, B))
    ddx = jnp.concatenate([dx, dxN[None]], axis=0)
    return ddx, du


def solve_qp_riccati(
    sq: StageQpData,
    iters: int = 20,
    mu0: float = 0.1,
    box_margin: float = 1e-6,
    ratio_cap_override: float = None,
    k_stiff: int = 8,
    stiff_iters: int = None,
) -> RiccatiQpResult:
    """Solve one stage-structured QP (`iters` Mehrotra iterations).
    vmap over a leading batch axis for scenarios.

    k_stiff rows are handled exactly via the per-iteration Woodbury split
    (module docstring); stiff_iters limits the split to the LAST n iterations
    (earlier iterations never hit the ratio cap), matching the condensed
    backend's schedule."""
    dtype = sq.q.dtype
    N, nx = sq.A.shape[0], sq.A.shape[1]
    nu = sq.B.shape[2]
    nh = sq.Cx.shape[1]
    nhN = sq.CxN.shape[0]
    nz = N * nu
    nc = N * nh + nhN

    lh_s = jnp.maximum(jnp.broadcast_to(sq.lh, (N, nh)), -_BIG)
    uh_s = jnp.minimum(jnp.broadcast_to(sq.uh, (N, nh)), _BIG)
    lh = jnp.concatenate([lh_s.reshape(-1), jnp.maximum(sq.lhN, -_BIG)])
    uh = jnp.concatenate([uh_s.reshape(-1), jnp.minimum(sq.uhN, _BIG)])
    z1 = jnp.concatenate([sq.z1.reshape(-1), sq.z1N])
    z2 = jnp.concatenate([sq.z2.reshape(-1), sq.z2N])
    lb = sq.lb.reshape(-1)
    ub = sq.ub.reshape(-1)

    eps = jnp.finfo(dtype).eps
    mu_min = jnp.asarray(32 * eps, dtype)
    p_floor = mu_min * 1e-2
    d_floor = jnp.asarray(1e-14, dtype)
    tau = jnp.asarray(0.995, dtype)
    ratio_cap = jnp.asarray(
        0.1 / eps if ratio_cap_override is None else ratio_cap_override, dtype
    )
    n_terms = 2 * nz + 4 * nc

    # ---- dynamics-feasible initial iterate ----
    width = ub - lb
    du0 = jnp.clip(
        jnp.zeros(nz, dtype), lb + box_margin * (1 + width), ub - box_margin * (1 + width)
    ).reshape(N, nu)

    def fwd0(dx, xs):
        Ak, Bk, bk, duk = xs
        dx_next = Ak @ dx + Bk @ duk + bk
        return dx_next, dx
    dxN0, dxs0 = jax.lax.scan(fwd0, sq.e0, (sq.A, sq.B, sq.b, du0))
    ddx = jnp.concatenate([dxs0, dxN0[None]], axis=0)  # (N+1, nx)
    ddu = du0

    def row_vals(ddx, ddu):
        """All general-row values, flattened stage-major + terminal tail."""
        w_s = sq.c + jnp.einsum("kni,ki->kn", sq.Cx, ddx[:N]) + jnp.einsum(
            "knu,ku->kn", sq.Cu, ddu
        )
        w_N = sq.cN + sq.CxN @ ddx[N]
        return jnp.concatenate([w_s.reshape(-1), w_N])

    def ct_apply(v):
        """C'v as stage gradients: returns (gx (N+1, nx), gu (N, nu))."""
        v_s = v[: N * nh].reshape(N, nh)
        v_N = v[N * nh :]
        gx = jnp.einsum("kni,kn->ki", sq.Cx, v_s)
        gxN = sq.CxN.T @ v_N
        gu = jnp.einsum("knu,kn->ku", sq.Cu, v_s)
        return jnp.concatenate([gx, gxN[None]], axis=0), gu

    def c_apply(dxs, dus):
        w_s = jnp.einsum("kni,ki->kn", sq.Cx, dxs[:N]) + jnp.einsum(
            "knu,ku->kn", sq.Cu, dus
        )
        return jnp.concatenate([w_s.reshape(-1), sq.CxN @ dxs[N]])

    def merit(ddx, ddu):
        """Exact penalized objective at a dynamics-feasible iterate; du-box
        violations carry an exact-penalty distance (iterates stay interior)."""
        f = (
            0.5 * jnp.einsum("ki,kij,kj->", ddx, sq.Q, ddx)
            + jnp.einsum("ki,ki->", sq.q, ddx)
            + 0.5 * jnp.einsum("ku,kuv,kv->", ddu, sq.R, ddu)
            + jnp.einsum("ku,ku->", sq.r, ddu)
            + jnp.einsum("ku,kui,ki->", ddu, sq.Ssu, ddx[:N])
        )
        w = row_vals(ddx, ddu)
        vl = jnp.maximum(lh - w, 0.0)
        vu = jnp.maximum(w - uh, 0.0)
        f = f + jnp.sum(z1 * (vl + vu) + 0.5 * z2 * (vl**2 + vu**2))
        duf = ddu.reshape(-1)
        return f + _BIG * jnp.sum(jnp.abs(duf - jnp.clip(duf, lb, ub)))

    # ---- IP state ----
    mu = jnp.asarray(mu0, dtype)
    w0 = row_vals(ddx, ddu)
    duf = ddu.reshape(-1)
    sl = jnp.maximum(lh - w0, 0.0) + 0.1
    su = jnp.maximum(w0 - uh, 0.0) + 0.1
    lam_l = mu / (w0 + sl - lh)
    lam_u = mu / (uh + su - w0)
    gam_l = mu / sl
    gam_u = mu / su
    nu_l = mu / (duf - lb)
    nu_u = mu / (ub - duf)

    def _mu_of(ddx, ddu, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u):
        w = row_vals(ddx, ddu)
        duf = ddu.reshape(-1)
        total = jnp.dot(duf - lb, nu_l) + jnp.dot(ub - duf, nu_u)
        if nc:
            total = total + (
                jnp.dot(w + sl - lh, lam_l)
                + jnp.dot(uh + su - w, lam_u)
                + jnp.dot(sl, gam_l)
                + jnp.dot(su, gam_u)
            )
        return total / n_terms

    def _max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.min(ratio) if ratio.size else jnp.asarray(jnp.inf, v.dtype)

    # global row-gradient tensors for the stiff Woodbury resolves: row i of
    # the flattened constraint set as a stage-local (q, r) gradient pair
    use_stiff = k_stiff > 0 and nc > 0
    if use_stiff:
        eyeN1 = jnp.eye(N + 1, dtype=dtype)[:N]  # (N, N+1)
        eyeN = jnp.eye(N, dtype=dtype)
        GX_all = jnp.concatenate(
            [
                (sq.Cx[:, :, None, :] * eyeN1[:, None, :, None]).reshape(
                    N * nh, N + 1, nx
                ),
                jnp.concatenate(
                    [jnp.zeros((nhN, N, nx), dtype), sq.CxN[:, None, :]], axis=1
                ),
            ],
            axis=0,
        )  # (nc, N+1, nx)
        GU_all = jnp.concatenate(
            [
                (sq.Cu[:, :, None, :] * eyeN[:, None, :, None]).reshape(N * nh, N, nu),
                jnp.zeros((nhN, N, nu), dtype),
            ],
            axis=0,
        )  # (nc, N, nu)

    def body(k_s, carry, _):
        (ddx, ddu, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu,
         best_x, best_u, best_m) = carry
        duf = ddu.reshape(-1)

        w = row_vals(ddx, ddu)
        tl = jnp.maximum(w + sl - lh, 4 * eps * (1.0 + jnp.abs(w) + sl))
        tu = jnp.maximum(uh + su - w, 4 * eps * (1.0 + jnp.abs(w) + su))
        bl = jnp.maximum(duf - lb, 4 * eps * (1.0 + jnp.abs(duf)))
        bu = jnp.maximum(ub - duf, 4 * eps * (1.0 + jnp.abs(duf)))

        # stationarity residuals (stage form)
        gx_lam, gu_lam = ct_apply(lam_l - lam_u)
        r_x = (
            jnp.einsum("kij,kj->ki", sq.Q, ddx)
            + sq.q
            + jnp.concatenate(
                [jnp.einsum("kui,ku->ki", sq.Ssu, ddu), jnp.zeros((1, nx), dtype)], axis=0
            )
            - gx_lam
        )
        r_u = (
            jnp.einsum("kuv,kv->ku", sq.R, ddu)
            + sq.r
            + jnp.einsum("kui,ki->ku", sq.Ssu, ddx[:N])
            - gu_lam
            - (nu_l - nu_u).reshape(N, nu)
        )
        r_sl = z1 + z2 * sl - lam_l - gam_l
        r_su = z1 + z2 * su - lam_u - gam_u

        # barrier coefficients: mild rows capped, the k_s largest-eta rows
        # selected for the exact Woodbury split (condensed backend semantics,
        # solver/qp.py)
        ql_raw = lam_l / tl
        qu_raw = lam_u / tu
        pl_raw = gam_l / sl
        pu_raw = gam_u / su

        def _eta_of(ql_, qu_, pl_, pu_):
            d_l_ = z2 + ql_ + pl_
            d_u_ = z2 + qu_ + pu_
            return ql_ * (z2 + pl_) / d_l_ + qu_ * (z2 + pu_) / d_u_

        if k_s > 0:
            eta_raw = _eta_of(ql_raw, qu_raw, pl_raw, pu_raw)
            _, sidx = jax.lax.top_k(eta_raw, k_s)
            stiff = jnp.zeros((nc,), bool).at[sidx].set(True)
            cap = jnp.where(stiff, jnp.inf, ratio_cap)
        else:
            cap = ratio_cap
        ql = jnp.minimum(ql_raw, cap)
        qu = jnp.minimum(qu_raw, cap)
        pl = jnp.minimum(pl_raw, cap)
        pu = jnp.minimum(pu_raw, cap)
        d_l = z2 + ql + pl
        d_u = z2 + qu + pu
        eta = _eta_of(ql, qu, pl, pu)  # (nc,)
        rbl = nu_l / bl
        rbu = nu_u / bu
        rb = (rbl + rbu).reshape(N, nu)

        if k_s > 0:
            d_s = eta[sidx]  # exact (uncapped) stiff coefficients
            eta = jnp.where(stiff, 0.0, eta)  # mild rows only in the Hessians

        # stage Hessians augmented by the (mild) barrier terms
        eta_s = eta[: N * nh].reshape(N, nh)
        eta_N = eta[N * nh :]
        Qb = sq.Q.at[:N].add(jnp.einsum("kni,kn,knj->kij", sq.Cx, eta_s, sq.Cx))
        Qb = Qb.at[N].add(sq.CxN.T @ (eta_N[:, None] * sq.CxN))
        Rb = sq.R + jnp.einsum("knu,kn,knv->kuv", sq.Cu, eta_s, sq.Cu)
        Rb = Rb + jax.vmap(jnp.diag)(rb)
        Sb = sq.Ssu + jnp.einsum("knu,kn,kni->kui", sq.Cu, eta_s, sq.Cx)
        # relative jitter keeps the f32 factorization sane
        jit_x = 10 * eps * (jnp.abs(jnp.einsum("kii->ki", Qb)) + 1.0)
        Qb = Qb + jax.vmap(jnp.diag)(jit_x)
        jit_u = 10 * eps * (jnp.abs(jnp.einsum("kuu->ku", Rb)) + 1.0)
        Rb = Rb + jax.vmap(jnp.diag)(jit_u)

        def _coeffs(m_tl, m_tu, m_sl, m_su):
            a_l = m_tl / tl - lam_l
            a_u = m_tu / tu - lam_u
            b_l = -r_sl + a_l + m_sl / sl - gam_l
            b_u = -r_su + a_u + m_su / su - gam_u
            return a_l, a_u, b_l, b_u

        def _grad_of(m_tl, m_tu, m_sl, m_su, m_bl, m_bu):
            """Riccati gradient (q_rhs, r_rhs): minimize 1/2 d'Hbar d + grad'd."""
            a_l, a_u, b_l, b_u = _coeffs(m_tl, m_tu, m_sl, m_su)
            const = (a_l - ql * b_l / d_l) - (a_u - qu * b_u / d_u)
            gx_c, gu_c = ct_apply(const)
            q_rhs = r_x - gx_c
            r_rhs = r_u - gu_c - ((m_bl / bl - nu_l) - (m_bu / bu - nu_u)).reshape(N, nu)
            return q_rhs, r_rhs

        def _recover(dxs, dus, m_tl, m_tu, m_sl, m_su, m_bl, m_bu):
            a_l, a_u, b_l, b_u = _coeffs(m_tl, m_tu, m_sl, m_su)
            dw = c_apply(dxs, dus)
            dsl = (b_l - ql * dw) / d_l
            dsu = (b_u + qu * dw) / d_u
            dlam_l = a_l - ql * (dw + dsl)
            dlam_u = a_u - qu * (dsu - dw)
            dgam_l = (m_sl - gam_l * sl) / sl - pl * dsl
            dgam_u = (m_su - gam_u * su) / su - pu * dsu
            ddz = dus.reshape(-1)
            dnu_l = (m_bl - nu_l * bl) / bl - rbl * ddz
            dnu_u = (m_bu - nu_u * bu) / bu + rbu * ddz
            return dxs, dus, dw, dsl, dsu, dlam_l, dlam_u, dgam_l, dgam_u, dnu_l, dnu_u

        # ---- predictor (affine) with the factor sweep ----
        zero_c = jnp.zeros_like(sl)
        zero_z = jnp.zeros_like(duf)
        aff_t = (zero_c, zero_c, zero_c, zero_c, zero_z, zero_z)
        # _grad_of returns the GRADIENT g of the barrier-augmented model at the
        # current iterate; the Newton direction minimizes 1/2 d'Hbar d + g'd
        # over the homogeneous-dynamics subspace, i.e. solves Hbar d = -g
        q_rhs, r_rhs = _grad_of(*aff_t)
        K, kff, Ls, G = _riccati_factor(Qb, q_rhs, Rb, r_rhs, Sb, sq.A, sq.B)

        if k_s > 0:
            # Woodbury columns: each stiff row as a stage gradient through a
            # linear resolve sweep; the rollout of the sweep output is -y_i
            # (the sweep solves Hbar d = -g).  T = diag(1/d_s) + Cs Hbar^-1 Cs'
            Cx_rows = GX_all[sidx]  # (k_s, N+1, nx)
            Cu_rows = GU_all[sidx]  # (k_s, N, nu)
            kff_rows = jax.vmap(
                lambda qg, rg: _riccati_resolve(K, Ls, G, qg, rg, sq.A, sq.B)
            )(Cx_rows, Cu_rows)
            y_dx, y_du = jax.vmap(
                lambda kf: _rollout(K, kf, sq.A, sq.B, nx, dtype)
            )(kff_rows)  # = -y_i
            CY = jax.vmap(lambda dx_, du_: c_apply(dx_, du_)[sidx])(y_dx, y_du)
            d_s_inv = jnp.minimum(1.0 / jnp.maximum(d_s, 1e-30), 1e30)
            T = -CY.T + jnp.diag(d_s_inv)
            T = T + jnp.diag(10 * eps * (jnp.abs(jnp.einsum("ii->i", T)) + 1e-30))
            Lt = jnp.linalg.cholesky(T)

            def woodbury(dxs, dus):
                """d <- d - Y T^-1 Cs d  (Y columns are -(y_dx, y_du))."""
                t = jax.scipy.linalg.cho_solve((Lt, True), c_apply(dxs, dus)[sidx])
                dxs = dxs + jnp.einsum("j,jki->ki", t, y_dx)
                dus = dus + jnp.einsum("j,jku->ku", t, y_du)
                return dxs, dus

        else:
            woodbury = lambda dxs, dus: (dxs, dus)

        dxs_a, dus_a = woodbury(*_rollout(K, kff, sq.A, sq.B, nx, dtype))
        aff = _recover(dxs_a, dus_a, *aff_t)

        def step_len(d, frac):
            (dxs, dus, dw, dsl, dsu, dlam_l, dlam_u, dgam_l, dgam_u, dnu_l, dnu_u) = d
            ddz = dus.reshape(-1)
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

        alpha_aff = step_len(aff, 1.0)
        (dxs_a, dus_a, adw, adsl, adsu, adlam_l, adlam_u, adgam_l, adgam_u,
         adnu_l, adnu_u) = aff
        adz = dus_a.reshape(-1)

        mu_cur = _mu_of(ddx, ddu, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u)
        mu_aff = _mu_of(
            ddx + alpha_aff * dxs_a,
            ddu + alpha_aff * dus_a,
            sl + alpha_aff * adsl,
            su + alpha_aff * adsu,
            lam_l + alpha_aff * adlam_l,
            lam_u + alpha_aff * adlam_u,
            gam_l + alpha_aff * adgam_l,
            gam_u + alpha_aff * adgam_u,
            nu_l + alpha_aff * adnu_l,
            nu_u + alpha_aff * adnu_u,
        )
        sigma = jnp.clip(
            (jnp.maximum(mu_aff, 0.0) / jnp.maximum(mu_cur, d_floor)) ** 3, 1e-4, 1.0
        )
        mu_t = jnp.maximum(sigma * mu_cur, mu_min)

        # ---- corrector reusing the factorization ----
        corr_t = (
            mu_t - adlam_l * (adw + adsl),
            mu_t - adlam_u * (adsu - adw),
            mu_t - adgam_l * adsl,
            mu_t - adgam_u * adsu,
            mu_t - adnu_l * adz,
            mu_t + adnu_u * adz,
        )
        q_rhs2, r_rhs2 = _grad_of(*corr_t)
        kff2 = _riccati_resolve(K, Ls, G, q_rhs2, r_rhs2, sq.A, sq.B)
        dxs_c, dus_c = woodbury(*_rollout(K, kff2, sq.A, sq.B, nx, dtype))
        corr = _recover(dxs_c, dus_c, *corr_t)
        alpha = step_len(corr, tau)
        (dxs_c, dus_c, dw, dsl, dsu, dlam_l, dlam_u, dgam_l, dgam_u, dnu_l,
         dnu_u) = corr

        ddx = ddx + alpha * dxs_c
        ddu = ddu + alpha * dus_c
        sl = jnp.maximum(sl + alpha * dsl, p_floor)
        su = jnp.maximum(su + alpha * dsu, p_floor)
        lam_l = jnp.maximum(lam_l + alpha * dlam_l, d_floor)
        lam_u = jnp.maximum(lam_u + alpha * dlam_u, d_floor)
        gam_l = jnp.maximum(gam_l + alpha * dgam_l, d_floor)
        gam_u = jnp.maximum(gam_u + alpha * dgam_u, d_floor)
        nu_l = jnp.maximum(nu_l + alpha * dnu_l, d_floor)
        nu_u = jnp.maximum(nu_u + alpha * dnu_u, d_floor)
        mu = jnp.maximum(
            _mu_of(ddx, ddu, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u), mu_min
        )

        m_new = merit(ddx, ddu)
        better = m_new < best_m
        best_x = jnp.where(better, ddx, best_x)
        best_u = jnp.where(better, ddu, best_u)
        best_m = jnp.minimum(m_new, best_m)
        return (ddx, ddu, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu,
                best_x, best_u, best_m), None

    best0 = jnp.full((), jnp.inf, dtype)
    carry = (ddx, ddu, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu,
             ddx, ddu, best0)
    # warm iterations never hit the ratio cap -> run capped-only; the last
    # stiff_iters iterations carry the exact Woodbury split (condensed
    # backend's schedule, cfg.solver.qp_stiff_iters)
    from functools import partial

    n_stiff = 0
    if use_stiff:
        n_stiff = min(stiff_iters if stiff_iters is not None else iters, iters)
    n_warm = iters - n_stiff
    if n_warm > 0:
        carry, _ = jax.lax.scan(partial(body, 0), carry, None, length=n_warm)
    if n_stiff > 0:
        carry, _ = jax.lax.scan(
            partial(body, min(k_stiff, nc)), carry, None, length=n_stiff
        )
    (ddx, ddu, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu,
     best_x, best_u, best_m) = carry
    ddx, ddu = best_x, best_u

    # projected-gradient KKT report (same criterion as the condensed backend,
    # on the REDUCED gradient: stage-x gradients back-propagated through the
    # dynamics by an adjoint sweep so du sees the full dx-coupling)
    lam_l_r = jnp.minimum(lam_l, z1 + z2 * sl)
    lam_u_r = jnp.minimum(lam_u, z1 + z2 * su)
    gx_lam, gu_lam = ct_apply(lam_l_r - lam_u_r)
    grad_x = (
        jnp.einsum("kij,kj->ki", sq.Q, ddx)
        + sq.q
        + jnp.concatenate(
            [jnp.einsum("kui,ku->ki", sq.Ssu, ddu), jnp.zeros((1, nx), dtype)], axis=0
        )
        - gx_lam
    )
    grad_u_stage = (
        jnp.einsum("kuv,kv->ku", sq.R, ddu)
        + sq.r
        + jnp.einsum("kui,ki->ku", sq.Ssu, ddx[:N])
        - gu_lam
    )

    def adj(lam, xs):
        gxk, Ak, Bk = xs
        return Ak.T @ lam + gxk, Bk.T @ lam
    _, bt_lam = jax.lax.scan(adj, grad_x[N], (grad_x[:N], sq.A, sq.B), reverse=True)
    grad_u = (grad_u_stage + bt_lam).reshape(-1)
    duf = ddu.reshape(-1)
    kkt = jnp.max(jnp.abs(duf - jnp.clip(duf - grad_u, lb, ub)))
    return RiccatiQpResult(ddx=ddx, ddu=ddu, kkt_residual=kkt, complementarity=mu)
