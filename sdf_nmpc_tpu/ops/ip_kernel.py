"""Fused interior-point iteration kernel: one Mehrotra predictor-corrector
iteration of the condensed-QP solver (solver/qp.py) as a single Pallas pass.

Why: at production batch the IP loop is the step's dominant cost and it is
NOT the factorization — with the lanes factor+solve kernel the Cholesky is
effectively free (a diagonal-solve ablation measures the same time), yet a
warm iteration still costs ~11 ms and a stiff one ~18.5 ms at B=8192
(scripts/bench_qp_breakdown.py).  The time is HBM traffic and dispatch: the
body is ~40 XLA ops that re-read H (210 MB), C (173 MB) and the Newton
matrix A (210 MB each way) several times per iteration.

This kernel runs the ENTIRE iteration — gap floors, KKT residuals, merit
tracking, ratio caps, stiff-row selection, Newton-matrix build, lanes
Cholesky, predictor solve, Woodbury correction, step lengths, Mehrotra
centering, corrector solve, state update — in one VMEM-resident pass per
128-lane scenario tile.  HBM traffic per iteration drops to one read of
(H, C, vectors) + the state round trip (~430 MB at B=8192, ~0.6 ms at
bandwidth), and the ~40-dispatch chain becomes one kernel launch.

The scenario axis lives on the 128 vector lanes (lanes layout, see
ops/qp_kernels.py); every vector quantity is (n, LANES) and every scalar is
(1, LANES).  Semantics mirror solver/qp.py's body line by line — equivalence
is golden-tested against the composed path (tests/test_qp_kernels.py).

Reference context: this is the TPU-native analogue of HPIPM's fused IP
iteration (reference acados ocp.py:113-116, SURVEY.md §2.3 N2) — HPIPM wins
on CPU by keeping the iteration in registers/L1 with hand-scheduled BLASFEO
kernels; the same locality argument lands the whole iteration in VMEM here.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .qp_kernels import (
    LANES,
    _chol_lanes_blocked,
    _round_up,
    _tri_solve_lanes_blocked,
    _wood_correct,
)

_COMPILER_PARAMS = pltpu.CompilerParams(
    dimension_semantics=("parallel",), vmem_limit_bytes=100 * 1024 * 1024
)

_INF = np.float32(np.inf)  # np scalar: embeds as a literal (a jnp scalar is an Array the kernel would capture)


def _mv(M, x):
    """(n, m, L) @ (m, L) -> (n, L)."""
    return jnp.sum(M * x[None, :, :], axis=1)


def _mtv(M, v):
    """(m, n, L)^T @ (m, L) -> (n, L)."""
    return jnp.sum(M * v[:, None, :], axis=0)


def _dot(a, b):
    """(n, L) . (n, L) -> (L,)."""
    return jnp.sum(a * b, axis=0)


def _max_step(v, dv):
    """Largest alpha with v + alpha*dv > 0, per lane: (n, L) -> (L,)."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), _INF)
    return jnp.min(ratio, axis=0)


def _ip_phase_kernel(
    # problem data
    H_ref, C_ref, g_ref, c0_ref, lh_ref, uh_ref, z1_ref, z2_ref, lb_ref, ub_ref,
    # state in
    dz_ref, sl_ref, su_ref, ll_ref, lu_ref, gl_ref, gu_ref, nl_ref, nu_ref,
    mu_ref, bdz_ref, bm_ref, dzs_ref,
    # state out
    dz_o, sl_o, su_o, ll_o, lu_o, gl_o, gu_o, nl_o, nu_o, mu_o, bdz_o, bm_o,
    dzs_o,
    # scratch
    A_scr, X_scr, Cs_scr, Xs_scr, Lt_scr,
    *,
    nz, nc, k_s, n_iters, it0, n_tail, ratio_cap, mu_min, p_floor, d_floor,
    tau, ablate="",
):
    f32 = np.float32  # np scalars embed as Mosaic literals
    eps = f32(jnp.finfo(jnp.float32).eps)
    n_terms = f32(2 * nz + 4 * nc)

    C = C_ref[...]
    g = g_ref[...]
    c0 = c0_ref[...]
    lh = lh_ref[...]
    uh = uh_ref[...]
    z1 = z1_ref[...]
    z2 = z2_ref[...]
    lb = lb_ref[...]
    ub = ub_ref[...]

    # the iteration loop runs on the OUT refs (state copied once); the whole
    # n_iters-iteration phase is one kernel launch — H/C are read from HBM
    # once per PHASE instead of once per iteration, and the XLA-level scan
    # (one launch + a ~30 MB state round trip per iteration) disappears
    for src, dst in (
        (dz_ref, dz_o), (sl_ref, sl_o), (su_ref, su_o), (ll_ref, ll_o),
        (lu_ref, lu_o), (gl_ref, gl_o), (gu_ref, gu_o), (nl_ref, nl_o),
        (nu_ref, nu_o), (mu_ref, mu_o), (bdz_ref, bdz_o), (bm_ref, bm_o),
        (dzs_ref, dzs_o),
    ):
        dst[...] = src[...]

    def _body(i, _):
     dz = dz_o[...]
     sl = sl_o[...]
     su = su_o[...]
     lam_l = ll_o[...]
     lam_u = lu_o[...]
     gam_l = gl_o[...]
     gam_u = gu_o[...]
     nu_l = nl_o[...]
     nu_u = nu_o[...]

     # ---- gaps with cancellation-noise floors (solver/qp.py body) ----
     w = c0 + _mv(C, dz)
     tl = jnp.maximum(w + sl - lh, 4 * eps * (1.0 + jnp.abs(w) + sl))
     tu = jnp.maximum(uh + su - w, 4 * eps * (1.0 + jnp.abs(w) + su))
     bl = jnp.maximum(dz - lb, 4 * eps * (1.0 + jnp.abs(dz)))
     bu = jnp.maximum(ub - dz, 4 * eps * (1.0 + jnp.abs(dz)))

     # ---- KKT stationarity residuals ----
     Hdz = _mv(H_ref[...], dz)
     r_z = Hdz + g - _mtv(C, lam_l - lam_u) - nu_l + nu_u
     r_sl = z1 + z2 * sl - lam_l - gam_l
     r_su = z1 + z2 * su - lam_u - gam_u

     # ---- best-iterate merit at entry (gate excludes the zero step) ----
     vl = jnp.maximum(lh - w, 0.0)
     vu = jnp.maximum(w - uh, 0.0)
     m_cur = (
         0.5 * _dot(dz, Hdz)
         + _dot(g, dz)
         + jnp.sum(z1 * (vl + vu) + 0.5 * z2 * (vl * vl + vu * vu), axis=0)
     )
     better = (m_cur < bm_o[0, :]) & ((it0 + i) > 0)
     bdz_o[...] = jnp.where(better[None, :], dz, bdz_o[...])
     bm_o[...] = jnp.where(better, m_cur, bm_o[0, :])[None, :]

     # ---- barrier ratios + stiff-row split (see solver/qp.py for the math) --
     ql_raw = lam_l / tl
     qu_raw = lam_u / tu
     pl_raw = gam_l / sl
     pu_raw = gam_u / su

     if k_s > 0:
         # top-k_s selection on the RAW eta (matches jax.lax.top_k's ordering
         # incl. first-index tie-breaking) via k_s argmax-and-mask passes;
         # the onehots are kept to gather the exact stiff coefficients from
         # the capped eta afterwards
         d_l0 = z2 + ql_raw + pl_raw
         d_u0 = z2 + qu_raw + pu_raw
         eta_raw = ql_raw * (z2 + pl_raw) / d_l0 + qu_raw * (z2 + pu_raw) / d_u0
         iota_c = jax.lax.broadcasted_iota(jnp.int32, (nc, LANES), 0)
         masked = eta_raw
         stiff = jnp.zeros((nc, LANES), jnp.bool_)
         onehots = []
         # ks_i (not i): the fori_loop index `i` feeds the best-iterate gate
         # above and must never be shadowed by these unrolled Python loops
         for ks_i in range(k_s):
             idx = jnp.argmax(masked, axis=0)  # (L,)
             onehot = iota_c == idx[None, :]
             onehots.append(onehot)
             stiff = stiff | onehot
             masked = jnp.where(onehot, -_INF, masked)
             Cs_scr[ks_i, :, :] = jnp.sum(
                 jnp.where(onehot[:, None, :], C, 0.0), axis=0
             )
         cap = jnp.where(stiff, _INF, f32(ratio_cap))
     else:
         cap = f32(ratio_cap)

     ql = jnp.minimum(ql_raw, cap)
     qu = jnp.minimum(qu_raw, cap)
     pl_ = jnp.minimum(pl_raw, cap)
     pu_ = jnp.minimum(pu_raw, cap)
     d_l = z2 + ql + pl_
     d_u = z2 + qu + pu_
     eta_l = ql * (z2 + pl_) / d_l
     eta_u = qu * (z2 + pu_) / d_u
     eta = eta_l + eta_u
     rbl = nu_l / bl
     rbu = nu_u / bu
     rb = rbl + rbu

     if k_s > 0:
         # exact (uncapped — stiff rows see an inf cap) coefficients of the
         # selected rows, and zero them out of the factored matrix; mild rows
         # keep the capped eta as a consistent backstop
         d_s_rows = [
             jnp.sum(jnp.where(oh, eta, 0.0), axis=0) for oh in onehots
         ]
         eta_mild = jnp.where(stiff, 0.0, eta)
     else:
         eta_mild = eta

     # ---- Newton matrix A = H + C' diag(eta_mild) C + diag(rb) + jitter ----
     # Lower triangle only: _chol_lanes/_tri_solve_lanes never read the upper
     # (column reads are masked to rows >= j, row reads to k <= j), and the
     # contraction over nc is the kernel's single largest FLOP block — the
     # triangular build halves it.  The mirror write keeps the scratch clean
     # for the masked full-width rank-1 updates.
     P = C * eta_mild[:, None, :]  # (nc, nz, L)
     for j in range(nz):
         low = H_ref[j:, j, :]
         if "noA" not in ablate:  # timing-ablation hook (scripts/bench_ip_kernel.py)
             low = low + jnp.sum(
                 P[:, j:, :] * C[:, j, :][:, None, :], axis=0
             )  # (nz - j, L): rows j..nz-1 of column j
         diag = low[0, :] + rb[j, :]
         diag = diag + 10 * eps * (jnp.abs(diag) + 1.0)
         if j < nz - 1:  # Mosaic rejects zero-size slices at the last column
             body = jnp.concatenate([diag[None, :], low[1:, :]], axis=0)
         else:
             body = diag[None, :]
         A_scr[j:, j, :] = body
         A_scr[j, j:, :] = body  # symmetric mirror

     # ---- predictor rhs (targets = 0) ----
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
             -r_z + _mtv(C, const_l - const_u) + (m_bl / bl - nu_l)
             - (m_bu / bu - nu_u)
         )

     def _recover(ddz, m_tl, m_tu, m_sl, m_su, m_bl, m_bu):
         a_l, a_u, b_l, b_u = _coeffs(m_tl, m_tu, m_sl, m_su)
         dw = _mv(C, ddz)
         dsl = (b_l - ql * dw) / d_l
         dsu = (b_u + qu * dw) / d_u
         dlam_l = a_l - ql * (dw + dsl)
         dlam_u = a_u - qu * (dsu - dw)
         dgam_l = (m_sl - gam_l * sl) / sl - pl_ * dsl
         dgam_u = (m_su - gam_u * su) / su - pu_ * dsu
         dnu_l = (m_bl - nu_l * bl) / bl - rbl * ddz
         dnu_u = (m_bu - nu_u * bu) / bu + rbu * ddz
         return ddz, dw, dsl, dsu, dlam_l, dlam_u, dgam_l, dgam_u, dnu_l, dnu_u

     zc = jnp.zeros((nc, LANES), f32)
     zz = jnp.zeros((nz, LANES), f32)
     aff_t = (zc, zc, zc, zc, zz, zz)
     rhs_aff = _rhs_of(*aff_t)

     # ---- factor + predictor solve (+ Woodbury set) ----
     if "nochol" not in ablate:
         _chol_lanes_blocked(A_scr, nz)
     if k_s > 0:
         # one (k_s + 1)-RHS blocked tri-solve instead of a 1-RHS pass for
         # the predictor rhs plus a k_s-RHS pass for the Woodbury columns:
         # the diagonal-block recursion and the A-panel reads are shared
         # across RHS rows, so the predictor rhs rides the Woodbury solve
         # for free (r5 stiff-iteration lever, docs/performance.md go (a))
         Xs_scr[0:k_s, :, :] = Cs_scr[0:k_s, :, :]
         Xs_scr[k_s, :, :] = rhs_aff
         if "nosolve" not in ablate:
             _tri_solve_lanes_blocked(A_scr, Xs_scr, nz)
         XC = Xs_scr[...]
         Xs = XC[:k_s]
         Cs = Cs_scr[...]
         for ks_i in range(k_s):
             Lt_scr[ks_i, :, :] = jnp.sum(Cs[ks_i][None] * Xs, axis=1)
         for ks_i in range(k_s):
             d_s_inv = jnp.minimum(
                 1.0 / jnp.maximum(d_s_rows[ks_i], 1e-30), 1e30
             )
             d = Lt_scr[ks_i, ks_i, :] + d_s_inv
             Lt_scr[ks_i, ks_i, :] = d + 10 * eps * (jnp.abs(d) + 1e-30)
         _chol_lanes_blocked(Lt_scr, k_s)

         def _solve(rhs):
             X_scr[0, :, :] = rhs
             if "nosolve" in ablate:
                 return X_scr[0, :, :]
             _tri_solve_lanes_blocked(A_scr, X_scr, nz)
             return _wood_correct(
                 Lt_scr[...], Cs, Xs, X_scr[...], nz, k_s, 1
             )[0]

         adz_raw = _wood_correct(
             Lt_scr[...], Cs, Xs, XC[k_s : k_s + 1], nz, k_s, 1
         )[0]
     else:

         def _solve(rhs):
             X_scr[0, :, :] = rhs
             if "nosolve" not in ablate:
                 _tri_solve_lanes_blocked(A_scr, X_scr, nz)
             return X_scr[0, :, :]

         X_scr[0, :, :] = rhs_aff
         if "nosolve" not in ablate:
             _tri_solve_lanes_blocked(A_scr, X_scr, nz)
         adz_raw = X_scr[0, :, :]

     adz = jnp.where(
         jnp.all(jnp.isfinite(adz_raw), axis=0)[None, :], adz_raw, 0.0
     )
     aff = _recover(adz, *aff_t)

     def step_len(d, frac):
         ddz, dw, dsl, dsu, dll, dlu, dgl, dgu, dnl, dnu = d
         a = jnp.minimum(
             jnp.minimum(
                 jnp.minimum(_max_step(sl, dsl), _max_step(su, dsu)),
                 jnp.minimum(_max_step(tl, dw + dsl), _max_step(tu, dsu - dw)),
             ),
             jnp.minimum(
                 jnp.minimum(
                     jnp.minimum(_max_step(lam_l, dll), _max_step(lam_u, dlu)),
                     jnp.minimum(_max_step(gam_l, dgl), _max_step(gam_u, dgu)),
                 ),
                 jnp.minimum(
                     jnp.minimum(_max_step(nu_l, dnl), _max_step(nu_u, dnu)),
                     jnp.minimum(_max_step(bl, ddz), _max_step(bu, -ddz)),
                 ),
             ),
         )
         return jnp.minimum(1.0, frac * a)  # (L,)

     (adz, adw, adsl, adsu, adll, adlu, adgl, adgu, adnl, adnu) = aff
     alpha_aff = step_len(aff, 1.0)[None, :]  # (1, L)

     def _compl(w_, dz_, sl_, su_, ll_, lu_, gl_, gu_, nl_, nu_):
         total = _dot(dz_ - lb, nl_) + _dot(ub - dz_, nu_)
         total = total + (
             _dot(w_ + sl_ - lh, ll_)
             + _dot(uh + su_ - w_, lu_)
             + _dot(sl_, gl_)
             + _dot(su_, gu_)
         )
         return total / n_terms  # (L,)

     mu_cur = _compl(w, dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u)
     mu_aff = _compl(
         w + alpha_aff * adw,
         dz + alpha_aff * adz,
         sl + alpha_aff * adsl,
         su + alpha_aff * adsu,
         lam_l + alpha_aff * adll,
         lam_u + alpha_aff * adlu,
         gam_l + alpha_aff * adgl,
         gam_u + alpha_aff * adgu,
         nu_l + alpha_aff * adnl,
         nu_u + alpha_aff * adnu,
     )
     ratio = jnp.maximum(mu_aff, 0.0) / jnp.maximum(mu_cur, f32(d_floor))
     sigma = jnp.clip(ratio * ratio * ratio, 1e-4, 1.0)
     mu_t = jnp.maximum(sigma * mu_cur, f32(mu_min))[None, :]  # (1, L)

     # ---- corrector ----
     corr_t = (
         mu_t - adll * (adw + adsl),
         mu_t - adlu * (adsu - adw),
         mu_t - adgl * adsl,
         mu_t - adgu * adsu,
         mu_t - adnl * adz,
         mu_t + adnu * adz,
     )
     rhs_c = _rhs_of(*corr_t)
     ddz_raw = _solve(rhs_c)
     ddz = jnp.where(
         jnp.all(jnp.isfinite(ddz_raw), axis=0)[None, :], ddz_raw, 0.0
     )
     corr = _recover(ddz, *corr_t)
     alpha = step_len(corr, f32(tau))[None, :]
     (ddz, dw, dsl, dsu, dll, dlu, dgl, dgu, dnl, dnu) = corr

     dz_n = dz + alpha * ddz
     sl_n = jnp.maximum(sl + alpha * dsl, f32(p_floor))
     su_n = jnp.maximum(su + alpha * dsu, f32(p_floor))
     ll_n = jnp.maximum(lam_l + alpha * dll, f32(d_floor))
     lu_n = jnp.maximum(lam_u + alpha * dlu, f32(d_floor))
     gl_n = jnp.maximum(gam_l + alpha * dgl, f32(d_floor))
     gu_n = jnp.maximum(gam_u + alpha * dgu, f32(d_floor))
     nl_n = jnp.maximum(nu_l + alpha * dnl, f32(d_floor))
     nu_n = jnp.maximum(nu_u + alpha * dnu, f32(d_floor))

     dz_o[...] = dz_n
     sl_o[...] = sl_n
     su_o[...] = su_n
     ll_o[...] = ll_n
     lu_o[...] = lu_n
     gl_o[...] = gl_n
     gu_o[...] = gu_n
     nl_o[...] = nl_n
     nu_o[...] = nu_n
     mu_o[...] = jnp.maximum(
         _compl(w + alpha * dw, dz_n, sl_n, su_n, ll_n, lu_n, gl_n, gu_n,
                nl_n, nu_n),
         f32(mu_min),
     )[None, :]
     if n_tail > 0:
         # tail-iterate sum for the averaged-iterate rescue (solver/qp.py):
         # near its fp floor the f32 IP wanders near-zero-mean around the
         # optimum; the caller averages the last n_tail iterates and keeps
         # the average iff its exact-penalty merit wins.  The select runs as
         # a scalar weight so Mosaic lowers it as a broadcast multiply.
         w_t = jnp.where(i >= n_iters - n_tail, f32(1.0), f32(0.0))
         dzs_o[...] = dzs_o[...] + w_t * dz_n

     return 0

    jax.lax.fori_loop(0, n_iters, _body, 0)


def ip_phase_lanes(data, state, k_s: int, n_iters: int, it0: int, consts,
                   interpret: bool = False, ablate: str = "", n_tail: int = 0):
    """One fused IP PHASE (n_iters Mehrotra iterations in a single kernel
    launch) over a lanes-layout batch.

    data: (H (nz,nz,B), C (nc,nz,B), g, lb, ub (nz,B), c0, lh, uh, z1, z2
    (nc,B)); state: 13-tuple (dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l,
    nu_u (vectors), mu (1,B), best_dz (nz,B), best_m (1,B), dz_tail_sum
    (nz,B)) in the order used by solver/qp.py; it0 = global index of the
    phase's first iteration (the best-iterate gate excludes the zero-step
    initial point at index 0).  n_tail > 0 accumulates the last n_tail
    post-update iterates into dz_tail_sum (the tail-averaged-iterate rescue,
    solver/qp.py).  Returns the updated state tuple.
    """
    H, C, g, c0, lh, uh, z1, z2, lb, ub = data
    nz = H.shape[0]
    nc = C.shape[0]
    B = H.shape[-1]
    assert B % LANES == 0 and nz % 8 == 0
    k_eff = k_s if (k_s > 0 and k_s % 8 == 0) else 0
    grid = (B // LANES,)

    vec_z = pl.BlockSpec((nz, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec_c = pl.BlockSpec((nc, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    vec_1 = pl.BlockSpec((1, LANES), lambda i: (0, i), memory_space=pltpu.VMEM)
    mat_z = pl.BlockSpec((nz, nz, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    mat_c = pl.BlockSpec((nc, nz, LANES), lambda i: (0, 0, i), memory_space=pltpu.VMEM)

    state_specs = [vec_z, vec_c, vec_c, vec_c, vec_c, vec_c, vec_c, vec_z,
                   vec_z, vec_1, vec_z, vec_1, vec_z]
    state_shapes = [
        jax.ShapeDtypeStruct(s.shape, jnp.float32) for s in state
    ]

    kern = partial(
        _ip_phase_kernel,
        nz=nz,
        nc=nc,
        k_s=k_eff,
        n_iters=n_iters,
        it0=it0,
        n_tail=n_tail,
        ratio_cap=consts["ratio_cap"],
        mu_min=consts["mu_min"],
        p_floor=consts["p_floor"],
        d_floor=consts["d_floor"],
        tau=consts["tau"],
        ablate=ablate,
    )
    ks_pad = max(k_eff, 8)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[mat_z, mat_c, vec_z, vec_c, vec_c, vec_c, vec_c, vec_c,
                  vec_z, vec_z] + state_specs,
        out_specs=state_specs,
        out_shape=state_shapes,
        scratch_shapes=[
            pltpu.VMEM((nz, nz, LANES), jnp.float32),  # A / L
            pltpu.VMEM((1, nz, LANES), jnp.float32),  # X staging
            pltpu.VMEM((ks_pad, nz, LANES), jnp.float32),  # Cs
            # +1 row: the predictor rhs rides the Woodbury multi-RHS solve
            pltpu.VMEM((ks_pad + 1, nz, LANES), jnp.float32),  # [Xs; x_aff]
            pltpu.VMEM((ks_pad, ks_pad, LANES), jnp.float32),  # T / Lt
        ],
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        jnp.asarray(H, jnp.float32), jnp.asarray(C, jnp.float32),
        jnp.asarray(g, jnp.float32), jnp.asarray(c0, jnp.float32),
        jnp.asarray(lh, jnp.float32), jnp.asarray(uh, jnp.float32),
        jnp.asarray(z1, jnp.float32), jnp.asarray(z2, jnp.float32),
        jnp.asarray(lb, jnp.float32), jnp.asarray(ub, jnp.float32),
        *[jnp.asarray(s, jnp.float32) for s in state],
    )
    return tuple(out)


# ---------------------------------------------------------------------------
# Whole-solve wrapper: a custom_vmap function over the QpData arrays.  The
# unbatched primal runs the composed pallas path (solver/qp.py); under the
# callers' scenario vmap the rule runs the fused per-iteration kernel with
# all data and state kept in lanes layout across a lax.scan.
# ---------------------------------------------------------------------------

_BIG = 1e8  # mirrors solver/qp.py


def _interp() -> bool:
    return jax.default_backend() != "tpu"


def make_fused_solve(
    iters: int,
    n_warm: int,
    k_stiff: int,
    mu0: float,
    box_margin: float,
    ratio_cap_override=None,
):
    """Build the fused-IP solve for one static configuration.

    Returns run(H, g, C, c0, lh, uh, z1, z2, lb, ub) ->
    (dz, kkt, mu, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u).
    """
    eps = float(jnp.finfo(jnp.float32).eps)
    consts = dict(
        ratio_cap=float(0.1 / eps if ratio_cap_override is None else ratio_cap_override),
        mu_min=32 * eps,
        p_floor=32 * eps * 1e-2,
        d_floor=1e-14,
        tau=0.995,
    )

    @custom_batching.custom_vmap
    def run(H, g, C, c0, lh, uh, z1, z2, lb, ub):
        from ..solver.qp import QpData, solve_qp

        res = solve_qp(
            QpData(H=H, g=g, C=C, c0=c0, lh=lh, uh=uh, z1=z1, z2=z2,
                   lb=lb, ub=ub),
            iters=iters,
            mu0=mu0,
            box_margin=box_margin,
            chol_impl="pallas",
            ir_steps=0,
            ratio_cap_override=ratio_cap_override,
            k_stiff=k_stiff,
            stiff_iters=iters - n_warm,
        )
        d = res.duals
        return (res.dz, res.kkt_residual, res.complementarity, d.sl, d.su,
                d.lam_l, d.lam_u, d.gam_l, d.gam_u, d.nu_l, d.nu_u)

    @run.def_vmap
    def _rule(axis_size, in_batched, H, g, C, c0, lh, uh, z1, z2, lb, ub):
        ops = [H, g, C, c0, lh, uh, z1, z2, lb, ub]
        ops = [
            o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
            for b, o in zip(in_batched, ops)
        ]
        H, g, C, c0, lh, uh, z1, z2, lb, ub = [
            jnp.asarray(o, jnp.float32) for o in ops
        ]
        B = H.shape[0]
        nz = H.shape[-1]
        nc = C.shape[1]
        Bp = _round_up(max(B, LANES), LANES)
        if Bp != B:
            padv = lambda x, v: jnp.concatenate(
                [x, jnp.full((Bp - B,) + x.shape[1:], v, x.dtype)], axis=0
            )
            H = jnp.concatenate(
                [H, jnp.broadcast_to(jnp.eye(nz, dtype=jnp.float32)[None],
                                     (Bp - B, nz, nz))], axis=0)
            C = padv(C, 0.0)
            g = padv(g, 0.0)
            c0 = padv(c0, 0.0)
            lh = padv(lh, -1.0)
            uh = padv(uh, 1.0)
            z1 = padv(z1, 1.0)
            z2 = padv(z2, 1.0)
            lb = padv(lb, -1.0)
            ub = padv(ub, 1.0)

        lh_c = jnp.maximum(lh, -_BIG)
        uh_c = jnp.minimum(uh, _BIG)

        # ---- init (solver/qp.py cold start, warm_duals=None) ----
        width = ub - lb
        dz = jnp.clip(
            jnp.zeros_like(lb),
            lb + box_margin * (1 + width),
            ub - box_margin * (1 + width),
        )
        mu0_a = jnp.full((Bp,), mu0, jnp.float32)
        w0 = c0 + jnp.einsum("bcz,bz->bc", C, dz)
        sl = jnp.maximum(lh_c - w0, 0.0) + 0.1
        su = jnp.maximum(w0 - uh_c, 0.0) + 0.1
        lam_l = mu0_a[:, None] / (w0 + sl - lh_c)
        lam_u = mu0_a[:, None] / (uh_c + su - w0)
        gam_l = mu0_a[:, None] / sl
        gam_u = mu0_a[:, None] / su
        nu_l = mu0_a[:, None] / (dz - lb)
        nu_u = mu0_a[:, None] / (ub - dz)

        bl2 = lambda x: jnp.moveaxis(x, 0, -1)  # (B, ...) -> lanes layout
        data = (bl2(H), bl2(C), bl2(g), bl2(c0), bl2(lh_c), bl2(uh_c),
                bl2(z1), bl2(z2), bl2(lb), bl2(ub))
        state = (
            bl2(dz), bl2(sl), bl2(su), bl2(lam_l), bl2(lam_u), bl2(gam_l),
            bl2(gam_u), bl2(nu_l), bl2(nu_u),
            jnp.full((1, Bp), mu0, jnp.float32),  # mu
            bl2(dz),  # best_dz
            jnp.full((1, Bp), jnp.inf, jnp.float32),  # best_m
            jnp.zeros((nz, Bp), jnp.float32),  # dz tail sum
        )

        # tail-averaged-iterate rescue window (mirrors solver/qp.py: the
        # last min(8, n_stiff) stiff-phase iterates, only once the stiff
        # phase is long enough for an average to mean anything)
        n_stiff = iters - n_warm
        n_tail = min(8, n_stiff) if n_stiff >= 4 else 0

        if n_warm > 0:
            state = ip_phase_lanes(
                data, state, 0, n_warm, 0, consts, interpret=_interp()
            )
        if n_stiff > 0:
            state = ip_phase_lanes(
                data, state, k_stiff, n_stiff, n_warm, consts,
                interpret=_interp(), n_tail=n_tail,
            )

        lb2 = lambda x: jnp.moveaxis(x, -1, 0)[:B]  # lanes -> (B, ...)
        (dz, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u, mu, best_dz,
         best_m, dz_tail_sum) = [lb2(s) for s in state]
        mu = mu[:, 0]
        best_m = best_m[:, 0]
        H, C, g, c0 = H[:B], C[:B], g[:B], c0[:B]
        lh_c, uh_c, z1, z2, lb, ub = (
            lh_c[:B], uh_c[:B], z1[:B], z2[:B], lb[:B], ub[:B]
        )

        # ---- final-iterate merit + kkt (one-time, batched XLA) ----
        def _merit_b(z):
            Hz = jnp.einsum("bij,bj->bi", H, z)
            wz = c0 + jnp.einsum("bcz,bz->bc", C, z)
            vl = jnp.maximum(lh_c - wz, 0.0)
            vu = jnp.maximum(wz - uh_c, 0.0)
            return (
                0.5 * jnp.einsum("bi,bi->b", z, Hz)
                + jnp.einsum("bi,bi->b", g, z)
                + jnp.sum(z1 * (vl + vu) + 0.5 * z2 * (vl**2 + vu**2), axis=-1)
            )

        m_fin = _merit_b(dz)
        take = m_fin < best_m
        dz = jnp.where(take[:, None], dz, best_dz)
        if n_tail > 0:
            # tail-averaged iterate (solver/qp.py): the f32 IP's near-floor
            # wander is near-zero-mean, so the tail mean cancels most of it;
            # the exact-penalty merit gates it so this can never lose
            dz_avg = dz_tail_sum / n_tail
            m_avg = _merit_b(dz_avg)
            take_avg = m_avg < jnp.minimum(best_m, m_fin)
            dz = jnp.where(take_avg[:, None], dz_avg, dz)

        lam_l_r = jnp.minimum(lam_l, z1 + z2 * sl)
        lam_u_r = jnp.minimum(lam_u, z1 + z2 * su)
        grad = (
            jnp.einsum("bij,bj->bi", H, dz)
            + g
            - jnp.einsum("bcj,bc->bj", C, lam_l_r - lam_u_r)
        )
        kkt = jnp.max(jnp.abs(dz - jnp.clip(dz - grad, lb, ub)), axis=-1)

        out = (dz, kkt, mu, sl, su, lam_l, lam_u, gam_l, gam_u, nu_l, nu_u)
        return out, tuple(True for _ in out)

    return run
