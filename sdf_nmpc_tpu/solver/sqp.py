"""SQP-RTI engine: linearize -> condense -> QP -> update, as one jitted program.

TPU-native replacement for the acados SQP_RTI solver (reference ocp.py:109-120
and the generated C of SURVEY.md §3.2): one Gauss-Newton iteration per control
tick with Levenberg-Marquardt regularization, warm-started from the previous
trajectory.  The three reference hot loops — ERK rollout+sensitivities, NLS
residual/Jacobian with neural-SDF evaluations, condensing+QP — fuse here into
a single XLA program, vmappable over a scenario axis.

Structure per step (all shapes static):
  1. per-node linearization (vmap + jacfwd over N nodes — no sequential
     dependence; the reference does this as a serial C loop)
  2. condensing scan over the horizon: dx_k = e_k + E_k·dz, a N-step lax.scan
     of (nx,nz) matrices (the only sequential part, N=20)
  3. condensed Hessian/gradient/constraint assembly via einsum (MXU work)
  4. batched interior-point QP (solver/qp.py)
  5. linear trajectory update + NaN guard -> per-scenario status

Failure semantics: instead of the reference's try/except + fail counter
(controller.py:72-81), a per-scenario integer status is computed inside the
program; NaN steps leave the warm start untouched so batch members fail
independently (SURVEY.md §5.3).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ocp import OcpSpec
from .integrator import erk4_with_sensitivities
from .qp import QpData, QpDuals, QpResult, solve_qp
from .qp_riccati import StageQpData, solve_qp_riccati

STATUS_OK = 0
STATUS_NAN = 1
STATUS_NOT_CONVERGED = 2  # KKT residual above cfg.solver.kkt_tol (state kept)


def resolve_stiff_knobs(cfg):
    """(k_stiff, stiff_iters, ratio_cap) with flags-adaptive 'auto' defaults.

    The standard sdf OCP meets the 1e-3 contract with the cheap split
    (k_stiff 8, 8 stiff iterations); the recursive-feasibility OCP adds 8
    simultaneously-active hard terminal rows (rec-feas + braking-endpoint
    FoV + stability velocity bounds) and measurably needs the wide split —
    3.5e-3 vs 4.8e-4 worst-case u0 at k16/k32 (docs/performance.md round-3
    study), and with the round-4 trained weights the worst scenario carries
    more near-active rows still: k32 floors at 1.03e-3 on hardware while k48
    gives 1.46e-4 (round-4 sweep), iteration count having no effect.  'auto'
    picks by cfg.flags.recursive_feasibility so each formulation gets
    defaults that pass its own gate."""
    rf = bool(cfg.flags.recursive_feasibility)
    k = cfg.solver.get("qp_stiff_k", "auto")
    if k in (None, "auto"):
        k = 48 if rf else 8
    si = cfg.solver.get("qp_stiff_iters", "auto")
    if si == "auto":
        si = 16 if rf else 8
    cap = cfg.solver.get("qp_ratio_cap", "auto")
    if cap == "auto":
        cap = 1e8
    return int(k), (None if si is None else int(si)), (
        None if cap is None else float(cap)
    )


def resolve_iter_budget(cfg, budget: str) -> int:
    """Total IP iterations for a budget phase, flags-adaptive 'auto'.

    The standard sdf OCP's measured floors (on-hw prod-scale study,
    docs/performance.md round 3): cold 20, warm 18, steady 15 (with 4 stiff
    iterations since the r4 sweep — 14 total is the accuracy cliff at
    1.1e-3).  The rec-feas OCP
    needs the round-2 budgets (cold 26, warm 22, steady = warm) — at cold 20
    its worst scenario sits at 3.4e-3 vs 4.8e-4 at 26."""
    rf = bool(cfg.flags.recursive_feasibility)
    cold = cfg.solver.get("qp_iters", "auto")
    if cold in (None, "auto"):
        cold = 26 if rf else 20
    if budget == "cold":
        return int(cold)
    warm = cfg.solver.get("qp_iters_warm", "auto")
    if warm in (None, "auto"):
        warm = 22 if rf else 18
    if budget == "warm":
        return int(warm)
    steady = cfg.solver.get("qp_iters_steady", "auto")
    if steady in (None, "auto"):
        # trained-weights on-hw replay (docs/performance.md round 3): steady
        # ticks (4+) hold 3.9e-4 at 15 iters / 6 stiff; 14 is the cliff
        # (1.1e-3).  rec-feas keeps the warm budget (its hard terminal rows
        # dominate every tick).
        steady = warm if rf else 15
    return int(steady)


def resolve_qp_backend(cfg, N: int) -> str:
    """QP backend for horizon N, resolving 'auto' by the measured crossover.

    On-hw crossover study (docs/performance.md, scripts/bench_backends.py):
    the fused condensed kernel wins 22.8x at the reference N=20 but its
    O(N^2)-VMEM condensing windows stop compiling at N=40, where the composed
    backends cross (riccati 1.56x faster at N=40, 1.59x at 80)."""
    qp_backend = str(cfg.solver.get("qp_backend", "auto"))
    if qp_backend == "auto":
        qp_backend = "condensed" if N <= 20 else "riccati"
    return qp_backend


class SolverState(NamedTuple):
    """Warm-start carry: the multiple-shooting trajectory iterate, plus
    (optionally, cfg.solver.dual_warm_start) the QP interior-point state —
    carrying duals across ticks lets a small iteration budget re-converge the
    re-linearized QP (acados qp_solver_warm_start=2 analogue)."""

    X: jax.Array  # (N+1, nx)
    U: jax.Array  # (N, nu)
    qp_duals: Optional[QpDuals] = None


class SolveInputs(NamedTuple):
    """Per-tick runtime data (the reference's yref/W/p marshalling loop,
    ocp.py:162-168, becomes one pytree argument)."""

    x0: jax.Array  # (nx,)
    yref: jax.Array  # (N, ny)
    W: jax.Array  # (N, ny) diagonal weights
    yrefN: jax.Array  # (nyN,)
    WN: jax.Array  # (nyN,)
    p: jax.Array  # (N+1, np)


class SolveResult(NamedTuple):
    state: SolverState
    u0: jax.Array  # (nu,)
    status: jax.Array  # int32: 0 ok, 1 NaN-rejected
    kkt_residual: jax.Array
    qp_complementarity: jax.Array
    evals: Optional[jax.Array]  # (N+1, neval) diagnostics or None


def init_state(ocp: OcpSpec, x0, dtype=jnp.float32,
               dual_warm_start: bool = False) -> SolverState:
    """Fill all nodes with x0 / u_hover (reference ocp.py:144-149)."""
    x0 = jnp.asarray(x0, dtype)
    duals = None
    if dual_warm_start:
        nc = ocp.N * ocp.nh + ocp.nhN
        nz = ocp.N * ocp.nu
        c1 = jnp.full((nc,), 0.1, dtype)
        d1 = jnp.ones((nc,), dtype)
        z1 = jnp.ones((nz,), dtype)
        duals = QpDuals(sl=c1, su=c1, lam_l=d1, lam_u=d1, gam_l=d1, gam_u=d1,
                        nu_l=z1, nu_u=z1)
    return SolverState(
        X=jnp.tile(x0[None, :], (ocp.N + 1, 1)),
        U=jnp.tile(jnp.asarray(ocp.u_hover, dtype)[None, :], (ocp.N, 1)),
        qp_duals=duals,
    )


def shift_state(state: SolverState, k: int) -> SolverState:
    """Shift-by-k warm start (reference ocp.py:152-156).  The vacated tail
    nodes keep their previous values, matching the reference."""
    if k <= 0:
        return state
    X, U = state.X, state.U
    X = X.at[:-k].set(X[k:]) if k < X.shape[0] else X
    U = U.at[:-k].set(U[k:]) if k < U.shape[0] else U
    return SolverState(X=X, U=U, qp_duals=state.qp_duals)


def _scatter_blocks(N: int, nu: int, dtype) -> np.ndarray:
    """S[k]: (nu, N*nu) selection such that S[k] @ dz = du_k."""
    S = np.zeros((N, nu, N * nu), dtype=dtype)
    for k in range(N):
        S[k, :, k * nu : (k + 1) * nu] = np.eye(nu)
    return S


def make_rti_step(ocp: OcpSpec, cfg, with_evals: bool = True,
                  budget: str = "cold"):
    """Build the single-scenario RTI step function.

    Returns step(state, inputs) -> SolveResult.  Pure; jit/vmap it freely.
    with_evals=False skips the per-node diagnostics vector (which re-evaluates
    the SDF network at all N+1 nodes) — use for throughput paths that do not
    consume ``result.evals``.

    budget selects the QP iteration schedule (a *static* choice — two traced
    programs, the host picks per tick; a traced lax.cond would execute both
    sides under vmap):
      "cold"  -- cfg.solver.qp_iters (+ qp_stiff_iters): the cold-start floor.
      "warm"  -- cfg.solver.qp_iters_warm (+ qp_stiff_iters_warm) when set,
                 else the cold budget.  Warm-started RTI ticks re-converge the
                 re-linearized QP in fewer interior-point iterations than a
                 cold start (the acados analogue is HPIPM's early exit under
                 primal warm start, reference ocp.py:113-116, which a batched
                 fixed-shape solve cannot replicate dynamically); the warm
                 floor is measured by the fixed-state replay testbed
                 (scripts/warm_testbed.py, docs/performance.md).
      "steady" -- cfg.solver.qp_iters_steady (+ qp_stiff_iters_steady) when
                 set, else 15 iterations / 4 stiff (the on-hw trained-weights
                 replay floor, retuned from 15/6 in round 4 — see
                 resolve_stiff_knobs and the "auto" branch below; falls back
                 to the warm budget only under recursive_feasibility).  The replay testbed shows the early
                 post-cold ticks (1-3) dominate the warm error while steady
                 ticks converge in noticeably fewer iterations; the
                 controller promotes to this budget after
                 cfg.solver.steady_after consecutive clean warm ticks.
    """
    dtype = jnp.dtype(cfg.solver.dtype)
    if budget not in ("cold", "warm", "steady"):
        raise ValueError(f"unknown budget {budget!r}")
    qp_iters = resolve_iter_budget(cfg, budget)
    qp_stiff_k, qp_stiff_iters, qp_ratio_cap = resolve_stiff_knobs(cfg)
    if budget in ("warm", "steady"):
        qp_stiff_iters = cfg.solver.get("qp_stiff_iters_warm", qp_stiff_iters)
    if budget == "steady":
        ss = cfg.solver.get("qp_stiff_iters_steady", "auto")
        if ss == "auto":
            # auto = 4 (r4 on-hw replay with the trained weights: 15/4 holds
            # max 3.6e-4 — identical to 15/6 — while each stiff->warm swap
            # saves ~2.4 ms at B=8192) unless rec-feas (keep the warm stiff
            # count) or the user overrode the inherited knob to None ('split
            # every iteration') or 0 ('split off') — inherit those instead
            # of re-tuning them.
            if (
                bool(cfg.flags.recursive_feasibility)
                or qp_stiff_iters is None
                or int(qp_stiff_iters) == 0
            ):
                ss = qp_stiff_iters
            else:
                ss = 4
        qp_stiff_iters = None if ss is None else int(ss)
    # qp_ratio_cap is an f32 remedy (mild-row bias at the f32 dtype
    # default cap; docs/performance.md): f64 runs keep the dtype default
    # so reference/golden solves stay uncapped
    if jnp.dtype(cfg.solver.dtype) != jnp.float32:
        qp_ratio_cap = None
    N, nx, nu = ocp.N, ocp.nx, ocp.nu
    nz = N * nu
    nh, nhN = ocp.nh, ocp.nhN

    dt = jnp.asarray(ocp.dt, dtype)
    scale = jnp.asarray(ocp.cost_scaling, dtype)  # (N+1,)
    S = jnp.asarray(_scatter_blocks(N, nu, np.float32), dtype)  # (N, nu, nz)
    lbu = jnp.asarray(ocp.lbu, dtype)
    ubu = jnp.asarray(ocp.ubu, dtype)
    lm = jnp.asarray(ocp.lm_reg, dtype)

    lh = jnp.asarray(ocp.lh, dtype)
    uh = jnp.asarray(ocp.uh, dtype)
    zl = jnp.asarray(ocp.zl, dtype)
    Zl = jnp.asarray(ocp.Zl, dtype)
    lhN = jnp.asarray(ocp.lhN, dtype)
    uhN = jnp.asarray(ocp.uhN, dtype)
    zlN = jnp.asarray(ocp.zlN, dtype)
    ZlN = jnp.asarray(ocp.ZlN, dtype)

    f = ocp.model.f

    # Jacobian mode for the constraint stack: with the neural SDF inside, h has
    # few rows (nh ~ 3) but 14 input dims — reverse mode traverses the MLP
    # nh times instead of nx+nu times (roughly 2x fewer MLP FLOPs per node).
    h_rev = nh > 0 and nh < (nx + nu) // 2
    # fast path: the sdf row's Jacobian is analytic (batched value+grad of the
    # MLP chained through the camera transform, ocp.sdf_row_batch), so only
    # the cheap rows go through AD
    sdf_fast = ocp.sdf_stage_idx is not None and ocp.sdf_row_batch is not None
    n_cheap = nh - 1 if sdf_fast else nh
    cheap_h = ocp.h_stage_cheap if sdf_fast else ocp.h_stage

    # integrator linearization backend: the Pallas lanes kernel fuses the
    # whole jacfwd-through-RK4 tangent chain into VMEM (the XLA lowering
    # accesses ~39 GB of HBM for ~3 GFLOP at B=8192 — docs/performance.md);
    # models opt in via f_lanes, everything else takes the jacfwd path
    lin_impl = str(cfg.solver.get("lin_impl", "auto"))
    use_lanes = ocp.model.f_lanes is not None and dtype == jnp.float32 and (
        lin_impl == "pallas"
        or (lin_impl == "auto" and jax.default_backend() == "tpu")
    )
    # fused variant: the same 14 unit-tangent sweeps also emit the stage
    # residual Jacobians when the model provides y_lanes AND the OCP residual
    # is exactly the model residual (no extension rows like sdf_cost)
    use_lanes_y = (
        use_lanes
        and ocp.model.y_lanes is not None
        and ocp.ny == ocp.model.ny
    )
    lin_y_nodes = None
    if use_lanes_y:
        from ..ops.lin_kernels import make_lin_y_nodes

        layout_qd = ocp.layout.q_d
        lin_y_nodes = make_lin_y_nodes(
            f, ocp.y, ocp.model.f_lanes, ocp.model.y_lanes, layout_qd
        )
    elif use_lanes:
        from ..ops.lin_kernels import make_erk4_sens_nodes

        erk4_sens_nodes = make_erk4_sens_nodes(f, ocp.model.f_lanes)
    else:
        erk4_sens_nodes = lambda X_, U_, dt_: jax.vmap(
            lambda x, u, d: erk4_with_sensitivities(f, x, u, d)
        )(X_, U_, dt_)
    # condensing recursion backend: same gating as the linearization kernel
    # but independent of f_lanes (the recursion only needs A/B/defect)
    use_lanes_condense = dtype == jnp.float32 and (
        lin_impl == "pallas"
        or (lin_impl == "auto" and jax.default_backend() == "tpu")
    )

    def h_node(x, u, p):
        """Cheap (non-sdf) constraint rows + Jacobians for one node."""
        if cheap_h is not None and ocp.cheap_rows_pos_only:
            # the FoV rows read only x[:3] (and no u): 3 forward tangents
            # instead of nx+nu (or n_cheap reverse sweeps)
            h_val = cheap_h(x, u, p)
            h3 = lambda x3: cheap_h(jnp.concatenate([x3, x[3:]]), u, p)
            Jh3 = jax.jacfwd(h3)(x[:3])
            Jhx = jnp.zeros((h_val.shape[0], nx), dtype).at[:, :3].set(
                jnp.asarray(Jh3, dtype)
            )
            Jhu = jnp.zeros((h_val.shape[0], nu), dtype)
            return (jnp.asarray(h_val, dtype), Jhx, Jhu)
        if cheap_h is not None:
            h_fn = lambda xv, uv: cheap_h(xv, uv, p)
            h_val = h_fn(x, u)
            jac = jax.jacrev if h_rev else jax.jacfwd
            Jhx, Jhu = jac(h_fn, argnums=(0, 1))(x, u)
        else:
            h_val = jnp.zeros(0, dtype)
            Jhx = jnp.zeros((0, nx), dtype)
            Jhu = jnp.zeros((0, nu), dtype)
        return tuple(jnp.asarray(v, dtype) for v in (h_val, Jhx, Jhu))

    def lin_node(x, u, p, yref_k):
        """Everything the QP needs from one shooting node except the
        integrator sensitivities (batched separately) and the sdf row
        (stitched in afterwards when the fast path is active)."""
        y_fn = lambda xv, uv: ocp.y(xv, uv, p)
        y_val = y_fn(x, u)
        Jyx = jax.jacfwd(y_fn, argnums=0)(x, u)
        Jyu = jax.jacfwd(y_fn, argnums=1)(x, u)
        res = y_val - yref_k
        # model/ocp functions may emit wider types (e.g. f64 literals under a
        # global x64 setting); pin everything to the solver dtype
        return tuple(
            jnp.asarray(v, dtype) for v in (res, Jyx, Jyu)
        ) + h_node(x, u, p)

    qp_backend = resolve_qp_backend(cfg, N)
    use_riccati = qp_backend == "riccati"

    def _finish(X, U, dX, dU, kkt_residual, complementarity, new_duals, p):
        """Shared trajectory update + NaN guard + status (both QP backends)."""
        U_new = U + dU
        X_new = X + dX
        bad = jnp.logical_or(
            jnp.any(~jnp.isfinite(U_new)), jnp.any(~jnp.isfinite(X_new))
        )
        status = jnp.where(bad, STATUS_NAN, STATUS_OK).astype(jnp.int32)
        kkt_tol = cfg.solver.get("kkt_tol", None)
        if kkt_tol is not None:
            # soft-failure detection (acados reports QP status; our analogue is
            # the stationarity residual of the final IP iterate).  The iterate
            # is kept — like acados, a poor QP still updates the warm start.
            status = jnp.where(
                (status == STATUS_OK) & (kkt_residual > kkt_tol),
                STATUS_NOT_CONVERGED,
                status,
            ).astype(jnp.int32)
        U_new = jnp.where(bad, U, U_new)
        X_new = jnp.where(bad, X, X_new)

        evals = None
        if with_evals and ocp.eval_fn is not None:
            U_pad = jnp.concatenate([U_new, U_new[-1:]], axis=0)
            evals = jax.vmap(ocp.eval_fn)(X_new, U_pad, p)

        return SolveResult(
            state=SolverState(X=X_new, U=U_new, qp_duals=new_duals),
            u0=U_new[0],
            status=status,
            kkt_residual=kkt_residual,
            qp_complementarity=complementarity,
            evals=evals,
        )

    def step(state: SolverState, inp: SolveInputs) -> SolveResult:
        X = jnp.asarray(state.X, dtype)
        U = jnp.asarray(state.U, dtype)
        x0 = jnp.asarray(inp.x0, dtype)
        p = jnp.asarray(inp.p, dtype)
        W = jnp.asarray(inp.W, dtype)
        WN = jnp.asarray(inp.WN, dtype)

        # ---- 1. per-node linearization (parallel over nodes) ----
        if use_lanes_y:
            x_next, A, B, res, Jyx, Jyu = lin_y_nodes(
                X[:N], U, dt, p[:N], jnp.asarray(inp.yref, dtype)
            )
            x_next, A, B, res, Jyx, Jyu = (
                jnp.asarray(v, dtype) for v in (x_next, A, B, res, Jyx, Jyu)
            )
            h_val, Jhx, Jhu = jax.vmap(h_node)(X[:N], U, p[:N])
        else:
            x_next, A, B = erk4_sens_nodes(X[:N], U, dt)
            x_next = jnp.asarray(x_next, dtype)
            A = jnp.asarray(A, dtype)
            B = jnp.asarray(B, dtype)
            res, Jyx, Jyu, h_val, Jhx, Jhu = jax.vmap(lin_node)(
                X[:N], U, p[:N], jnp.asarray(inp.yref, dtype)
            )
        defect = x_next - X[1:]  # (N, nx) multiple-shooting defects

        if sdf_fast:
            # stitch the analytically-differentiated sdf row into the stack:
            # ONE batched MLP value+grad call covers all N nodes
            h_sdf, dhdx3 = ocp.sdf_row_batch(X[:N], p[:N])
            h_full = jnp.zeros((N, nh), dtype)
            Jhx_full = jnp.zeros((N, nh, nx), dtype)
            Jhu_full = jnp.zeros((N, nh, nu), dtype)
            if n_cheap:
                cheap_idx = jnp.asarray(ocp.cheap_stage_indices)
                h_full = h_full.at[:, cheap_idx].set(h_val)
                Jhx_full = Jhx_full.at[:, cheap_idx, :].set(Jhx)
                Jhu_full = Jhu_full.at[:, cheap_idx, :].set(Jhu)
            h_val = h_full.at[:, ocp.sdf_stage_idx].set(h_sdf.astype(dtype))
            Jhx = Jhx_full.at[:, ocp.sdf_stage_idx, :3].set(dhdx3.astype(dtype))
            Jhu = Jhu_full

        yN_fn = lambda xv: ocp.yN(xv, p[N])
        resN = jnp.asarray(yN_fn(X[N]) - jnp.asarray(inp.yrefN, dtype), dtype)
        JxN = jnp.asarray(jax.jacfwd(yN_fn)(X[N]), dtype)
        if ocp.h_term is not None:
            hN_fn = lambda xv: ocp.h_term(xv, p[N])
            hN_val = jnp.asarray(hN_fn(X[N]), dtype)
            jacN = jax.jacrev if (0 < nhN < nx // 2) else jax.jacfwd
            JhxN = jnp.asarray(jacN(hN_fn)(X[N]), dtype)
        else:
            hN_val = jnp.zeros(0, dtype)
            JhxN = jnp.zeros((0, nx), dtype)

        if use_riccati:
            # ---- stage-structured (Riccati) backend: no condensing ----
            e0 = x0 - X[0]
            Ws = W * scale[:N, None]
            Q_st = jnp.einsum("kni,kn,knj->kij", Jyx, Ws, Jyx)
            q_st = jnp.einsum("kni,kn->ki", Jyx, Ws * res)
            R_st = jnp.einsum("knu,kn,knv->kuv", Jyu, Ws, Jyu) + lm * jnp.eye(
                nu, dtype=dtype
            )
            r_st = jnp.einsum("knu,kn->ku", Jyu, Ws * res)
            S_st = jnp.einsum("knu,kn,kni->kui", Jyu, Ws, Jyx)
            QN_st = JxN.T @ (WN[:, None] * JxN)
            qN_st = JxN.T @ (WN * resN)
            # acados LM convention: lm*I on the stage Hessians, NO linear term
            # (the sparse QP is centered at the current iterate; see the
            # condensed path's LM comment and tests/oracle_rti.py)
            Q_all = jnp.concatenate([Q_st, QN_st[None]], axis=0) + lm * jnp.eye(
                nx, dtype=dtype
            )
            q_all = jnp.concatenate([q_st, qN_st[None]], axis=0)

            sqd = StageQpData(
                Q=Q_all, q=q_all, R=R_st, r=r_st, Ssu=S_st,
                A=A, B=B, b=defect, e0=e0,
                Cx=Jhx, Cu=Jhu, c=h_val, lh=lh, uh=uh,
                z1=jnp.broadcast_to(zl, (N, nh)) * scale[:N, None],
                z2=jnp.broadcast_to(Zl, (N, nh)) * scale[:N, None],
                CxN=JhxN, cN=hN_val, lhN=lhN, uhN=uhN, z1N=zlN, z2N=ZlN,
                lb=jnp.broadcast_to(lbu, (N, nu)) - U,
                ub=jnp.broadcast_to(ubu, (N, nu)) - U,
            )
            rres = solve_qp_riccati(
                sqd,
                iters=qp_iters,
                mu0=float(cfg.solver.barrier_init),
                box_margin=float(cfg.solver.box_margin),
                k_stiff=qp_stiff_k,
                stiff_iters=qp_stiff_iters,
                ratio_cap_override=qp_ratio_cap,
            )
            return _finish(X, U, rres.ddx, rres.ddu, rres.kkt_residual,
                           rres.complementarity, state.qp_duals, p)

        # ---- 2. condensing scan: dx_k = e_k + E_k dz ----
        # NOTE: a parallel-prefix (associative_scan) variant was benchmarked
        # and is SLOWER at production batch (20.5k vs 27.6k solves/s at
        # B=8192): the N log N prefix-composition matmul traffic outweighs the
        # latency of N=20 sequential steps once the batch saturates throughput.
        e0 = x0 - X[0]
        G = res_c = C_stage = c_stage = None
        if use_lanes_condense and nh > 0:
            # VMEM-resident lanes kernel: the vmapped scan's broadcast-
            # multiply-reduce spills a (B, nx, nx, nz) temporary per horizon
            # step, and the G/C condensed-row builds spill (B, N, ny, nx, nz)
            # temporaries (~35 ms of assembly at B=8192; docs/performance.md)
            # — the kernel computes all of them against the VMEM-resident E
            from ..ops.condense_kernel import condense_nodes

            (e_stage, E_stage, eN, EN, G, res_c, C_stage, c_stage) = [
                jnp.asarray(v, dtype)
                for v in condense_nodes(
                    A, B, defect, e0, Jyx, Jyu, res, Jhx, Jhu, h_val
                )
            ]
        else:
            E0 = jnp.zeros((nx, nz), dtype)

            def scan_body(carry, xs):
                e_k, E_k = carry
                A_k, B_k, r_k, S_k = xs
                e_next = A_k @ e_k + r_k
                # broadcast-multiply-reduce instead of dot_general: these
                # (10,10) x (10,80) products are far below MXU tile size;
                # under a batch vmap XLA pads them to full 128x128 tiles and
                # the padding is paid in HBM traffic (measured 43 -> 26 ms
                # for the N=20 scan at B=8192, scripts/bench_smallmm.py)
                E_next = (A_k[:, :, None] * E_k[None, :, :]).sum(1) + (
                    B_k[:, :, None] * S_k[None, :, :]
                ).sum(1)
                return (e_next, E_next), (e_k, E_k)

            (eN, EN), (e_stage, E_stage) = jax.lax.scan(
                scan_body, (e0, E0), (A, B, defect, S)
            )

        # ---- 3. condensed Hessian / gradient / constraints ----
        # Contractions over the nx=10 axis are written as broadcast-multiply-
        # reduce, and the Gram products H = sum_row w_r m_r m_r' as ONE
        # stacked (n_rows, nz) weighted matmul: XLA lowers the per-node
        # einsum forms as tiny (ny,nz)-ish GEMMs padded to full 128x128 MXU
        # tiles, paying the padding in HBM traffic (scripts/bench_smallmm.py,
        # docs/performance.md).
        if G is None:
            G = (Jyx[:, :, :, None] * E_stage[:, None, :, :]).sum(2) + (
                Jyu[:, :, :, None] * S[:, None, :, :]
            ).sum(2)  # (N, ny, nz)
            res_c = res + (Jyx * e_stage[:, None, :]).sum(-1)  # res at dz=0
        ny = G.shape[1]
        Ws = W * scale[:N, None]

        GN = (JxN[:, :, None] * EN[None, :, :]).sum(1)  # (nyN, nz)
        resN_c = resN + JxN @ eN

        # Levenberg-Marquardt rows: acados adds lm*I to every sparse-QP stage
        # Hessian (the (dx_k, du_k) step blocks).  Exact condensing of the
        # resulting 0.5*lm*||dx_k||^2 = 0.5*lm*||e_k + E_k dz||^2 keeps the
        # linear term lm*E_k'e_k — so the LM rows carry residual e_k, not 0.
        # (Dropping it would center the step penalty on the defect-propagated
        # trajectory instead: up to 1.4e-1 u0 deviation from acados on cold
        # starts — caught by the independent oracle, tests/oracle_rti.py.)
        E_all = jnp.concatenate([E_stage, EN[None]], axis=0)  # (N+1, nx, nz)
        e_all = jnp.concatenate([e_stage, eN[None]], axis=0)  # (N+1, nx)

        M_rows = jnp.concatenate(
            [G.reshape(N * ny, nz), GN, E_all.reshape((N + 1) * nx, nz)], axis=0
        )
        w_rows = jnp.concatenate(
            [Ws.reshape(N * ny), WN, jnp.full(((N + 1) * nx,), lm, dtype)]
        )
        r_rows = jnp.concatenate(
            [
                (Ws * res_c).reshape(N * ny),
                WN * resN_c,
                lm * e_all.reshape((N + 1) * nx),
            ]
        )
        H = (M_rows.T * w_rows) @ M_rows + lm * jnp.eye(nz, dtype=dtype)
        g = M_rows.T @ r_rows

        # constraint rows
        if nh > 0:
            if C_stage is None:
                C_stage = (Jhx[:, :, :, None] * E_stage[:, None, :, :]).sum(
                    2
                ) + (Jhu[:, :, :, None] * S[:, None, :, :]).sum(2)
                c_stage = h_val + (Jhx * e_stage[:, None, :]).sum(-1)
            # slack penalties share the stage cost scaling (acados cost_scaling)
            z1_stage = jnp.broadcast_to(zl, (N, nh)) * scale[:N, None]
            z2_stage = jnp.broadcast_to(Zl, (N, nh)) * scale[:N, None]
            C_rows = [C_stage.reshape(N * nh, nz)]
            c_rows = [c_stage.reshape(N * nh)]
            lh_rows = [jnp.tile(lh, N)]
            uh_rows = [jnp.tile(uh, N)]
            z1_rows = [z1_stage.reshape(N * nh)]
            z2_rows = [z2_stage.reshape(N * nh)]
        else:
            C_rows, c_rows, lh_rows, uh_rows, z1_rows, z2_rows = [], [], [], [], [], []
        if nhN > 0:
            C_rows.append((JhxN[:, :, None] * EN[None, :, :]).sum(1))
            c_rows.append(hN_val + JhxN @ eN)
            lh_rows.append(lhN)
            uh_rows.append(uhN)
            z1_rows.append(zlN)
            z2_rows.append(ZlN)

        if C_rows:
            C = jnp.concatenate(C_rows, axis=0)
            c0 = jnp.concatenate(c_rows)
            lh_all = jnp.concatenate(lh_rows)
            uh_all = jnp.concatenate(uh_rows)
            z1_all = jnp.concatenate(z1_rows)
            z2_all = jnp.concatenate(z2_rows)
        else:
            C = jnp.zeros((0, nz), dtype)
            c0 = jnp.zeros(0, dtype)
            lh_all = uh_all = z1_all = z2_all = jnp.zeros(0, dtype)

        # ---- 4. QP ----
        qp = QpData(
            H=H,
            g=g,
            C=C,
            c0=c0,
            lh=lh_all,
            uh=uh_all,
            z1=z1_all,
            z2=z2_all,
            lb=(lbu[None, :] - U).reshape(nz),
            ub=(ubu[None, :] - U).reshape(nz),
        )
        if bool(cfg.solver.get("qp_data_bf16", False)):
            # numerics-attribution hook: simulate bf16 STORAGE of the QP
            # matrices (the fused kernel's HBM-traffic lever) while every
            # computation stays f32 — measures the accuracy cost of halving
            # the H/C read traffic before committing to a kernel change
            rnd = lambda a: a.astype(jnp.bfloat16).astype(dtype)
            qp = qp._replace(H=rnd(qp.H), C=rnd(qp.C))
        dual_ws = bool(cfg.solver.get("dual_warm_start", False))
        # the QP interior point is the precision-sensitive region (barrier
        # ratios spanning ~1e10 meet the factorization); it can be pinned to a
        # higher matmul fidelity than the ambient linearization/condensing
        qp_precision = cfg.solver.get("qp_matmul_precision", None) or cfg.solver.get(
            "matmul_precision", "highest"
        )
        with jax.default_matmul_precision(qp_precision):
            qp_res: QpResult = solve_qp(
                qp,
                iters=qp_iters,
                mu0=float(cfg.solver.barrier_init),
                box_margin=float(cfg.solver.box_margin),
                warm_duals=state.qp_duals if dual_ws else None,
                ir_steps=int(cfg.solver.get("ir_steps", 0)),
                k_stiff=qp_stiff_k,
                stiff_iters=qp_stiff_iters,
                chol_impl=cfg.solver.get("chol_impl", "auto"),
                ratio_cap_override=qp_ratio_cap,
                compute_dtype=(
                    jnp.dtype(cfg.solver.qp_compute_dtype)
                    if cfg.solver.get("qp_compute_dtype", None)
                    else None
                ),
            )
        dz = qp_res.dz

        # ---- 5. linear trajectory update + NaN guard ----
        dU = dz.reshape(N, nu)
        dX = jnp.concatenate([e_stage, eN[None]], axis=0) + jnp.einsum(
            "kiz,z->ki", E_all, dz
        )
        new_duals = qp_res.duals if (state.qp_duals is not None) else None
        return _finish(X, U, dX, dU, qp_res.kkt_residual,
                       qp_res.complementarity, new_duals, p)

    def multi_step(state, inp):
        """cfg.solver.sqp_iters Gauss-Newton iterations (1 = RTI)."""
        # TPU MXU lowers f32 matmuls to reduced-precision passes by default
        # (~bf16 inputs) — measured 1e-2-level error in the QP linalg on
        # hardware while CPU tests (exact f32) stay green.  The whole solve
        # traces under HIGHEST; the arithmetic here is bandwidth-dominated,
        # so the extra MXU passes are cheap (measured in docs/performance.md).
        precision = cfg.solver.get("matmul_precision", "highest")
        with jax.default_matmul_precision(precision):
            n_iters = int(cfg.solver.sqp_iters)
            result = step(state, inp)
            for _ in range(n_iters - 1):
                result = step(result.state, inp)
            return result

    return multi_step
