"""OCP assembly: compose cost residual and constraint functions from config.

This is the TPU-native counterpart of the reference "model factory"
(sdf_nmpc/gen_model.py) + cost/constraint helpers
(sdf_nmpc/model/cost_const_helpers.py) + the acados problem translation
(sdf_nmpc/ocp.py:17-127).  Instead of mutating a CasADi symbol container and
code-generating a C solver, we build an immutable :class:`OcpSpec` whose fields
are pure jnp functions; ``jax.jit`` of the SQP step replaces the entire
codegen/compile pipeline (SURVEY.md §3.1).

Constraint handling model
-------------------------
acados/HPIPM distinguishes hard constraints from slacked (soft) ones with
(L1, L2) slack penalties (ocp.py:85-92).  For a batched, fixed-iteration TPU
solver we use the *exact penalty elimination*: for a QP row
``l <= c(z) <= u`` softened with slack weights (z1, z2), the optimal slack is
``s* = max(violation, 0)`` and the slack QP is exactly equivalent to adding the
piecewise-quadratic penalty  ``z1*max(v,0) + 0.5*z2*max(v,0)^2``  to the
objective (the slack block of the KKT system is diagonal and eliminates in
closed form — the same structure HPIPM exploits).  Hard general constraints get
a large default penalty (cfg.solver.hard_slack); input box bounds stay truly
hard in the QP (they bound the decision variable directly).

Flag gating: all perception-dependent rows are multiplied by the runtime flag
parameter exactly like the reference (gen_model.py:58-61), so enabling or
disabling the SDF at runtime is arithmetic, never a recompile.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence

import jax.numpy as jnp
import numpy as np

from . import math as m
from .config import sensor_extrinsics
from .models import make_model
from .models.base import GRAVITY, ModelSpec
from .params import ParamLayout


# ---------------------------------------------------------------------------
# shooting grid
# ---------------------------------------------------------------------------

def shooting_nodes(cfg) -> np.ndarray:
    """Uniform or front-dense shooting grid (reference ocp.py:21-27)."""
    N, T = cfg.mpc.N, cfg.mpc.T
    if cfg.mpc.uniform_dt:
        return np.linspace(0.0, T, N + 1)
    n_short = cfg.mpc.nb_short_nodes
    dt_short = cfg.mpc.control_loop_time * 1e-3
    return np.hstack(
        [
            np.linspace(0.0, dt_short * (n_short - 1), n_short),
            np.linspace(dt_short * n_short, T, N - n_short + 1),
        ]
    )


# ---------------------------------------------------------------------------
# spec
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class OcpSpec:
    """Immutable OCP description consumed by the SQP solver."""

    model: ModelSpec
    layout: ParamLayout
    N: int
    dt: np.ndarray  # (N,) per-interval steps
    ny: int  # total stage residual rows (model.ny + extra cost rows)
    nyN: int
    y: Callable  # y(x, u, p) -> (ny,)
    yN: Callable  # yN(x, p) -> (nyN,)
    extra_W_stage: np.ndarray  # fixed weights of appended stage cost rows
    extra_W_term: np.ndarray
    nh: int  # stage general-constraint rows
    nhN: int
    h_stage: Optional[Callable]  # h(x, u, p) -> (nh,)
    h_term: Optional[Callable]  # hN(x, p) -> (nhN,)
    lh: np.ndarray
    uh: np.ndarray
    zl: np.ndarray  # L1 penalty weights per stage row
    Zl: np.ndarray  # L2 penalty weights per stage row
    lhN: np.ndarray
    uhN: np.ndarray
    zlN: np.ndarray
    ZlN: np.ndarray
    eval_fn: Optional[Callable]  # diagnostics vector (x, u, p) -> (neval,)
    eval_names: tuple
    lbu: np.ndarray
    ubu: np.ndarray
    u_hover: np.ndarray
    lm_reg: float
    cost_scaling: np.ndarray  # (N+1,): acados default = [dt_0..dt_{N-1}, 1]
    # specialized neural-SDF stage row (analytic Jacobian fast path):
    #   sdf_stage_idx  -- index of the sdf row among the stage h rows, or None
    #   sdf_row_batch  -- (X (K, nx), P (K, np)) -> (h (K,), dh/dx[:3] (K, 3))
    #                     for all K nodes in ONE batched call (the natural
    #                     insertion point for ops/sdf_fused.py)
    #   h_stage_cheap  -- composed stage rows EXCLUDING the sdf row (or None)
    #   cheap_stage_indices -- their positions among the nh stage rows
    sdf_stage_idx: Optional[int] = None
    sdf_row_batch: Optional[Callable] = None
    h_stage_cheap: Optional[Callable] = None
    cheap_stage_indices: tuple = ()
    # the cheap rows depend only on x[:3] and p (true for the FoV rows; any
    # caller extension rows clear it) -> the solver differentiates them with
    # 3 position tangents instead of nx+nu
    cheap_rows_pos_only: bool = False

    @property
    def nx(self):
        return self.model.nx

    @property
    def nu(self):
        return self.model.nu

    def pack_ref(self, ref):
        """(yr, W) for one node, with appended cost rows targeting 0 at their
        fixed weights (reference BaseModel.extra_W mechanics,
        base_model.py:128-139)."""
        yr, W = self.model.formate_ref(ref, n_extra=len(self.extra_W_stage))
        if len(self.extra_W_stage):
            W[-len(self.extra_W_stage) :] = self.extra_W_stage
        return yr, W


# ---------------------------------------------------------------------------
# builder
# ---------------------------------------------------------------------------

def _slack_or_hard(cfg, slack) -> tuple[float, float]:
    """Resolve (L1, L2) penalty weights: config slack pair, or the hard-row
    stand-in penalty when the constraint is hard (slack None)."""
    if slack is None:
        hard = cfg.solver.hard_slack
        return float(hard[0]), float(hard[1])
    return float(slack[0]), float(slack[1])


def camera_frame_position(cfg, layout: ParamLayout):
    """Returns fn(x, p) -> position of the body expressed in the *observation*
    camera frame Co (the frozen frame of the last encoded image).

    Mirrors gen_model.py:46-51 / cost_const_helpers args_Co_p_C, without the
    CasADi column-major transpose idiom (p stores W_R_Co row-major).
    """
    B_p_C, B_R_C = sensor_extrinsics(cfg)
    B_off = jnp.asarray(B_R_C.T @ B_p_C, dtype=jnp.float32)

    def co_p_b(x, p):
        W_R_Co = layout.get_W_R_Co(p)
        W_p_Co = layout.get_W_p_Co(p)
        return W_R_Co.T @ (x[:3] - W_p_Co)

    def co_p_c(x, p):
        return co_p_b(x, p) + B_off

    return co_p_b, co_p_c


def build_ocp(
    cfg,
    sdf_fn: Optional[Callable] = None,
    sdf_max_df: float = 1.0,
    bdist_coeffs: Optional[np.ndarray] = None,
    r_tilde: Optional[float] = None,
    extra_cost_stage: Sequence = (),
    extra_cost_term: Sequence = (),
    extra_const_stage: Sequence = (),
    extra_const_term: Sequence = (),
    extra_eval: Sequence = (),
    sdf_value_grad_batch: Optional[Callable] = None,
) -> OcpSpec:
    """Assemble the OCP from config.

    sdf_fn       -- (pos3, latent) -> scalar truncated SDF (the NeuralDF apply,
                    typically from nn.neural_df; weights closed over).  Required
                    when cfg.flags.enable_sdf.
    sdf_max_df   -- network truncation distance (reference sdf.max_df).
    bdist_coeffs -- 3-variate polynomial coefficients for the braking distance
                    (required when cfg.flags.recursive_feasibility).
    r_tilde      -- stability terminal-cost constant; computed from cfg via
                    theory.stability if None and needed.
    extra_*      -- user extension rows (the reference BaseModel add-hook
                    equivalents, base_model.py:119-168; see constraints.py for
                    ready-made builders):
                      cost rows:  (fn, weight)
                      const rows: (fn, lower, upper, z1, z2)
                      eval rows:  (name, fn)
    sdf_value_grad_batch -- optional batched (pos (K,3), latent (K,L)) ->
                    (vals (K,), grads (K,3)) implementation for the sdf
                    constraint row (e.g. the Pallas kernel from ops/);
                    defaults to vmapped jax.value_and_grad of sdf_fn.
    """
    model = make_model(cfg)
    layout = ParamLayout.from_cfg(cfg)
    lim = cfg.robot.limits

    nodes = shooting_nodes(cfg)
    dt = np.diff(nodes)
    N = cfg.mpc.N

    # accumulated rows
    cost_rows_stage: list[Callable] = []  # each: (x, u, p) -> scalar
    cost_w_stage: list[float] = []
    cost_rows_term: list[Callable] = []  # each: (x, p) -> scalar
    cost_w_term: list[float] = []
    h_rows_stage: list[tuple] = []  # (fn(x,u,p)->scalar, l, u, z1, z2)
    h_rows_term: list[tuple] = []  # (fn(x,p)->scalar, l, u, z1, z2)
    eval_rows: list[tuple[str, Callable]] = []  # (name, fn(x,u,p)->scalar)

    co_p_b, co_p_c = camera_frame_position(cfg, layout)
    fov_offset = jnp.asarray([cfg.mpc.fov_const_offset, 0.0, 0.0], dtype=jnp.float32)
    hfov_lim = cfg.sensor.hfov * cfg.mpc.fov_ratio
    vfov_lim = cfg.sensor.vfov * cfg.mpc.fov_ratio

    def _hfov_of(pos_fn):
        def h(x, u, p):
            c = pos_fn(x, p) + fov_offset
            return layout.get_flag(p) * jnp.arctan2(c[1], c[0])

        return h

    def _vfov_of(pos_fn):
        def h(x, u, p):
            c = pos_fn(x, p) + fov_offset
            return layout.get_flag(p) * jnp.arctan2(c[2], jnp.linalg.norm(c[:2]))

        return h

    if cfg.flags.enable_sdf:
        assert sdf_fn is not None, "enable_sdf requires an sdf_fn"

        ## fov constraints (trigo form, cost_const_helpers.py:48-76), stage+term
        fov_z1, fov_z2 = _slack_or_hard(cfg, cfg.mpc.weights.slack_fov)
        if cfg.sensor.hfov < 3.14:
            h_rows_stage.append((_hfov_of(co_p_c), -hfov_lim, hfov_lim, fov_z1, fov_z2))
            h_rows_term.append(
                (lambda x, p, f=_hfov_of(co_p_c): f(x, None, p), -hfov_lim, hfov_lim, fov_z1, fov_z2)
            )
        if cfg.flags.vfov_constraint:
            h_rows_stage.append((_vfov_of(co_p_c), -vfov_lim, vfov_lim, fov_z1, fov_z2))
            h_rows_term.append(
                (lambda x, p, f=_vfov_of(co_p_c): f(x, None, p), -vfov_lim, vfov_lim, fov_z1, fov_z2)
            )

        ## flag-gated sdf (gen_model.py:58-61): flag*df + (1-flag)*max_df
        def sdf_flagged(x, p):
            flag = layout.get_flag(p)
            df = sdf_fn(co_p_b(x, p), layout.get_latent(p))
            return flag * df + (1 - flag) * sdf_max_df

        def sdf_unflagged(x, p):
            return sdf_fn(co_p_b(x, p), layout.get_latent(p))

        sdf_bounds = (cfg.robot.size.xy + cfg.mpc.bound_margin, sdf_max_df + 0.2)
        eval_rows.append(("sdf", lambda x, u, p: sdf_unflagged(x, p)))

        if cfg.flags.sdf_cost:
            # (1 - 0.5*sdf)^4 cost row at weight 20 (gen_model.py:65-66)
            cost_rows_stage.append(lambda x, u, p: (1 - 0.5 * sdf_flagged(x, p)) ** 4)
            cost_w_stage.append(20.0)

        sdf_stage_idx = None
        if cfg.flags.sdf_constraint:
            df_z1, df_z2 = _slack_or_hard(cfg, cfg.mpc.weights.slack_df)
            sdf_stage_idx = len(h_rows_stage)
            h_rows_stage.append(
                (lambda x, u, p: sdf_flagged(x, p), sdf_bounds[0], sdf_bounds[1], df_z1, df_z2)
            )
            if not cfg.flags.recursive_feasibility:
                h_rows_term.append((sdf_flagged, sdf_bounds[0], sdf_bounds[1], df_z1, df_z2))

        ## recursive feasibility terminal ingredients (gen_model.py:73-121).
        ## Wired through the model's vel_world hook (not a hard-coded state
        ## layout), mirroring how the reference composes them through model
        ## hooks — any model exposing a world-frame velocity qualifies.
        if cfg.flags.recursive_feasibility:
            assert model.vel_world is not None, (
                "recursive feasibility needs a model exposing world-frame "
                "velocity (ModelSpec.vel_world)"
            )
            assert bdist_coeffs is not None, "recursive_feasibility requires bdist_coeffs"
            bdist_poly, _ = m.polynomial_3variate(cfg.mpc.braking_dist.degree, bdist_coeffs)
            vel_w = model.vel_world

            def braking_dist_flag(x, p):
                return layout.get_flag(p) * bdist_poly(vel_w(x))

            def braking_dist_raw(x, p):
                return bdist_poly(vel_w(x))

            def rec_feas(x, p):
                return sdf_flagged(x, p) - braking_dist_flag(x, p)

            def braking_endpoint(x, p):
                """Camera-frame position of the braking stop point Co_p_E
                (gen_model.py:107-114)."""
                v = vel_w(x)
                smooth_norm = jnp.sqrt(jnp.dot(v, v) + 1e-4)
                W_p_E = x[:3] + braking_dist_raw(x, p) * v / smooth_norm
                W_R_Co = layout.get_W_R_Co(p)
                W_p_Co = layout.get_W_p_Co(p)
                B_p_C, B_R_C = sensor_extrinsics(cfg)
                off = jnp.asarray(B_R_C.T @ B_p_C, dtype=x.dtype)
                return W_R_Co.T @ (W_p_E - W_p_Co) + off

            eval_rows.append(("braking_dist", lambda x, u, p: braking_dist_raw(x, p)))
            eval_rows.append(
                ("rec_feas_margin", lambda x, u, p: sdf_unflagged(x, p) - braking_dist_raw(x, p))
            )

            bk_z1, bk_z2 = _slack_or_hard(cfg, cfg.mpc.weights.slack_brake)
            h_rows_term.append((rec_feas, cfg.robot.size.xy, sdf_max_df, bk_z1, bk_z2))
            hard_z1, hard_z2 = _slack_or_hard(cfg, None)

            def hfov_endpoint(x, p):
                c = braking_endpoint(x, p) + fov_offset
                return layout.get_flag(p) * jnp.arctan2(c[1], c[0])

            h_rows_term.append((hfov_endpoint, -hfov_lim, hfov_lim, hard_z1, hard_z2))
            if cfg.flags.vfov_constraint:

                def vfov_endpoint(x, p):
                    c = braking_endpoint(x, p) + fov_offset
                    return layout.get_flag(p) * jnp.arctan2(c[2], jnp.linalg.norm(c[:2]))

                h_rows_term.append((vfov_endpoint, -vfov_lim, vfov_lim, hard_z1, hard_z2))

            ## stability terminal cost (gen_model.py:124-149)
            if cfg.flags.stability:
                hard = _slack_or_hard(cfg, None)
                for i, axis_lim in enumerate((lim.vx, lim.vy, lim.vz)):
                    h_rows_term.append(
                        (
                            lambda x, p, j=7 + i: x[j],
                            -axis_lim,
                            axis_lim,
                            hard[0],
                            hard[1],
                        )
                    )

                wts = cfg.mpc.weights  # stage-cost upper bound sc_max
                max_vel_error = (2 * cfg.ref.vref) ** 2 * max(wts.set_const_off.vel)
                max_att = np.array([lim.roll, lim.pitch, lim.wz])
                att_w = np.diag(list(wts.set_const_off.att[:2]) + list(wts.set_const_off.rates[2:]))
                max_att_error = float(max_att @ att_w @ max_att)
                acc_w = wts.set_const_off.acc
                max_thrust_error = max(
                    acc_w * (lim.gamma - GRAVITY) ** 2, acc_w * GRAVITY**2
                )
                sc_max = max_vel_error + max_att_error + max_thrust_error
                ab_min = cfg.mpc.stability.a_b_min
                dt_stab = cfg.mpc.T / cfg.mpc.N
                if r_tilde is None:
                    from .theory.stability import get_r_tilde_max

                    r_tilde = get_r_tilde_max(cfg)
                p_term = max(r_tilde + max_vel_error, sc_max / ab_min**2 / dt_stab**2)

                cost_rows_term.append(
                    # ||v||^2 is rotation-invariant, so the raw velocity
                    # states serve body- and world-frame models alike
                    lambda x, p: layout.get_flag(p) * jnp.dot(x[7:10], x[7:10])
                )
                cost_w_term.append(float(p_term))

    # ---- user extension rows (reference add_cost/const hooks) ----
    for fn, w in extra_cost_stage:
        cost_rows_stage.append(fn)
        cost_w_stage.append(float(w))
    for fn, w in extra_cost_term:
        cost_rows_term.append(fn)
        cost_w_term.append(float(w))
    h_rows_stage.extend(extra_const_stage)
    h_rows_term.extend(extra_const_term)
    eval_rows.extend(extra_eval)

    # ---- compose residuals ----
    extra_W_stage = np.asarray(cost_w_stage, dtype=np.float64)
    extra_W_term = np.asarray(cost_w_term, dtype=np.float64)

    def y_full(x, u, p):
        base = model.y(x, u, p)
        if cost_rows_stage:
            extra = jnp.stack([fn(x, u, p) for fn in cost_rows_stage])
            return jnp.concatenate([base, extra])
        return base

    def yN_full(x, p):
        base = model.yN(x, p)
        if cost_rows_term:
            extra = jnp.stack([fn(x, p) for fn in cost_rows_term])
            return jnp.concatenate([base, extra])
        return base

    def _compose_h(rows, with_u):
        if not rows:
            return None

        if with_u:

            def h(x, u, p):
                return jnp.stack([fn(x, u, p) for fn, *_ in rows])

        else:

            def h(x, p):
                return jnp.stack([fn(x, p) for fn, *_ in rows])

        return h

    h_stage = _compose_h(h_rows_stage, with_u=True)
    h_term = _compose_h(h_rows_term, with_u=False)

    def _bounds(rows):
        if not rows:
            z = np.zeros(0)
            return z, z, z, z
        arr = np.array([[r[1], r[2], r[3], r[4]] for r in rows], dtype=np.float64)
        return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3]

    lh, uh, zl, Zl = _bounds(h_rows_stage)
    lhN, uhN, zlN, ZlN = _bounds(h_rows_term)

    eval_fn = None
    if eval_rows:

        def eval_fn(x, u, p):  # noqa: F811
            return jnp.stack([fn(x, u, p) for _, fn in eval_rows])

    ## specialized sdf stage row: the MLP's position gradient is computed once
    ## per node by a batched value+grad call and chained analytically
    ## (dpos/dx[:3] = W_R_Co^T  =>  dh/dx[:3] = flag * W_R_Co @ grad_pos),
    ## instead of differentiating the whole constraint stack through the MLP
    sdf_row_batch = None
    h_stage_cheap = None
    cheap_stage_indices = ()
    if cfg.flags.enable_sdf and cfg.flags.sdf_constraint and not cfg.flags.sdf_cost:
        import jax as _jax

        vg = sdf_value_grad_batch
        if vg is None:
            _scalar_vg = _jax.value_and_grad(sdf_fn, argnums=0)

            def vg(pos, latent):  # noqa: F811
                vals, grads = _jax.vmap(_scalar_vg)(pos, latent)
                return vals, grads

        def sdf_row_batch(X, P):  # noqa: F811
            W_R = _jax.vmap(layout.get_W_R_Co)(P)  # (K, 3, 3)
            W_p = _jax.vmap(layout.get_W_p_Co)(P)
            pos = jnp.einsum("kij,ki->kj", W_R, X[:, :3] - W_p)  # R^T (x - c)
            latents = _jax.vmap(layout.get_latent)(P)
            vals, grads = vg(pos, latents)
            flag = P[:, layout.flag]
            h = flag * vals + (1 - flag) * sdf_max_df
            dhdx3 = flag[:, None] * jnp.einsum("kij,kj->ki", W_R, grads)
            return h, dhdx3

        cheap_rows = [r for i, r in enumerate(h_rows_stage) if i != sdf_stage_idx]
        cheap_stage_indices = tuple(
            i for i in range(len(h_rows_stage)) if i != sdf_stage_idx
        )
        h_stage_cheap = _compose_h(cheap_rows, with_u=True)
        # without caller extensions the cheap rows are exactly the FoV rows,
        # which read only the position block of x (and no u)
        cheap_pos_only = len(extra_const_stage) == 0
        del cheap_rows
    else:
        sdf_stage_idx = None
        cheap_pos_only = False

    return OcpSpec(
        model=model,
        layout=layout,
        N=N,
        dt=dt,
        ny=model.ny + len(cost_rows_stage),
        nyN=model.nyN + len(cost_rows_term),
        y=y_full,
        yN=yN_full,
        extra_W_stage=extra_W_stage,
        extra_W_term=extra_W_term,
        nh=len(h_rows_stage),
        nhN=len(h_rows_term),
        h_stage=h_stage,
        h_term=h_term,
        lh=lh,
        uh=uh,
        zl=zl,
        Zl=Zl,
        lhN=lhN,
        uhN=uhN,
        zlN=zlN,
        ZlN=ZlN,
        eval_fn=eval_fn,
        eval_names=tuple(name for name, _ in eval_rows),
        sdf_stage_idx=sdf_stage_idx,
        sdf_row_batch=sdf_row_batch,
        h_stage_cheap=h_stage_cheap,
        cheap_stage_indices=cheap_stage_indices,
        cheap_rows_pos_only=(
            h_stage_cheap is not None and cheap_pos_only
        ),
        lbu=model.lbu,
        ubu=model.ubu,
        u_hover=model.u_hover,
        lm_reg=float(cfg.mpc.lm_reg),
        cost_scaling=np.concatenate([dt, [1.0]]),
    )
