"""Nmpc runtime facade — the reference controller API on the TPU solver.

Parity with reference sdf_nmpc/controller.py (class Nmpc): ``reset``,
``set_sdf_flag``, ``set_latent``, ``reset_latent``, ``set_x0``, ``set_ref``,
``solve`` -> fail_count, ``get_u``, clipped ``get_cmd_acc/TRPYr/props``,
``get_matrices``, ``get_openloop_traj``, ``eval(k)``, ``get_t``.

Differences by design:
  * no codegen/build step — the first ``solve`` jit-compiles (and caches) the
    whole SQP-RTI program; ``rebuild`` has no meaning
  * solver failure is a status code from inside the jitted program, not an
    exception (SURVEY.md §5.3); the fail-counter contract is preserved
  * the same OCP powers :class:`BatchedNmpc` — thousands of scenarios vmapped
    and (optionally) sharded over a device mesh (parallel/sharding.py)
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .math import GRAVITY
from .ocp import OcpSpec, build_ocp
from .params import ParamLayout
from .solver import SolveInputs, init_state, make_rti_step, shift_state


class Nmpc:
    """Single-robot NMPC controller with neural-SDF collision prediction."""

    def __init__(self, cfg, sdf_fn=None, sdf_max_df: float = 1.0, bdist_coeffs=None,
                 r_tilde=None, ocp: Optional[OcpSpec] = None,
                 sdf_value_grad_batch=None):
        self.cfg = cfg
        self.layout = ParamLayout.from_cfg(cfg)
        self.T = cfg.mpc.T
        self.N = cfg.mpc.N

        if ocp is None:
            ocp = build_ocp(cfg, sdf_fn=sdf_fn, sdf_max_df=sdf_max_df,
                            bdist_coeffs=bdist_coeffs, r_tilde=r_tilde,
                            sdf_value_grad_batch=sdf_value_grad_batch)
        self.ocp = ocp
        self.model = ocp.model
        # three-budget schedule (solver/sqp.py): the first tick after reset /
        # set_x0 runs the cold iteration budget, subsequent warm-started RTI
        # ticks the (smaller) cfg.solver.qp_iters_warm budget, and after
        # cfg.solver.steady_after consecutive clean warm ticks the (smaller
        # still) steady budget — the acados analogue is HPIPM early-exiting
        # under primal warm start (reference ocp.py:113-116).  Three compiled
        # programs; the host picks.  The replay testbed measures each floor
        # (scripts/warm_testbed.py, docs/performance.md).
        self._step_cold = jax.jit(make_rti_step(ocp, cfg))
        self._step_warm = jax.jit(make_rti_step(ocp, cfg, budget="warm"))
        self._step_steady = jax.jit(make_rti_step(ocp, cfg, budget="steady"))
        self._steady_after = int(cfg.solver.get("steady_after", 3))
        self._warm_tick = False
        self._clean_warm_ticks = 0
        self._dtype = jnp.dtype(cfg.solver.dtype)

        lim = cfg.robot.limits
        ## command clipping bounds (reference controller.py:18-26)
        self.cmd_acc_min = np.array([-lim.ax, -lim.ay, -lim.az, -lim.wz])
        self.cmd_acc_max = np.array([lim.ax, lim.ay, lim.az, lim.wz])
        self.cmd_TRPYr_min = np.array([0.0, -lim.roll, -lim.pitch, -lim.wz])
        self.cmd_TRPYr_max = np.array([lim.gamma, lim.roll, lim.pitch, lim.wz])
        self.cmd_props_min = np.zeros(4)
        self.cmd_props_max = np.full(4, lim.wp)
        self.cmd_TRPYr_hover = np.array([cfg.robot.mass * GRAVITY, 0, 0, 0])

        self.reset()

    # ------------------------------------------------------------------ state
    def reset(self):
        """Reset matrices/flags (reference controller.py:32-43)."""
        self.x0 = None
        self.p = np.zeros((self.N + 1, self.layout.np_total))
        self.y = np.zeros((self.N, self.ocp.ny))
        self.yN = np.zeros(self.ocp.nyN)
        self.W = np.zeros((self.N, self.ocp.ny))
        self.WN = np.zeros(self.ocp.nyN)
        self.fail_count = 0
        self._solver_state = None
        self._warm_tick = False
        self._clean_warm_ticks = 0
        self._u = np.zeros(self.ocp.nu)
        self._evals = None
        self._t = 0.0
        self.set_sdf_flag(False)
        self.reset_latent()

    ## parameter setters (reference controller.py:45-63)
    def set_sdf_flag(self, flag: bool):
        self.layout.set_flag(self.p, float(flag))

    def set_latent(self, latent, W_p_Bo, W_R_Bo):
        """Freeze the current camera pose + latent into ALL N+1 nodes
        (frozen-observation assumption, reference controller.py:50-55)."""
        from .config import sensor_extrinsics

        B_p_C, B_R_C = sensor_extrinsics(self.cfg)
        W_R_Bo = np.asarray(W_R_Bo, dtype=float).reshape(3, 3)
        W_p_Co = W_R_Bo @ B_p_C + np.asarray(W_p_Bo, dtype=float)
        W_R_Co = W_R_Bo @ B_R_C
        self.layout.set_camera(self.p, W_p_Co, W_R_Co)
        self.layout.set_latent(self.p, latent)

    def reset_latent(self):
        self.p[:, list(self.layout.W_p_Co)] = 0.0
        self.p[:, list(self.layout.W_R_Co)] = 0.0
        self.p[:, self.layout.latent_start :] = 0.0

    # -------------------------------------------------------------- iteration
    def set_x0(self, x0, position_safe: bool = True):
        """State feedback; first call seeds the warm start
        (reference controller.py:65-70).

        With cfg.mpc.allow_dead_reck and ``position_safe=False``, the
        measurement update is skipped and the controller dead-reckons on its
        predicted state (reference config ``allow_dead_reck``,
        default.yaml:62)."""
        if (
            self.cfg.mpc.allow_dead_reck
            and not position_safe
            and self.x0 is not None
        ):
            self.x0 = np.asarray(self._solver_state.X[1])  # predicted next state
            return
        x0 = np.asarray(x0, dtype=float)[: self.ocp.nx]
        if self.x0 is None:
            self._solver_state = init_state(
                self.ocp, x0, self._dtype,
                dual_warm_start=bool(self.cfg.solver.get("dual_warm_start", False)),
            )
            self._warm_tick = False  # fresh cold seed -> cold budget next solve
        self.x0 = x0

    def set_ref(self, ref, k: int):
        """Write node-k reference (reference controller.py:133-142)."""
        self.layout.set_q_d(self.p[k], ref.q)
        yr, W = self.ocp.pack_ref(ref)
        if k < self.N:
            self.y[k, :] = yr
            self.W[k, :] = W
        else:
            self.yN[:] = yr[: self.ocp.nyN]
            self.WN[:] = W[: self.ocp.nyN]

    def set_refs(self, refs):
        """Convenience: write a full N+1 reference list."""
        for k, ref in enumerate(refs[: self.N + 1]):
            self.set_ref(ref, k)

    def solve(self) -> int:
        """One RTI solve; returns the consecutive-failure count
        (reference controller.py:72-83)."""
        if self.x0 is None:
            raise RuntimeError("Nmpc.solve() called before set_x0() — feed a state first")
        t0 = time.perf_counter()
        self._solver_state = shift_state(self._solver_state, int(self.cfg.mpc.shift))
        inputs = SolveInputs(
            x0=jnp.asarray(self.x0, self._dtype),
            yref=jnp.asarray(self.y, self._dtype),
            W=jnp.asarray(self.W, self._dtype),
            yrefN=jnp.asarray(self.yN, self._dtype),
            WN=jnp.asarray(self.WN, self._dtype),
            p=jnp.asarray(self.p, self._dtype),
        )
        if not self._warm_tick:
            step = self._step_cold
        elif self._clean_warm_ticks >= self._steady_after:
            step = self._step_steady
        else:
            step = self._step_warm
        result = step(self._solver_state, inputs)
        status = int(result.status)
        if status != 1:  # NaN steps are rejected; others update the iterate
            self._solver_state = result.state
            self._u = np.asarray(result.u0)
            self._evals = None if result.evals is None else np.asarray(result.evals)
        # only a clean solve leaves a trustworthy warm trajectory — a failed
        # tick (NOT_CONVERGED / NaN) drops back to the cold budget, mirroring
        # acados' warm start assuming a converged prior iterate
        if status == 0:
            self._clean_warm_ticks += 1 if self._warm_tick else 0
        else:
            self._clean_warm_ticks = 0
        self._warm_tick = status == 0
        if status == 0:
            self.fail_count = 0
        else:
            self.fail_count += 1
        self._t = time.perf_counter() - t0
        return self.fail_count

    # ---------------------------------------------------------------- getters
    def get_u(self):
        return np.asarray(self._u).flatten()

    def get_t(self) -> float:
        """Last wall-clock solve time [s] (reference ocp.py:177 stat)."""
        return self._t

    def _clipped_cmd(self, fn, lo, hi):
        u = jnp.asarray(self.get_u())
        x = jnp.asarray(self.x0)
        p0 = jnp.asarray(self.p[0])
        return np.clip(np.asarray(fn(x, u, p0)).flatten(), lo, hi)

    def get_cmd_acc(self):
        return self._clipped_cmd(self.model.u_to_acc, self.cmd_acc_min, self.cmd_acc_max)

    def get_cmd_TRPYr(self):
        return self._clipped_cmd(self.model.u_to_TRPYr, self.cmd_TRPYr_min, self.cmd_TRPYr_max)

    def get_cmd_props(self):
        return self._clipped_cmd(self.model.u_to_props, self.cmd_props_min, self.cmd_props_max)

    def get_matrices(self):
        """(X, U) trajectory matrices (reference controller.py:85-93)."""
        st = self._solver_state
        return np.asarray(st.X), np.asarray(st.U)

    def get_openloop_traj(self):
        """[(p, q)] per node, node 0 pinned to x0 (reference controller.py:116-122)."""
        X = np.asarray(self._solver_state.X)
        path = [(self.x0[:3], self.x0[3:7])]
        for k in range(1, self.N + 1):
            path.append((X[k, :3], X[k, 3:7]))
        return path

    def eval(self, k: int):
        """Diagnostics vector at node k (reference controller.py:125-130)."""
        if self._evals is None:
            return [0]
        return self._evals[k]
