"""Reference generation: Ref/Waypoint types and the RefGen trajectory sampler.

Host-side numpy (this is mission-planning glue feeding the device solver, not
hot-path compute).  Parity targets: sdf_nmpc/ref_gen.py and
sdf_nmpc/utils/reference.py, with the documented intent fixed where the
reference is buggy (SURVEY.md §7.4):

  * Ref carries its *active* weight set directly (Wp/Wq/Wv/Ww/Wa attributes) —
    in the reference these attributes are expected by every ``formate_ref`` but
    never set by Ref itself, and Ref's W_on/W_off are filled from the
    *opposite*-named config sets (reference.py:15-28).  Here
    ``use_constrained_weights(True)`` selects ``set_const_on``.
  * ``Ref.from_state`` actually constructs a Ref (reference.py:30-38 assigns to
    a local ``self`` — a no-op).
  * The arc-length resampler tests ``total_distance > 1e-3`` (reference
    ref_gen.py:57 used truthy division).
  * yaw_mode 'current' is spelled correctly (reference compares to 'curent',
    ref_gen.py:12).
"""

from __future__ import annotations

import copy

import numpy as np

from .math import quat2yaw, yaw2quat


def _np_yaw2quat(yaw: float) -> np.ndarray:
    return np.asarray(yaw2quat(float(yaw)), dtype=float)


def _np_quat2yaw(q) -> float:
    return float(quat2yaw(np.asarray(q, dtype=float)))


class Ref:
    """Single-node reference: pose/velocity targets + active tracking weights."""

    def __init__(self, cfg):
        self.cfg = cfg
        self.p = np.zeros(3)
        self.q = np.array([1.0, 0.0, 0.0, 0.0])
        self.v = np.zeros(3)
        self.wz = 0.0
        self.use_constrained_weights(False)

    def use_constrained_weights(self, constrained: bool):
        """Select the weight set: set_const_on when constraints are active
        (sdf flag on), set_const_off otherwise.  Fixes the reference's
        W_on/W_off naming inversion."""
        ws = (
            self.cfg.mpc.weights.set_const_on
            if constrained
            else self.cfg.mpc.weights.set_const_off
        )
        self.Wp = np.asarray(ws.pos, dtype=float)
        self.Wq = np.asarray(ws.att, dtype=float)
        self.Wv = np.asarray(ws.vel, dtype=float)
        self.Ww = np.asarray(ws.rates, dtype=float)
        self.Wa = float(ws.acc)
        return self

    @classmethod
    def from_state(cls, cfg, x):
        """Ref tracking the given state (fixes reference.py:30-38 no-op)."""
        ref = cls(cfg)
        ref.p = np.asarray(x[:3], dtype=float)
        ref.q = np.asarray(x[3:7], dtype=float)
        ref.v = np.asarray(x[7:10], dtype=float)
        ref.wz = float(x[12]) if len(x) > 12 else 0.0
        return ref

    def hover_at_state(self, x):
        """In-place hover reference at a state (reference.py:40-44)."""
        self.p = np.asarray(x[:3], dtype=float)
        self.q = _np_yaw2quat(_np_quat2yaw(x[3:7]))
        self.v = np.zeros(3)
        self.wz = 0.0
        return self


class Waypoint:
    def __init__(self, p, q=(1, 0, 0, 0)):
        self.p = np.array(p, dtype=float)
        self.q = np.array(q, dtype=float)

    def __str__(self):
        return f"{self.p}, yaw={_np_quat2yaw(self.q):.3f}"


class RefGen:
    """Generates per-node reference lists for the controller.

    Parity with sdf_nmpc/ref_gen.py: hover ref from x0, waypoint-polyline
    arc-length resampling at vref spacing with stop-and-turn and four yaw
    modes, and joystick velocity/yawrate teleop references.
    """

    def __init__(self, cfg):
        self.cfg = cfg
        self.x0 = None
        self.ref = Ref(cfg)
        self.force_yaw_current = self.cfg.ref.yaw_mode == "current"

    def _reset(self):
        self.ref = Ref(self.cfg)

    def set_x0(self, x0):
        self.x0 = np.asarray(x0, dtype=float)

    def from_x0(self):
        """Hover reference at the current state (ref_gen.py:17-23)."""
        ref = copy.copy(self.ref)
        ref.p = self.x0[:3]
        ref.q = _np_yaw2quat(_np_quat2yaw(self.x0[3:7]))
        ref.v = np.zeros(3)
        ref.wz = 0.0
        return [ref] * self.cfg.mpc.N

    def gen_ref_list_wps(self, wps):
        """Arc-length-resampled waypoint reference (ref_gen.py:25-99)."""
        self._reset()
        trajectory = []

        path_p = np.vstack([self.x0[:3]] + [wp.p for wp in wps])
        path_q = np.vstack([self.x0[3:7]] + [wp.q for wp in wps])
        path_yaw = [_np_quat2yaw(q) for q in path_q]

        ## stop-and-turn: if yaw error is large, command a pure rotation first
        if self.cfg.ref.stop_and_turn.enable:
            yaw_curr = path_yaw[0]
            yaw_r = yaw_curr
            if self.cfg.ref.yaw_mode == "ref":
                yaw_r = _np_quat2yaw(path_q[1])
            elif self.cfg.ref.yaw_mode == "align":
                dxy = path_p[1][:2] - self.x0[:2]
                if np.linalg.norm(dxy) > self.cfg.ref.yaw_align_dmin:
                    yaw_r = np.arctan2(dxy[1], dxy[0])
                yaw_r += self.cfg.ref.align_yaw_offset
            if abs(yaw_curr - yaw_r) > self.cfg.ref.stop_and_turn.dang_min:
                ref = copy.copy(self.ref)
                ref.p = self.x0[:3]
                ref.v = np.zeros(3)
                ref.q = _np_yaw2quat(yaw_r)
                return [ref] * self.cfg.mpc.N

        ## cumulative arc length along polyline
        distances = np.linalg.norm(np.diff(path_p, axis=0), axis=1)
        cumulative = np.concatenate([[0.0], np.cumsum(distances)])
        total_distance = cumulative[-1]

        if total_distance > 1e-3:  # fixes ref_gen.py:57 truthiness test
            vref = min(self.cfg.ref.vref, total_distance)  # overshoot heuristic

            spacing = self.cfg.mpc.T / self.cfg.mpc.N * vref
            even = np.arange(0, total_distance, spacing)
            for d in even:
                seg = int(np.searchsorted(cumulative, d)) - 1
                seg = max(0, min(seg, len(distances) - 1))
                direction = (path_p[seg + 1] - path_p[seg]) / distances[seg]
                delta = d - cumulative[seg]

                ref = copy.copy(self.ref)
                ref.p = path_p[seg] + direction * delta
                ref.v = direction * vref

                if self.force_yaw_current:
                    ref.q = path_q[0]
                elif self.cfg.ref.yaw_mode == "ref":
                    ref.q = _np_yaw2quat(path_yaw[seg + 1])
                elif self.cfg.ref.yaw_mode == "align":
                    dxy = path_p[1][:2] - self.x0[:2]
                    if np.linalg.norm(dxy) > self.cfg.ref.yaw_align_dmin:
                        yaw_r = np.arctan2(ref.v[1], ref.v[0]) + self.cfg.ref.align_yaw_offset
                        ref.q = _np_yaw2quat(yaw_r)
                    else:
                        ref.q = path_q[0]
                else:  # 'zero'
                    ref.q = np.array([1.0, 0.0, 0.0, 0.0])

                trajectory.append(ref)
                if len(trajectory) > self.cfg.mpc.N:
                    break

        ## pad to N+1 nodes holding the endpoint
        while len(trajectory) <= self.cfg.mpc.N:
            ref = copy.copy(self.ref)
            ref.p = trajectory[-1].p if trajectory else path_p[-1]
            ref.q = trajectory[-1].q if trajectory else path_q[-1]
            trajectory.append(ref)

        return trajectory

    def gen_ref_joystick(self, vwref):
        """Velocity/yawrate teleop reference (ref_gen.py:101-127).
        vwref -- normalized (vx, vy, vz, wz) in [-1, 1]."""
        ref = copy.copy(self.ref)
        ref.v = np.asarray(vwref[:3], dtype=float) * self.cfg.ref.vref
        ref.wz = float(vwref[3]) * self.cfg.ref.wzref

        if self.force_yaw_current:
            ref.q = _np_yaw2quat(_np_quat2yaw(self.x0[3:7]))
        elif self.cfg.ref.yaw_mode == "align":
            vxy = ref.v[:2]
            if np.linalg.norm(vxy) > self.cfg.ref.yaw_align_dmin:
                ref.q = _np_yaw2quat(np.arctan2(vxy[1], vxy[0]))
            else:
                ref.q = _np_yaw2quat(_np_quat2yaw(self.x0[3:7]))
        else:
            ref.q = np.array([1.0, 0.0, 0.0, 0.0])

        ## integrate positions for downstream visualization
        trajectory = []
        for i in range(self.cfg.mpc.N + 1):
            node = copy.copy(ref)
            node.p = self.x0[:3] + ref.v * i * self.cfg.mpc.T / self.cfg.mpc.N
            trajectory.append(node)
        return trajectory
