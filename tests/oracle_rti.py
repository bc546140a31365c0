"""Independent RTI-tick oracle (VERDICT r1 item 1).

The BASELINE accuracy contract is "u0 error <= 1e-3 vs acados" at the same
horizon/weights (reference sdf_nmpc/ocp.py:104-127: SQP_RTI + GAUSS_NEWTON +
levenberg_marquardt + FULL_CONDENSING_HPIPM with L1/L2 slacks, ocp.py:85-92).
acados itself cannot be installed in this environment (and the shipped CasADi
route is equally unavailable), so this module re-implements ONE acados-style
RTI tick **from the acados semantics, sharing no solver code with the
framework**:

  * dynamics / stage residual / constraint rows are re-written here in torch
    (f64) straight from the reference model equations
    (model/quad_rollpitchyawrate.py:26-55, cost_const_helpers.py:48-76,
    gen_model.py:46-121) — NOT imported from sdf_nmpc_tpu.models/ocp;
  * Jacobians come from torch.autograd (a different AD system than the
    framework's jax.jacfwd / analytic lanes kernels);
  * the NeuralDF forward is re-implemented in torch from the reference
    network spec (network/neural_df.py:7-103), consuming only the raw flax
    weight ARRAYS;
  * the Gauss-Newton QP (exact condensing + L1/L2 slack variables + hard
    input box) is solved to optimality by scipy trust-constr — an entirely
    different algorithm class than the framework's fixed-iteration Mehrotra
    interior point.

Only config VALUES and scenario data cross from the framework side.  Agreement
between this oracle and the framework therefore validates the whole
formulation chain (model, residuals, slack semantics, LM regularization,
cost scaling, condensing) rather than just re-checking one implementation
against itself.

Levenberg-Marquardt convention
------------------------------
acados adds ``lm * I`` to the Hessian of the SPARSE QP (variables dx_k, du_k;
ocp_nlp levenberg_marquardt option).  Condensing dx_k = e_k + E_k dz turns the
stage-x shift into ``0.5*lm*||e_k + E_k dz||^2`` — i.e. the condensed gradient
gains a ``lm * E_k' e_k`` term.  ``lm_convention='acados'`` reproduces exactly
that.  ``lm_convention='framework'`` instead centers the penalty on the
defect-propagated trajectory (``0.5*lm*||E_k dz||^2``, no linear term), which
is what sdf_nmpc_tpu/solver/sqp.py builds.  The two differ only through the
defects e_k (zero once the trajectory is feasible); scripts/oracle_golden.py
measures the cold-start gap between them so the contract is checked against
the true acados convention, not the in-house one.
"""

from __future__ import annotations

import dataclasses
import math as _pymath

import numpy as np
import torch

GRAVITY = 9.81  # reference base_model.py:15


# ---------------------------------------------------------------------------
# math (torch f64) — re-derived from the reference conventions
# (utils/math.py: scalar-first Hamilton quaternions, Z1Y2X3 euler)
# ---------------------------------------------------------------------------


def _quat2rot(q):
    w, x, y, z = q[0], q[1], q[2], q[3]
    return torch.stack(
        [
            torch.stack([w * w + x * x - y * y - z * z, 2 * (x * y - w * z), 2 * (x * z + w * y)]),
            torch.stack([2 * (x * y + w * z), w * w - x * x + y * y - z * z, 2 * (y * z - w * x)]),
            torch.stack([2 * (x * z - w * y), 2 * (y * z + w * x), w * w - x * x - y * y + z * z]),
        ]
    )


def _euler2rot(r, p, y):
    cr, sr = torch.cos(r), torch.sin(r)
    cp, sp = torch.cos(p), torch.sin(p)
    cy, sy = torch.cos(y), torch.sin(y)
    return torch.stack(
        [
            torch.stack([cp * cy, sr * sp * cy - cr * sy, cr * sp * cy + sr * sy]),
            torch.stack([cp * sy, sr * sp * sy + cr * cy, cr * sp * sy - sr * cy]),
            torch.stack([-sp, sr * cp, cr * cp]),
        ]
    )


def _hamilton(q1, q2):
    w1, x1, y1, z1 = q1[0], q1[1], q1[2], q1[3]
    w2, x2, y2, z2 = q2[0], q2[1], q2[2], q2[3]
    return torch.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ]
    )


# ---------------------------------------------------------------------------
# att model (reference model/quad_rollpitchyawrate.py:20-59)
# ---------------------------------------------------------------------------


def _split_norm(x):
    q = x[3:7]
    q = q / torch.linalg.norm(q)
    return x[:3], q, x[7:10]


def _wa(q, u, lim):
    gamma = u[0] * lim["gamma"]
    roll = u[1] * lim["roll"]
    pitch = u[2] * lim["pitch"]
    theta_z = torch.atan2(q[3], q[0])
    qyaw = torch.stack([torch.cos(theta_z), 0 * theta_z, 0 * theta_z, torch.sin(theta_z)])
    W_R_B = _quat2rot(qyaw) @ _euler2rot(roll, pitch, torch.zeros_like(roll))
    thrust = torch.stack([0 * gamma, 0 * gamma, gamma])
    return W_R_B @ thrust + torch.tensor([0.0, 0.0, -GRAVITY], dtype=q.dtype)


def att_f(x, u, lim):
    _, q, v = _split_norm(x)
    wz = u[3] * lim["wz"]
    dq = _hamilton(q, torch.stack([0 * wz, 0 * wz, 0 * wz, wz])) / 2
    return torch.cat([v, dq, _wa(q, u, lim)])


def erk4(f, x, u, dt):
    k1 = f(x, u)
    k2 = f(x + dt / 2 * k1, u)
    k3 = f(x + dt / 2 * k2, u)
    k4 = f(x + dt * k3, u)
    return x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)


# ---------------------------------------------------------------------------
# att_tau model (reference model/quad_rollpitchyawrate_tau.py:19-59): same
# state/interface as att, but commanded roll/pitch act through a first-order
# lag tau=0.12 s with the euler-rate -> body-rate map of reference
# math.py:210-231 (its exact matrix entries, quirks included), and thrust
# acts along the CURRENT attitude (full quat2rot, not the yaw decomposition)
# ---------------------------------------------------------------------------

_TAU_RP = 0.12


def _quat2euler_rp(q):
    """Reference quat2euler roll/pitch rows (math.py:57-70)."""
    roll = torch.atan2(2 * (q[0] * q[1] + q[2] * q[3]), 1 - 2 * (q[1] * q[1] + q[2] * q[2]))
    pitch = torch.asin(2 * (q[0] * q[2] - q[3] * q[1]))
    return roll, pitch


def att_tau_f(x, u, lim):
    _, q, v = _split_norm(x)
    gamma = u[0] * lim["gamma"]
    roll_des = u[1] * lim["roll"]
    pitch_des = u[2] * lim["pitch"]
    wz = u[3] * lim["wz"]
    roll, pitch = _quat2euler_rp(q)
    W_R_B = _quat2rot(q)
    W_a = W_R_B @ torch.stack([0 * gamma, 0 * gamma, gamma]) + torch.tensor(
        [0.0, 0.0, -GRAVITY], dtype=q.dtype
    )
    dr = (roll_des - roll) / _TAU_RP
    dp = (pitch_des - pitch) / _TAU_RP
    # w = deuler_avel_map(eta) @ (dr, dp, 0) — reference matrix rows verbatim
    w0 = dr + torch.sin(pitch) * torch.sin(roll) / torch.cos(pitch) * dp
    w1 = torch.cos(roll) * dp
    dq = _hamilton(q, torch.stack([0 * wz, w0, w1, wz])) / 2
    return torch.cat([v, dq, W_a])


def att_tau_y(x, u, q_d, lim):
    """Stage residual (reference quad_rollpitchyawrate_tau.py:55): same
    layout as att but W_a[2] along the current attitude."""
    pos, q, v = _split_norm(x)
    gamma = u[0] * lim["gamma"]
    roll_des = u[1] * lim["roll"]
    pitch_des = u[2] * lim["pitch"]
    wz = u[3] * lim["wz"]
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    W_a = _quat2rot(q) @ torch.stack([0 * gamma, 0 * gamma, gamma]) + torch.tensor(
        [0.0, 0.0, -GRAVITY], dtype=q.dtype
    )
    return torch.cat([pos, q_e[3:4], v, torch.stack([roll_des, pitch_des, wz, W_a[2]])])


def att_y(x, u, q_d, lim):
    """Stage residual y (reference quad_rollpitchyawrate.py:51)."""
    pos, q, v = _split_norm(x)
    roll = u[1] * lim["roll"]
    pitch = u[2] * lim["pitch"]
    wz = u[3] * lim["wz"]
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    wa = _wa(q, u, lim)
    return torch.cat([pos, q_e[3:4], v, torch.stack([roll, pitch, wz, wa[2]])])


def att_yN(x, q_d, flag, gated):
    pos, q, _ = _split_norm(x)
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    out = torch.cat([pos, q_e[3:4]])
    return out * flag if gated else out


# ---------------------------------------------------------------------------
# props model (reference model/quad_props.py:10-70): per-rotor inputs, full
# rigid-body dynamics.  The allocation matrices are re-derived here in plain
# numpy straight from the reference GTMRP construction (math.py:357-417,
# quad_props.py:20-27) — NOT imported from sdf_nmpc_tpu.math.
# ---------------------------------------------------------------------------


def _axis_rot_np(axis, a):
    c, s = np.cos(a), np.sin(a)
    if axis == "x":
        return np.array([[1.0, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def props_consts_from_cfg(cfg):
    """Allocation/inertia VALUES from config (reference quad_props.py:20-40:
    R_i = Rz(i*pi/(n/2)) Ry(beta_i) Rx((-1)^i alpha_i); Gf = cf*[R_i e3];
    Gt = cf*[p_i x R_i e3 + ct/cf * sign_i * R_i e3])."""
    motors = [list(mt) for mt in cfg.robot.alloc.motors]
    px, py, pz, alpha, beta, sign = (list(c) for c in zip(*motors))
    n = len(sign)
    cf, ct = float(cfg.robot.alloc.cf), float(cfg.robot.alloc.ct)
    R = [
        _axis_rot_np("z", i * (np.pi / (n / 2)))
        @ _axis_rot_np("y", beta[i])
        @ _axis_rot_np("x", (-1) ** i * alpha[i])
        for i in range(n)
    ]
    pos = np.array([px, py, pz], np.float64).T
    Rz = [r @ np.array([0.0, 0, 1]) for r in R]
    Gf = cf * np.column_stack(Rz)
    Gt = cf * np.column_stack(
        [np.cross(pos[i], Rz[i]) + ct / cf * sign[i] * Rz[i] for i in range(n)]
    )
    mass = float(cfg.robot.mass)
    J = np.diag(np.asarray(cfg.robot.inertia, np.float64))
    wh = float(np.sqrt(mass * GRAVITY / (4 * cf)))
    return dict(Gf=Gf, Gt=Gt, mass=mass, J=J, wh=wh)


def _quat2euler_full(q):
    """Reference quat2euler (math.py:57-70)."""
    roll = torch.atan2(2 * (q[0] * q[1] + q[2] * q[3]), 1 - 2 * (q[1] ** 2 + q[2] ** 2))
    pitch = torch.asin(2 * (q[0] * q[2] - q[3] * q[1]))
    yaw = torch.atan2(2 * (q[0] * q[3] + q[1] * q[2]), 1 - 2 * (q[2] ** 2 + q[3] ** 2))
    return torch.stack([roll, pitch, yaw])


def _props_split(x):
    q = x[3:7]
    q = q / torch.linalg.norm(q)
    return x[:3], q, x[7:10], x[10:13]


def props_f(x, u, oc):
    mc = oc.model_consts
    _, q, v, w = _props_split(x)
    wp = u * oc.lim["wp"]
    Gf = torch.as_tensor(mc["Gf"], dtype=x.dtype)
    Gt = torch.as_tensor(mc["Gt"], dtype=x.dtype)
    J = torch.as_tensor(mc["J"], dtype=x.dtype)
    W_a = _quat2rot(q) @ (Gf @ wp**2) / mc["mass"] + torch.tensor(
        [0.0, 0.0, -GRAVITY], dtype=x.dtype
    )
    dq = _hamilton(q, torch.cat([torch.zeros(1, dtype=x.dtype), w])) / 2
    dw = torch.linalg.solve(J, Gt @ wp**2 - torch.linalg.cross(w, J @ w))
    return torch.cat([v, dq, W_a, dw])


def props_y(x, u, q_d, oc):
    """Stage residual (reference quad_props.py:60): (p, eta[:2], q_e[3], v,
    w, wp), ny=16."""
    pos, q, v, w = _props_split(x)
    eta = _quat2euler_full(q)
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    return torch.cat([pos, eta[:2], q_e[3:4], v, w, u * oc.lim["wp"]])


def props_yN(x, q_d, flag, gated, oc):
    pos, q, v, w = _props_split(x)
    eta = _quat2euler_full(q)
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    out = torch.cat([pos, eta[:2], q_e[3:4], v, w])
    return out * flag if gated else out


# ---------------------------------------------------------------------------
# rates model (reference model/quad_rates.py:20-47): BODY-frame velocity
# state (nx=10: p, q, v_body), inputs (gamma, wx, wy, wz); dp = R v,
# dv = R' (0,0,-g) + (0,0,gamma); y = (p, eta[:2], q_e[3], R v, w) ny=12;
# terminal drops w (nyN=9, never flag-gated).  The reference factory leaves
# this model dead (gen_model.py:18) — the framework wires it, so the oracle
# anchors it here.
# ---------------------------------------------------------------------------


def _rates_w(u, lim):
    return torch.stack([u[1] * lim["wx"], u[2] * lim["wy"], u[3] * lim["wz"]])


def rates_f(x, u, lim):
    _, q, v = _split_norm(x)
    gamma = u[0] * lim["gamma"]
    R = _quat2rot(q)
    dq = _hamilton(q, torch.cat([torch.zeros(1, dtype=x.dtype), _rates_w(u, lim)])) / 2
    dv = R.T @ torch.tensor([0.0, 0.0, -GRAVITY], dtype=x.dtype) + torch.stack(
        [0 * gamma, 0 * gamma, gamma]
    )
    return torch.cat([R @ v, dq, dv])


def _body_vel_y_head(x):
    """(pos, eta[:2], q_e-free pieces) shared by the body-velocity models."""
    pos, q, v = _split_norm(x)
    roll, pitch = _quat2euler_rp(q)
    return pos, q, v, torch.stack([roll, pitch])


def rates_y(x, u, q_d, lim):
    pos, q, v, eta2 = _body_vel_y_head(x)
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    return torch.cat([pos, eta2, q_e[3:4], _quat2rot(q) @ v, _rates_w(u, lim)])


def rates_yN(x, q_d, flag, gated):
    pos, q, v, eta2 = _body_vel_y_head(x)
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    return torch.cat([pos, eta2, q_e[3:4], _quat2rot(q) @ v])


# ---------------------------------------------------------------------------
# wrench model (reference model/quad_wrench.py:20-48): nx=13 (p, q, v_body,
# w), inputs (gamma, inertia-normalized torques); translational dynamics as
# rates; dw = torques - cross(w, w) (the gyroscopic term is identically zero
# — reference quirk kept, quad_wrench.py:38); y = yN = (p, eta[:2], q_e[3],
# R v, w), ny = nyN = 12.  Factory-dead in the reference (gen_model.py:19).
# ---------------------------------------------------------------------------


def wrench_f(x, u, lim):
    _, q, v, w = _props_split(x)
    gamma = u[0] * lim["gamma"]
    torques = u[1:] * lim["torques"]
    R = _quat2rot(q)
    dq = _hamilton(q, torch.cat([torch.zeros(1, dtype=x.dtype), w])) / 2
    dv = R.T @ torch.tensor([0.0, 0.0, -GRAVITY], dtype=x.dtype) + torch.stack(
        [0 * gamma, 0 * gamma, gamma]
    )
    dw = torques - torch.linalg.cross(w, w)
    return torch.cat([R @ v, dq, dv, dw])


def wrench_y(x, u, q_d, lim):
    pos, q, v, w = _props_split(x)
    roll, pitch = _quat2euler_rp(q)
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    return torch.cat([pos, torch.stack([roll, pitch]), q_e[3:4], _quat2rot(q) @ v, w])


def wrench_yN(x, q_d, flag, gated):
    return wrench_y(x, None, q_d, None)  # yN == y layout (no u terms)


# ---------------------------------------------------------------------------
# acc model (reference model/quad_acc.py:19-52): kinematic world-frame
# integrator, inputs (normalized world acc, yawrate); y = (p, q_e[3], v, W_a,
# wz) ny=11; terminal (p, q_e[3], v) nyN=7, flag-gated under
# sdf+rec_feas+stability (quad_acc.py:43-47) like att.
# ---------------------------------------------------------------------------


def acc_f(x, u, lim):
    _, q, v = _split_norm(x)
    wz = u[3] * lim["wz"]
    dq = _hamilton(q, torch.stack([0 * wz, 0 * wz, 0 * wz, wz])) / 2
    W_a = torch.stack([u[0] * lim["ax"], u[1] * lim["ay"], u[2] * lim["az"]])
    return torch.cat([v, dq, W_a])


def acc_y(x, u, q_d, lim):
    pos, q, v = _split_norm(x)
    wz = u[3] * lim["wz"]
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    W_a = torch.stack([u[0] * lim["ax"], u[1] * lim["ay"], u[2] * lim["az"]])
    return torch.cat([pos, q_e[3:4], v, W_a, wz[None]])


def acc_yN(x, q_d, flag, gated):
    pos, q, v = _split_norm(x)
    q_inv = q * torch.tensor([1.0, -1, -1, -1], dtype=q.dtype) / torch.linalg.norm(q)
    q_e = _hamilton(q_d, q_inv)
    out = torch.cat([pos, q_e[3:4], v])
    return out * flag if gated else out


ORACLE_MODELS = {
    "att": dict(
        f=lambda x, u, oc: att_f(x, u, oc.lim),
        y=lambda x, u, q_d, oc: att_y(x, u, q_d, oc.lim),
        yN=lambda x, q_d, flag, gated, oc: att_yN(x, q_d, flag, gated),
        nx=10, ny=11,
    ),
    "att_tau": dict(
        f=lambda x, u, oc: att_tau_f(x, u, oc.lim),
        y=lambda x, u, q_d, oc: att_tau_y(x, u, q_d, oc.lim),
        yN=lambda x, q_d, flag, gated, oc: att_yN(x, q_d, flag, gated),
        nx=10, ny=11,
    ),
    "props": dict(f=props_f, y=props_y, yN=props_yN, nx=13, ny=16),
    "rates": dict(
        f=lambda x, u, oc: rates_f(x, u, oc.lim),
        y=lambda x, u, q_d, oc: rates_y(x, u, q_d, oc.lim),
        yN=lambda x, q_d, flag, gated, oc: rates_yN(x, q_d, flag, gated),
        nx=10, ny=12,
    ),
    "wrench": dict(
        f=lambda x, u, oc: wrench_f(x, u, oc.lim),
        y=lambda x, u, q_d, oc: wrench_y(x, u, q_d, oc.lim),
        yN=lambda x, q_d, flag, gated, oc: wrench_yN(x, q_d, flag, gated),
        nx=13, ny=12,
    ),
    "acc": dict(
        f=lambda x, u, oc: acc_f(x, u, oc.lim),
        y=lambda x, u, q_d, oc: acc_y(x, u, q_d, oc.lim),
        yN=lambda x, q_d, flag, gated, oc: acc_yN(x, q_d, flag, gated),
        nx=10, ny=11,
    ),
}


# ---------------------------------------------------------------------------
# NeuralDF forward (reference network/neural_df.py:7-103, embeddings.py:6-104)
# re-implemented in torch over the raw flax weight arrays
# ---------------------------------------------------------------------------


# octahedron projection directions: the 8 cube vertices normalized
# (re-derived from the reference spec, embeddings.py:38-51)
_OCT_DIRS = np.array(
    [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
    np.float64,
).T  # (3, 8) — column order (-1,-1,-1), (-1,-1,+1), ... matches the table
_OCT_DIRS = _OCT_DIRS / np.linalg.norm(_OCT_DIRS, axis=0)


def _pos_embedding(pos, nb_freqs, proj="pos"):
    """[x, sin(2^i A x), cos(2^i A x)] with projection dirs A: identity
    ('pos') or octahedron off-axis ('oct') — reference embeddings.py:24-51,
    forward at :106-111 (dir-major, freq-minor flatten)."""
    freqs = torch.tensor([2.0**i for i in range(nb_freqs)], dtype=pos.dtype)
    if proj == "pos":
        prj = pos
    elif proj == "oct":
        prj = torch.as_tensor(_OCT_DIRS, dtype=pos.dtype).T @ pos  # (8,)
    else:
        raise ValueError(f"oracle embedding {proj!r} not implemented")
    xb = (prj[:, None] * freqs).reshape(-1)  # dir-major, freq-minor
    emb = torch.sin(torch.cat([xb, xb + _pymath.pi / 2]))
    return torch.cat([pos, emb])


def extract_mlp_weights(flax_params) -> dict:
    """Raw (kernel, bias) numpy arrays from a flax NeuralDF param tree."""
    p = flax_params["params"]
    return {
        name: (np.asarray(p[name]["kernel"], np.float64), np.asarray(p[name]["bias"], np.float64))
        for name in ("main1_0", "main1_1", "main2_0", "main2_1", "df")
    }


def neural_df_torch(pos, latent, weights, nb_freqs=5, w0=1.0, res="full",
                    proj="pos"):
    """Scalar truncated-SDF forward, torch f64."""
    dense = lambda h, name: h @ torch.as_tensor(weights[name][0], dtype=h.dtype) + torch.as_tensor(
        weights[name][1], dtype=h.dtype
    )
    act = lambda h: torch.sin(w0 * h)
    emb = _pos_embedding(pos, nb_freqs, proj)
    h = torch.cat([emb, latent])
    h = act(dense(h, "main1_0"))
    h = act(dense(h, "main1_1"))
    if res in ("full", "state"):
        h = torch.cat([h, emb])
    if res in ("full", "latent"):
        h = torch.cat([h, latent])
    h = act(dense(h, "main2_0"))
    h = act(dense(h, "main2_1"))
    return dense(h, "df")[0]


# ---------------------------------------------------------------------------
# 3-variate polynomial (reference math.py:294-321 term ordering)
# ---------------------------------------------------------------------------


def poly3_torch(v, coeffs, deg):
    terms = []
    for total in range(deg + 1):
        for a in range(total + 1):
            for b in range(total + 1 - a):
                c = total - a - b
                terms.append(v[0] ** a * v[1] ** b * v[2] ** c)
    return torch.stack(terms) @ torch.as_tensor(np.asarray(coeffs), dtype=v.dtype)


# ---------------------------------------------------------------------------
# problem assembly from config VALUES (independent p-vector indexing from the
# documented layout default.yaml:64-69: [flag | W_p_Co | W_R_Co row-major |
# q_d | latent])
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class OracleOcp:
    N: int
    dt: np.ndarray  # (N,)
    lim: dict
    u_hover: np.ndarray
    lbu: np.ndarray
    ubu: np.ndarray
    lm: float
    size_latent: int
    flags: dict
    mlp_weights: dict | None
    sdf_max_df: float
    # fov
    hfov: float
    hfov_lim: float
    vfov_lim: float
    fov_offset: np.ndarray
    B_off: np.ndarray  # B_R_C' B_p_C
    # slack weights (z1, z2) per kind
    slack_fov: tuple
    slack_df: tuple
    slack_brake: tuple
    hard_slack: tuple
    # rec-feas / stability
    bdist_coeffs: np.ndarray | None
    bdist_deg: int
    robot_xy: float
    bound_margin: float
    vel_lims: tuple
    yN_gated: bool
    model: str = "att"  # dynamics/residual family (ORACLE_MODELS)
    # NeuralDF hyperparameters (VALUES only — the forward itself is the
    # independent torch re-implementation above)
    sdf_proj: str = "pos"
    sdf_w0: float = 1.0
    sdf_nb_freqs: int = 5
    # per-model constants (props: allocation/inertia, props_consts_from_cfg)
    model_consts: dict | None = None


def build_oracle_ocp(cfg, flax_params=None, sdf_max_df=1.0, bdist_coeffs=None,
                     sdf_proj="pos", sdf_w0=1.0, sdf_nb_freqs=5):
    lim = {k: float(getattr(cfg.robot.limits, k)) for k in (
        "gamma", "roll", "pitch", "wz", "vx", "vy", "vz", "wp",
        "wx", "wy", "ax", "ay", "az", "torques")}
    if cfg.mpc.uniform_dt:
        nodes = np.linspace(0.0, cfg.mpc.T, cfg.mpc.N + 1)
    else:
        ns = cfg.mpc.nb_short_nodes
        dts = cfg.mpc.control_loop_time * 1e-3
        nodes = np.hstack(
            [np.linspace(0, dts * (ns - 1), ns), np.linspace(dts * ns, cfg.mpc.T, cfg.mpc.N - ns + 1)]
        )
    wts = cfg.mpc.weights
    b_p_c = np.array(cfg.robot.sensor_extrinsics.position, np.float64)
    rpy = np.array(cfg.robot.sensor_extrinsics.orientation, np.float64)
    tr = lambda a: torch.tensor(a, dtype=torch.float64)
    B_R_C = _euler2rot(tr(rpy[0]), tr(rpy[1]), tr(rpy[2])).numpy()
    flags = {k: bool(getattr(cfg.flags, k)) for k in (
        "enable_sdf", "sdf_cost", "sdf_constraint", "vfov_constraint",
        "recursive_feasibility", "stability")}
    slack = lambda s: (None if s is None else (float(s[0]), float(s[1])))
    model = str(cfg.mpc.model)
    model_consts = None
    if model == "props":
        model_consts = props_consts_from_cfg(cfg)
        # warm-start input = normalized hover speed (the framework's
        # documented intent-fix of reference quad_props.py:52, which stores
        # the RAW speed wh against a normalized [0,1] input box)
        u_hover = np.full(4, model_consts["wh"] / lim["wp"])
        lbu = np.zeros(4)
        ubu = np.ones(4)
    elif model == "acc":
        u_hover = np.zeros(4)
        lbu = np.array([-1.0, -1, -1, -1])
        ubu = np.array([1.0, 1, 1, 1])
    else:  # att, att_tau, rates, wrench: normalized hover thrust + zero
        # rates (wrench lands here intentionally after the hover intent-fix
        # — reference quad_wrench.py:28 stores RAW g against the [0,1] box)
        u_hover = np.array([GRAVITY / lim["gamma"], 0, 0, 0])
        lbu = np.array([0.0, -1, -1, -1])
        ubu = np.array([1.0, 1, 1, 1])
    return OracleOcp(
        N=int(cfg.mpc.N),
        dt=np.diff(nodes),
        lim=lim,
        u_hover=u_hover,
        lbu=lbu,
        ubu=ubu,
        lm=float(cfg.mpc.lm_reg),
        size_latent=int(cfg.nn.size_latent),
        flags=flags,
        mlp_weights=extract_mlp_weights(flax_params) if flax_params is not None else None,
        sdf_max_df=float(sdf_max_df),
        hfov=float(cfg.sensor.hfov),
        hfov_lim=float(cfg.sensor.hfov) * float(cfg.mpc.fov_ratio),
        vfov_lim=float(cfg.sensor.vfov) * float(cfg.mpc.fov_ratio),
        fov_offset=np.array([float(cfg.mpc.fov_const_offset), 0, 0]),
        B_off=B_R_C.T @ b_p_c,
        slack_fov=slack(wts.slack_fov),
        slack_df=slack(wts.slack_df),
        slack_brake=slack(wts.get("slack_brake", None)),
        hard_slack=(float(cfg.solver.hard_slack[0]), float(cfg.solver.hard_slack[1])),
        bdist_coeffs=None if bdist_coeffs is None else np.asarray(bdist_coeffs, np.float64),
        bdist_deg=int(cfg.mpc.braking_dist.degree),
        robot_xy=float(cfg.robot.size.xy),
        bound_margin=float(cfg.mpc.bound_margin),
        vel_lims=(lim["vx"], lim["vy"], lim["vz"]),
        yN_gated=flags["enable_sdf"] and flags["recursive_feasibility"] and flags["stability"],
        model=model,
        sdf_proj=sdf_proj, sdf_w0=float(sdf_w0), sdf_nb_freqs=int(sdf_nb_freqs),
        model_consts=model_consts,
    )


# p-vector accessors (documented layout, default.yaml:64-69)
def _p_parts(p_row, size_latent):
    t = torch.as_tensor(np.asarray(p_row), dtype=torch.float64)
    flag = t[0]
    W_p_Co = t[1:4]
    W_R_Co = t[4:13].reshape(3, 3)  # row-major
    q_d = t[13:17]
    latent = t[17 : 17 + size_latent]
    return flag, W_p_Co, W_R_Co, q_d, latent


def _constraint_rows(oc: OracleOcp, p_row):
    """[(fn(x,u)->scalar, lh, uh, z1, z2)] stage rows and terminal rows.

    Row order mirrors the build order of the reference model factory
    (gen_model.py:42-149): fov (hfov then vfov, stage+terminal), sdf stage
    (+terminal unless rec-feas), rec-feas terminal block, stability terminal
    velocity bounds.
    """
    flag, W_p_Co, W_R_Co, q_d, latent = _p_parts(p_row, oc.size_latent)
    fov_off = torch.as_tensor(oc.fov_offset, dtype=torch.float64)
    B_off = torch.as_tensor(oc.B_off, dtype=torch.float64)

    def co_p_b(x):
        return W_R_Co.T @ (x[:3] - W_p_Co)

    def hfov_of(pos_fn):
        def h(x, u):
            c = pos_fn(x) + B_off + fov_off
            return flag * torch.atan2(c[1], c[0])

        return h

    def vfov_of(pos_fn):
        def h(x, u):
            c = pos_fn(x) + B_off + fov_off
            return flag * torch.atan2(c[2], torch.linalg.norm(c[:2]))

        return h

    def sdf_flagged(x, u):
        df = neural_df_torch(
            co_p_b(x), latent, oc.mlp_weights, nb_freqs=oc.sdf_nb_freqs,
            w0=oc.sdf_w0, proj=oc.sdf_proj,
        )
        return flag * df + (1 - flag) * oc.sdf_max_df

    stage, term = [], []
    if not oc.flags["enable_sdf"]:
        return stage, term

    fz = oc.slack_fov if oc.slack_fov is not None else oc.hard_slack
    if oc.hfov < 3.14:  # gen_model.py: no hfov row for near-omnidirectional sensors
        stage.append((hfov_of(co_p_b), -oc.hfov_lim, oc.hfov_lim) + fz)
        term.append((hfov_of(co_p_b), -oc.hfov_lim, oc.hfov_lim) + fz)
    if oc.flags["vfov_constraint"]:
        stage.append((vfov_of(co_p_b), -oc.vfov_lim, oc.vfov_lim) + fz)
        term.append((vfov_of(co_p_b), -oc.vfov_lim, oc.vfov_lim) + fz)

    sdf_lb = oc.robot_xy + oc.bound_margin
    sdf_ub = oc.sdf_max_df + 0.2
    dz = oc.slack_df if oc.slack_df is not None else oc.hard_slack
    if oc.flags["sdf_constraint"]:
        stage.append((sdf_flagged, sdf_lb, sdf_ub) + dz)
        if not oc.flags["recursive_feasibility"]:
            term.append((sdf_flagged, sdf_lb, sdf_ub) + dz)

    if oc.flags["recursive_feasibility"]:
        bz = oc.slack_brake if oc.slack_brake is not None else oc.hard_slack

        def bdist(x):
            return poly3_torch(x[7:10], oc.bdist_coeffs, oc.bdist_deg)

        def rec_feas(x, u):
            return sdf_flagged(x, u) - flag * bdist(x)

        term.append((rec_feas, oc.robot_xy, oc.sdf_max_df) + bz)

        def endpoint(x):
            v = x[7:10]
            sm = torch.sqrt(torch.dot(v, v) + 1e-4)
            W_p_E = x[:3] + bdist(x) * v / sm
            return W_R_Co.T @ (W_p_E - W_p_Co) + B_off

        def hfov_end(x, u):
            c = endpoint(x) + fov_off
            return flag * torch.atan2(c[1], c[0])

        term.append((hfov_end, -oc.hfov_lim, oc.hfov_lim) + oc.hard_slack)
        if oc.flags["vfov_constraint"]:

            def vfov_end(x, u):
                c = endpoint(x) + fov_off
                return flag * torch.atan2(c[2], torch.linalg.norm(c[:2]))

            term.append((vfov_end, -oc.vfov_lim, oc.vfov_lim) + oc.hard_slack)

        if oc.flags["stability"]:
            for i, vl in enumerate(oc.vel_lims):
                term.append(
                    ((lambda x, u, j=7 + i: x[j]), -vl, vl) + oc.hard_slack
                )
    return stage, term


# ---------------------------------------------------------------------------
# one RTI tick: cold-start linearize -> exact condensing -> slack QP (scipy)
# ---------------------------------------------------------------------------


def _jac(fn, arg):
    return torch.autograd.functional.jacobian(fn, arg, vectorize=True)


def rti_tick(oc: OracleOcp, x0, p, yref_row, W_row, lm_convention="acados", X=None, U=None):
    """One Gauss-Newton RTI tick from a cold start (or a given (X, U) warm
    trajectory).  Returns dict(u0, dz, qp_optimality, ...).

    p: (N+1, np) parameter rows; yref_row/W_row: one stage row, tiled (the
    canonical accuracy workload uses a constant reference over the horizon);
    terminal uses the first nyN entries.
    """
    N = oc.N
    md = ORACLE_MODELS[oc.model]
    nx, nu = md["nx"], 4
    nz = N * nu
    if X is None:
        X = np.tile(np.asarray(x0, np.float64), (N + 1, 1))
    if U is None:
        U = np.tile(oc.u_hover, (N, 1))
    scale = np.concatenate([oc.dt, [1.0]])

    tt = lambda a: torch.tensor(np.asarray(a, np.float64), dtype=torch.float64)

    # --- per-node linearization (torch autograd) ---
    A = np.zeros((N, nx, nx))
    Bm = np.zeros((N, nx, nu))
    defect = np.zeros((N, nx))
    ny = md["ny"]
    res = np.zeros((N, ny))
    Jyx = np.zeros((N, ny, nx))
    Jyu = np.zeros((N, ny, nu))
    stage_rows = _constraint_rows(oc, p[0])[0]
    term_rows = _constraint_rows(oc, p[N])[1]
    nh, nhN = len(stage_rows), len(term_rows)
    h_val = np.zeros((N, nh))
    Jhx = np.zeros((N, nh, nx))
    Jhu = np.zeros((N, nh, nu))

    yref = np.asarray(yref_row, np.float64)[:ny]
    model_f = lambda a, b: md["f"](a, b, oc)
    model_y = lambda xv, uv, q_d: md["y"](xv, uv, q_d, oc)
    for k in range(N):
        xk, uk = tt(X[k]), tt(U[k])
        dtk = float(oc.dt[k])
        fwd = lambda xv, uv: erk4(model_f, xv, uv, dtk)
        x_next = fwd(xk, uk)
        Ak, Bk = _jac(fwd, (xk, uk))
        A[k], Bm[k] = Ak.numpy(), Bk.numpy()
        defect[k] = x_next.numpy() - X[k + 1]

        _, _, _, q_d, _ = _p_parts(p[k], oc.size_latent)
        yfn = lambda xv, uv: model_y(xv, uv, q_d)
        res[k] = yfn(xk, uk).numpy() - yref
        Jx, Ju = _jac(yfn, (xk, uk))
        Jyx[k], Jyu[k] = Jx.numpy(), Ju.numpy()

        rows_k = stage_rows if k == 0 else _constraint_rows(oc, p[k])[0]
        for i, (fn, *_rest) in enumerate(rows_k):
            h_val[k, i] = float(fn(xk, uk))
            gx, gu = _jac(lambda xv, uv: fn(xv, uv), (xk, uk))
            Jhx[k, i], Jhu[k, i] = gx.numpy(), gu.numpy()

    # terminal.  With stability on, the flag*||v||^2 cost row is appended to
    # yN — and the caller-side packing TRUNCATES the stage weight/target
    # vectors to nyN (reference controller.py:140-142: WN = W[:nyN],
    # yN = y[:nyN]); the computed p_term weight is never applied at runtime
    # in the reference either (Ocp.set_W is dead code, ocp.py:136-141).  The
    # oracle mirrors that truncation exactly (bug-compatible by design —
    # documented in SURVEY.md §7.4).
    flagN, _, _, q_dN, _ = _p_parts(p[N], oc.size_latent)
    xN = tt(X[N])
    has_stab_row = oc.flags["enable_sdf"] and oc.flags["recursive_feasibility"] and oc.flags["stability"]

    def yNfn(xv):
        out = md["yN"](xv, q_dN, flagN, oc.yN_gated, oc)
        if has_stab_row:
            out = torch.cat([out, (flagN * torch.dot(xv[7:10], xv[7:10]))[None]])
        return out

    yN_base = yNfn(xN).numpy()
    JxN = _jac(yNfn, xN).numpy()
    nyN = yN_base.shape[0]
    yrefN = np.asarray(yref_row, np.float64)[:nyN]
    WN = np.asarray(W_row, np.float64)[:nyN]
    resN = yN_base - yrefN

    hN_val = np.zeros(nhN)
    JhxN = np.zeros((nhN, nx))
    for i, (fn, *_rest) in enumerate(term_rows):
        hN_val[i] = float(fn(xN, None))
        JhxN[i] = _jac(lambda xv: fn(xv, None), xN).numpy()

    # --- exact condensing: dx_k = e_k + E_k dz ---
    S = np.zeros((N, nu, nz))
    for k in range(N):
        S[k, :, k * nu : (k + 1) * nu] = np.eye(nu)
    e = np.zeros((N + 1, nx))
    E = np.zeros((N + 1, nx, nz))
    e[0] = np.asarray(x0, np.float64) - X[0]
    for k in range(N):
        e[k + 1] = A[k] @ e[k] + defect[k]
        E[k + 1] = A[k] @ E[k] + Bm[k] @ S[k]

    H = np.zeros((nz, nz))
    g = np.zeros(nz)
    for k in range(N):
        Gk = Jyx[k] @ E[k] + Jyu[k] @ S[k]
        rk = res[k] + Jyx[k] @ e[k]
        Wk = np.asarray(W_row, np.float64)[:ny] * scale[k]
        H += Gk.T @ (Wk[:, None] * Gk)
        g += Gk.T @ (Wk * rk)
    GN = JxN @ E[N]
    H += GN.T @ (WN[:, None] * GN)
    g += GN.T @ (WN * (resN + JxN @ e[N]))
    # Levenberg-Marquardt: lm*I on every sparse-QP block (acados
    # levenberg_marquardt option).  u blocks -> lm*I(nz); x blocks -> the
    # condensed lm*||e + E dz||^2 (acados) or lm*||E dz||^2 (framework).
    for k in range(N + 1):
        H += oc.lm * (E[k].T @ E[k])
        if lm_convention == "acados":
            g += oc.lm * (E[k].T @ e[k])
    H += oc.lm * np.eye(nz)

    # constraint rows: stage-major (k outer), then terminal — and slack
    # penalties share the stage cost scaling (acados cost_scaling semantics)
    C_list, c_list, lo, up, z1, z2 = [], [], [], [], [], []
    for k in range(N):
        for i, (_fn, lh_i, uh_i, z1_i, z2_i) in enumerate(stage_rows):
            C_list.append(Jhx[k, i] @ E[k] + Jhu[k, i] @ S[k])
            c_list.append(h_val[k, i] + Jhx[k, i] @ e[k])
            lo.append(lh_i)
            up.append(uh_i)
            z1.append(z1_i * scale[k])
            z2.append(z2_i * scale[k])
    for i, (_fn, lh_i, uh_i, z1_i, z2_i) in enumerate(term_rows):
        C_list.append(JhxN[i] @ E[N])
        c_list.append(hN_val[i] + JhxN[i] @ e[N])
        lo.append(lh_i)
        up.append(uh_i)
        z1.append(z1_i)
        z2.append(z2_i)
    nc = len(C_list)
    C = np.asarray(C_list).reshape(nc, nz)
    c0 = np.asarray(c_list)
    lo, up, z1, z2 = map(np.asarray, (lo, up, z1, z2))

    lb = np.repeat(oc.lbu[None], N, 0).reshape(nz) - U.reshape(nz)
    ub = np.repeat(oc.ubu[None], N, 0).reshape(nz) - U.reshape(nz)

    dz, qp_info = solve_slack_qp(H, g, C, c0, lo, up, z1, z2, lb, ub)
    dU = dz.reshape(N, nu)
    dX = e + np.einsum("kiz,z->ki", E, dz)
    return {
        "u0": U[0] + dU[0],
        "dz": dz,
        "X_new": X + dX,
        "U_new": U + dU,
        "qp_optimality": qp_info["optimality"],
        "nc": nc,
        "qp": dict(H=H, g=g, C=C, c0=c0, lh=lo, uh=up, z1=z1, z2=z2, lb=lb, ub=ub),
    }


def solve_slack_qp(H, g, C, c0, lo, up, z1, z2, lb, ub):
    """Exact solve of the slacked condensed QP:

        min 0.5 dz'H dz + g'dz + sum_i z1_i (sl_i + su_i)
                                + 0.5 sum_i z2_i (sl_i^2 + su_i^2)
        s.t.  lo - sl <= C dz + c0 <= up + su,   sl, su >= 0,  lb <= dz <= ub

    (acados zl/Zl/zu/Zu semantics with symmetric L1/L2 weights,
    reference ocp.py:85-92).  scipy trust-constr; asserts optimality.
    """
    from scipy.optimize import Bounds, LinearConstraint, minimize

    nz, nc = H.shape[0], C.shape[0]
    n = nz + 2 * nc

    P = np.zeros((n, n))
    P[:nz, :nz] = H
    if nc:
        P[nz : nz + nc, nz : nz + nc] = np.diag(z2)
        P[nz + nc :, nz + nc :] = np.diag(z2)
    q = np.concatenate([g, z1, z1]) if nc else g.copy()

    fun = lambda w: 0.5 * w @ P @ w + q @ w
    jac = lambda w: P @ w + q
    hess = lambda w: P

    bounds = Bounds(
        np.concatenate([lb, np.zeros(2 * nc)]),
        np.concatenate([ub, np.full(2 * nc, np.inf)]),
    )
    constraints = []
    if nc:
        Aeq = np.zeros((2 * nc, n))
        Aeq[:nc, :nz] = C
        Aeq[:nc, nz : nz + nc] = np.eye(nc)  # C dz + sl >= lo - c0
        Aeq[nc:, :nz] = C
        Aeq[nc:, nz + nc :] = -np.eye(nc)  # C dz - su <= up - c0
        lin_lo = np.concatenate([lo - c0, np.full(nc, -np.inf)])
        lin_up = np.concatenate([np.full(nc, np.inf), up - c0])
        constraints.append(LinearConstraint(Aeq, lin_lo, lin_up))

    w0 = np.zeros(n)
    w0[:nz] = np.clip(0.0, lb, ub)
    if nc:
        viol_lo = np.maximum(lo - c0, 0.0)
        viol_up = np.maximum(c0 - up, 0.0)
        w0[nz : nz + nc] = viol_lo
        w0[nz + nc :] = viol_up
    r = None
    for _attempt in range(3):  # warm-restart: trust-constr can stall with a
        r = minimize(          # collapsed trust region on badly-scaled QPs
            fun,               # (e.g. the wrench hover-outside-the-box start)
            w0,
            jac=jac,
            hess=hess,
            bounds=bounds,
            constraints=constraints,
            method="trust-constr",
            options=dict(gtol=1e-12, xtol=1e-14, maxiter=3000, verbose=0),
        )
        if r.optimality < 1e-6:
            break
        w0 = r.x
    opt = float(r.optimality)
    w = r.x
    if opt >= 1e-6:
        # exact active-set KKT polish: trust-constr can stall with a collapsed
        # trust region on badly-scaled QPs (the wrench model's hover-outside-
        # the-box warm start).  Identify the active set from its iterate,
        # solve the equality-constrained KKT system exactly, and accept only
        # if the polished point is primal feasible with correctly-signed
        # multipliers — otherwise keep the (asserted-on) trust-constr point.
        G_rows, h_rows = [], []
        eye = np.eye(n)
        lo_all = np.concatenate([lb, np.zeros(2 * nc)])
        up_all = np.concatenate([ub, np.full(2 * nc, np.inf)])
        for j in range(n):
            G_rows.append(eye[j]); h_rows.append(lo_all[j])        # w_j >= lo
            if np.isfinite(up_all[j]):
                G_rows.append(-eye[j]); h_rows.append(-up_all[j])  # w_j <= up
        if nc:
            for i in range(nc):
                G_rows.append(Aeq[i]); h_rows.append(lo[i] - c0[i])
                G_rows.append(-Aeq[nc + i]); h_rows.append(-(up[i] - c0[i]))
        G = np.asarray(G_rows)
        h = np.asarray(h_rows)
        for tol_act in (1e-4, 1e-5, 1e-6):
            act = (G @ w - h) < tol_act
            Ga, ha = G[act], h[act]
            na = int(act.sum())
            K = np.zeros((n + na, n + na))
            K[:n, :n] = P
            K[:n, n:] = -Ga.T
            K[n:, :n] = Ga
            rhs = np.concatenate([-q, ha])
            sol, *_ = np.linalg.lstsq(K, rhs, rcond=None)
            wp_, lam = sol[:n], sol[n:]
            feas = (G @ wp_ - h).min() if len(h) else 0.0
            stat = np.abs(P @ wp_ + q - Ga.T @ lam).max() if na else np.abs(P @ wp_ + q).max()
            # complementarity: every row in the active-set guess must be TIGHT
            # at the polished point, else lstsq on an over-included guess
            # (tol_act can pull in near-active rows) may return a point where
            # a positively-weighted row is strictly inactive and the three
            # checks above still pass (advisor r4).
            tight = np.abs(Ga @ wp_ - ha).max() if na else 0.0
            if feas > -1e-8 and lam.min() > -1e-7 and stat < 1e-7 and tight < 1e-8:
                w, opt = wp_, float(stat)
                break
    assert opt < 1e-6, f"oracle QP did not converge: {opt}"
    return w[:nz], {"optimality": opt}
