"""Pure-jnp math library: quaternions, rotations, spherical coords, polynomials,
multirotor allocation.

Replaces the reference's dual CasADi/NumPy backend (sdf_nmpc/utils/math.py, 422
LoC with `type(x).__module__` dispatch) with a single differentiable backend:
every function is plain jnp, traceable, vmappable, and grad-able — JAX tracing
subsumes CasADi symbolics (SURVEY.md §2.3 N3).

Conventions match the reference exactly:
  * quaternions are scalar-first [qw qx qy qz], Hamilton convention
  * euler angles are [roll pitch yaw], Z1Y2X3 (yaw-pitch-roll extrinsic)
  * spherical coords are (range, azimuth, elevation)

All functions operate on the last axis and broadcast over leading batch axes.
"""

from __future__ import annotations

import math as _pymath
from functools import partial

import jax.numpy as jnp
import numpy as np

PI = _pymath.pi
GRAVITY = 9.81


# ---------------------------------------------------------------------------
# rotations
# ---------------------------------------------------------------------------

def quat2rot(q):
    """Rotation matrix from quaternion [qw qx qy qz] (reference math.py:7-23).

    q: (..., 4) -> (..., 3, 3)
    """
    q = jnp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = w * w + x * x - y * y - z * z
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = w * w - x * x + y * y - z * z
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = w * w - x * x - y * y + z * z
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def euler2rot(euler):
    """Rotation matrix from [roll pitch yaw], Z1Y2X3 (reference math.py:26-54).

    euler: (..., 3) -> (..., 3, 3)
    """
    euler = jnp.asarray(euler)
    r, p, y = euler[..., 0], euler[..., 1], euler[..., 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cp * cy, sr * sp * cy - cr * sy, cr * sp * cy + sr * sy], axis=-1)
    row1 = jnp.stack([cp * sy, sr * sp * sy + cr * cy, cr * sp * sy - sr * cy], axis=-1)
    row2 = jnp.stack([-sp, sr * cp, cr * cp], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat2euler(q):
    """[roll pitch yaw] from quaternion (reference math.py:57-70)."""
    q = jnp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def quat2yaw(q):
    """Yaw angle from quaternion (reference math.py:73-82)."""
    q = jnp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def rot2euler(R):
    """[roll pitch yaw] from rotation matrix (reference math.py:85-98)."""
    R = jnp.asarray(R)
    roll = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    pitch = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    yaw = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([roll, pitch, yaw], axis=-1)


def rot2quat(R):
    """Quaternion from rotation matrix (via euler, like reference math.py:101-107)."""
    return euler2quat(rot2euler(R))


def euler2quat(euler):
    """Quaternion from [roll pitch yaw] (reference math.py:110-139)."""
    euler = jnp.asarray(euler)
    cr, sr = jnp.cos(euler[..., 0] * 0.5), jnp.sin(euler[..., 0] * 0.5)
    cp, sp = jnp.cos(euler[..., 1] * 0.5), jnp.sin(euler[..., 1] * 0.5)
    cy, sy = jnp.cos(euler[..., 2] * 0.5), jnp.sin(euler[..., 2] * 0.5)
    return jnp.stack(
        [
            cr * cp * cy + sr * sp * sy,
            sr * cp * cy - cr * sp * sy,
            cr * sp * cy + sr * cp * sy,
            cr * cp * sy - sr * sp * cy,
        ],
        axis=-1,
    )


def yaw2quat(yaw):
    """Pure-yaw quaternion (reference math.py:142-166)."""
    yaw = jnp.asarray(yaw)
    h = yaw * 0.5
    z = jnp.zeros_like(h)
    return jnp.stack([jnp.cos(h), z, z, jnp.sin(h)], axis=-1)


def quat_invert(q):
    """Inverse (normalized conjugate) quaternion (reference math.py:169-174)."""
    q = jnp.asarray(q)
    conj = q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)
    return conj / jnp.linalg.norm(q, axis=-1, keepdims=True)


def hamilton_prod(q1, q2):
    """Hamilton product q1*q2 (reference math.py:177-192)."""
    q1, q2 = jnp.asarray(q1), jnp.asarray(q2)
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def dist_geo_quat(q1, q2, eps=1e-6):
    """Squared geodesic distance between quaternions (reference math.py:195-200)."""
    q2i = jnp.asarray(q2) * jnp.asarray([1.0, -1.0, -1.0, -1.0])
    qe = hamilton_prod(q1, q2i)
    normv = jnp.linalg.norm(qe[..., 1:4], axis=-1)
    safe = jnp.maximum(normv, eps)
    ang = jnp.linalg.norm(
        2 * qe[..., 1:4] * (jnp.arctan2(safe, qe[..., 0]) / safe)[..., None], axis=-1
    )
    return jnp.where(normv < eps, 0.0, ang**2)


def dist_quat(q1, q2):
    """1 - |<q1,q2>| angular distance (reference math.py:203-207)."""
    q1n = q1 / jnp.linalg.norm(q1, axis=-1, keepdims=True)
    q2n = q2 / jnp.linalg.norm(q2, axis=-1, keepdims=True)
    return 1 - jnp.abs(jnp.sum(q1n * q2n, axis=-1))


def deuler_avel_map(euler):
    """Map from euler-angle rates to body angular rates (reference math.py:210-226).

    NOTE: replicates the reference's matrix verbatim in behavior (including its
    idiosyncratic (1,3) and (2,3) entries) since quad_att_tau's dynamics are
    defined through it.
    """
    euler = jnp.asarray(euler)
    r, p = euler[..., 0], euler[..., 1]
    one = jnp.ones_like(r)
    zero = jnp.zeros_like(r)
    row0 = jnp.stack([one, jnp.sin(p) * jnp.sin(r) / jnp.cos(p), jnp.sin(p) * jnp.cos(r)], axis=-1)
    row1 = jnp.stack([zero, jnp.cos(r), -jnp.sin(p)], axis=-1)
    row2 = jnp.stack([zero, jnp.sin(r) / jnp.cos(p), jnp.cos(r) / jnp.cos(p)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


# ---------------------------------------------------------------------------
# coordinates
# ---------------------------------------------------------------------------

def euclidean2spherical(p):
    """(range, azimuth, elevation) from xyz (reference math.py:231-244)."""
    p = jnp.asarray(p)
    rng = jnp.linalg.norm(p, axis=-1)
    azimuth = jnp.arctan2(p[..., 1], p[..., 0])
    elevation = jnp.arctan2(jnp.linalg.norm(p[..., :2], axis=-1), p[..., 2])
    return jnp.stack([rng, azimuth, elevation], axis=-1)


def spherical2euclidean(s):
    """xyz from (range, azimuth, elevation) (reference math.py:247-260)."""
    s = jnp.asarray(s)
    r, az, el = s[..., 0], s[..., 1], s[..., 2]
    return jnp.stack(
        [r * jnp.cos(el) * jnp.cos(az), r * jnp.cos(el) * jnp.sin(az), r * jnp.sin(el)],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------

def skew_mat(v):
    """Skew-symmetric matrix of a 3-vector (reference math.py:265-278)."""
    v = jnp.asarray(v)
    z = jnp.zeros_like(v[..., 0])
    row0 = jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1)
    row1 = jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1)
    row2 = jnp.stack([-v[..., 1], v[..., 0], z], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def rad(angle):
    """Degrees to radians (reference math.py:281-283)."""
    return angle * PI / 180.0


# ---------------------------------------------------------------------------
# Mosaic-lowerable inverse trig (Pallas TPU kernels have no atan2/asin
# lowering; these use only mul/add/div/select/abs — Cephes atanf reduction +
# degree-9 odd minimax polynomial, ~1 f32 ulp on the reduced interval).
# Used by the lanes-form model dynamics (ops/lin_kernels.py).
# ---------------------------------------------------------------------------

def _atan_pos(x):
    """atan for x >= 0 (branchless Cephes-style 3-interval reduction)."""
    big = x > 2.414213562373095  # tan(3*pi/8)
    mid = (x > 0.4142135623730950) & ~big  # tan(pi/8)
    x1 = jnp.where(
        big,
        -1.0 / jnp.maximum(x, 1e-30),
        jnp.where(mid, (x - 1.0) / (x + 1.0), x),
    )
    z = x1 * x1
    y = (
        ((8.05374449538e-2 * z - 1.38776856032e-1) * z + 1.99777106478e-1) * z
        - 3.33329491539e-1
    ) * z * x1 + x1
    return y + jnp.where(big, PI / 2, jnp.where(mid, PI / 4, 0.0))


def atan2_poly(y, x):
    """atan2(y, x) from Mosaic-supported primitives (see block comment)."""
    q = _atan_pos(jnp.abs(y) / jnp.maximum(jnp.abs(x), 1e-30))
    ang = jnp.where(x < 0, PI - q, q)
    return jnp.where(y < 0, -ang, ang)


def asin_poly(t):
    """asin(t), |t| <= 1, from Mosaic-supported primitives."""
    t = jnp.clip(t, -1.0, 1.0)
    return atan2_poly(t, jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0)))


# ---------------------------------------------------------------------------
# 3-variate polynomial (braking-distance surrogate)
# ---------------------------------------------------------------------------

def polynomial_3variate_exponents(deg: int) -> np.ndarray:
    """Monomial exponent table for the 3-variate polynomial of degree `deg`.

    Term ordering matches the reference generator (math.py:294-321): iterate
    total_degree = 0..deg, then a = 0..total, b = 0..total-a, c = total-a-b,
    term = x0^a * x1^b * x2^c.  This ordering defines the layout of the fitted
    coefficient .npy files, so it must be stable.
    """
    rows = []
    for total in range(deg + 1):
        for a in range(total + 1):
            for b in range(total + 1 - a):
                rows.append((a, b, total - a - b))
    exps = np.array(rows, dtype=np.int32)
    n_expected = round(_pymath.factorial(deg + 3) / 6 / _pymath.factorial(deg))
    assert len(exps) == n_expected
    return exps


def polynomial_3variate(deg: int, coeffs=None):
    """Differentiable 3-variate polynomial evaluator.

    Returns ``(poly_fn, exponents)``.  If ``coeffs`` is given, ``poly_fn(x)``
    evaluates with those coefficients; otherwise ``poly_fn(x, coeffs)``.
    x: (..., 3) -> (...,). Replaces the CasADi Function of reference
    math.py:294-321 (which is defined twice verbatim there).
    """
    exps = polynomial_3variate_exponents(deg)
    exps_j = jnp.asarray(exps)  # (n_terms, 3) int32

    def _eval(x, c):
        x = jnp.asarray(x)
        # build the power table [x^0 .. x^deg] per coordinate and gather —
        # avoids float-exponent pow (NaN for negative bases, bad gradients)
        powers = jnp.stack([x**k for k in range(deg + 1)], axis=-2)  # (..., deg+1, 3)
        coords = jnp.arange(3)
        monomials = jnp.prod(powers[..., exps_j, coords], axis=-1)  # (..., n_terms)
        return monomials @ jnp.asarray(c)

    if coeffs is None:
        return _eval, exps
    c = jnp.asarray(coeffs)
    return partial(_eval, c=c), exps


# ---------------------------------------------------------------------------
# GTMRP allocation (numpy: static model-construction data, not traced)
# ---------------------------------------------------------------------------

def axis_rot(axis: str, angle: float) -> np.ndarray:
    """Rotation matrix around x/y/z axis (reference math.py:357-364)."""
    c, s = np.cos(angle), np.sin(angle)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    raise ValueError(axis)


def gtmrp_props(n, l, alpha, beta, com=(0, 0, 0), alpha0=-1, s0=1):
    """Prop poses/signs of a Generically Tilted Multi-Rotor Platform
    (reference math.py:367-382).  alpha/beta in degrees."""
    alpha_r, beta_r = rad(alpha), rad(beta)
    R = [
        axis_rot("z", i * (PI / (n / 2)))
        @ axis_rot("y", beta_r)
        @ axis_rot("x", alpha0 * (-1) ** i * alpha_r)
        for i in range(n)
    ]
    p = [l * axis_rot("z", i * (PI / (n / 2))) @ np.array([1.0, 0, 0]) + np.asarray(com, float) for i in range(n)]
    signs = [(-1) ** k * s0 for k in range(n)]
    return p, R, signs


def gtmrp_matrix(R, p, signs, c_f, c_t):
    """Force/torque allocation matrices Gf, Gt (reference math.py:385-396)."""
    Rz = [np.asarray(r) @ np.array([0.0, 0.0, 1.0]) for r in R]
    G_f = np.column_stack(Rz)
    G_t = np.column_stack(
        [
            np.cross(np.asarray(p[i]).flatten(), Rz[i].flatten())
            + c_t[i] / c_f[i] * signs[i] * Rz[i]
            for i in range(len(R))
        ]
    )
    return G_f, G_t


def allocation(n, l, alpha, beta, c_f, c_t, com=(0, 0, 0), signs=1, alpha0=-1):
    """Convenience allocation builder.

    Fixes the reference bug where `signs` was referenced before definition
    (math.py:413-419): here `signs` is a proper parameter (list, or ±1 for an
    alternating pattern starting with that sign).
    """
    if not isinstance(c_f, (list, tuple)):
        c_f = [c_f] * n
    if not isinstance(c_t, (list, tuple)):
        c_t = [c_t] * n
    s0 = signs if not isinstance(signs, (list, tuple)) else 1
    p, R, sgn = gtmrp_props(n, l, alpha, beta, com, alpha0, s0)
    if isinstance(signs, (list, tuple)):
        sgn = list(signs)
    return gtmrp_matrix(R, p, sgn, c_f, c_t)
