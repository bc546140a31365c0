"""Property tests for the jnp math library against scipy.spatial and identities.

The reference has no tests (SURVEY.md §4); these pin the conventions
(scalar-first Hamilton quaternions, Z1Y2X3 euler) the whole stack relies on.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from sdf_nmpc_tpu import math as m

RNG = np.random.default_rng(0)


def random_quats(n=50):
    q = RNG.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat2rot_matches_scipy():
    q = random_quats()
    R_ours = np.asarray(m.quat2rot(q))
    # scipy uses scalar-last
    R_scipy = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-6)


def test_euler2rot_matches_scipy():
    eul = RNG.uniform(-1.4, 1.4, size=(50, 3))
    R_ours = np.asarray(m.euler2rot(eul))
    # Z1Y2X3 = extrinsic xyz applied as R = Rz(yaw) Ry(pitch) Rx(roll)
    R_scipy = Rotation.from_euler("xyz", eul).as_matrix()
    np.testing.assert_allclose(R_ours, R_scipy, atol=1e-6)


def test_euler_quat_roundtrip():
    eul = RNG.uniform(-1.0, 1.0, size=(50, 3))
    q = np.asarray(m.euler2quat(eul))
    np.testing.assert_allclose(np.asarray(m.quat2euler(q)), eul, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.quat2rot(q)), np.asarray(m.euler2rot(eul)), atol=1e-5)


def test_rot2euler_roundtrip():
    eul = RNG.uniform(-1.0, 1.0, size=(50, 3))
    R = np.asarray(m.euler2rot(eul))
    np.testing.assert_allclose(np.asarray(m.rot2euler(R)), eul, atol=1e-5)


def test_hamilton_prod_matches_scipy():
    q1, q2 = random_quats(), random_quats()
    ours = np.asarray(m.hamilton_prod(q1, q2))
    r = Rotation.from_quat(q1[:, [1, 2, 3, 0]]) * Rotation.from_quat(q2[:, [1, 2, 3, 0]])
    sp = r.as_quat()[:, [3, 0, 1, 2]]
    # quaternion double cover: compare up to sign
    sign = np.sign(np.sum(ours * sp, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours, sign * sp, atol=1e-6)


def test_quat_invert():
    q = random_quats()
    prod = np.asarray(m.hamilton_prod(q, m.quat_invert(q)))
    expect = np.zeros_like(prod)
    expect[:, 0] = 1.0
    np.testing.assert_allclose(prod, expect, atol=1e-6)


def test_quat2yaw():
    yaw = RNG.uniform(-3.0, 3.0, size=20)
    np.testing.assert_allclose(np.asarray(m.quat2yaw(m.yaw2quat(yaw))), yaw, atol=1e-5)


def test_spherical_roundtrip():
    p = RNG.normal(size=(50, 3))
    s = np.asarray(m.euclidean2spherical(p))
    # note: reference convention has elevation measured FROM +z axis
    # (elevation = atan2(|p_xy|, z)), so roundtrip via spherical2euclidean
    # requires converting: spherical2euclidean expects elevation from xy-plane.
    p2 = np.asarray(
        m.spherical2euclidean(np.stack([s[:, 0], s[:, 1], np.pi / 2 - s[:, 2]], axis=-1))
    )
    np.testing.assert_allclose(p2, p, atol=1e-5)


def test_skew():
    v = RNG.normal(size=(10, 3))
    w = RNG.normal(size=(10, 3))
    cross = np.einsum("nij,nj->ni", np.asarray(m.skew_mat(v)), w)
    np.testing.assert_allclose(cross, np.cross(v, w), atol=1e-6)


def test_polynomial_3variate():
    # degree 2 polynomial with known coefficients: ordering per reference
    exps = m.polynomial_3variate_exponents(2)
    assert exps.shape == (10, 3)
    coeffs = RNG.normal(size=10)
    poly, _ = m.polynomial_3variate(2, coeffs)
    x = RNG.normal(size=(7, 3))
    expect = np.array([sum(c * np.prod(xi**e) for c, e in zip(coeffs, exps)) for xi in x])
    np.testing.assert_allclose(np.asarray(poly(x)), expect, rtol=1e-5)


def test_polynomial_coeff_count_deg4():
    # degree-4 3-variate polynomial has C(7,3)=35 coefficients
    assert m.polynomial_3variate_exponents(4).shape[0] == 35


def test_dist_geo_quat_zero_for_same():
    q = random_quats(5)
    np.testing.assert_allclose(np.asarray(m.dist_geo_quat(q, q)), 0.0, atol=1e-9)


def test_allocation_quad_hover():
    # standard quad-x: thrust along +z, torques balance at equal speeds
    Gf, Gt = m.allocation(4, 0.09, 0, 0, 0.02246, 0.00020673)
    w2 = np.ones(4)
    thrust = Gf @ w2
    np.testing.assert_allclose(thrust, [0, 0, 4], atol=1e-9)
    np.testing.assert_allclose(Gt @ w2, 0, atol=1e-9)


def test_atan2_asin_poly():
    """Mosaic-lowerable inverse trig tracks numpy to f32 ulp-level."""
    import numpy as np
    import jax.numpy as jnp
    from sdf_nmpc_tpu import math as m

    rng = np.random.default_rng(5)
    y = rng.normal(size=4096).astype(np.float32) * 3
    x = rng.normal(size=4096).astype(np.float32) * 3
    got = np.asarray(m.atan2_poly(jnp.asarray(y), jnp.asarray(x)))
    np.testing.assert_allclose(got, np.arctan2(y, x), atol=5e-7)
    # axis cases
    got0 = np.asarray(m.atan2_poly(jnp.asarray([1.0, -1.0, 0.0]), jnp.asarray([0.0, 0.0, 1.0])))
    np.testing.assert_allclose(got0, [np.pi / 2, -np.pi / 2, 0.0], atol=5e-7)
    t = rng.uniform(-1, 1, size=4096).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(m.asin_poly(jnp.asarray(t))), np.arcsin(t), atol=1e-6
    )
