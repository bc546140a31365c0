"""GT data-engine tests: collision checker and DF computer golden-tested
against straightforward numpy oracles (SURVEY.md §4 oracle 2 — the reference
Warp kernels are pure functions of (image, points)), plus sampler properties
and loss identities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_nmpc_tpu.data import (
    ColChecker,
    DfComputer,
    ImageAugmenter,
    PosSampler,
    imgs2points,
    loss_kld,
    loss_mse_valid_pixels,
    loss_sdf,
    minpool_ignore_zeros,
)

DMAX, HFOV, VFOV = 5.0, 0.7592, 0.4903
H, W = 30, 50  # divisible by the UDF 5x5 minpool


def numpy_colcheck_oracle(img, points, dmax, hfov, vfov, safe_ball, is_depth, outside):
    """Literal per-point reimplementation of the kernel contract
    (collision_checker.py:47-90), Cartesian non-spherical case."""
    out = np.zeros(len(points), bool)
    Hh, Ww = img.shape
    for i, p in enumerate(points):
        if np.linalg.norm(p) <= safe_ball:
            continue
        val = p[0] if is_depth else np.linalg.norm(p)
        if val >= dmax:
            out[i] = True
            continue
        az = np.arctan2(p[1], p[0])
        el = np.arctan2(p[2], p[0])
        if outside == 2:
            az = np.clip(az, -hfov, hfov)
            el = np.clip(el, -vfov, vfov)
        elif abs(az) >= hfov or abs(el) >= vfov:
            out[i] = outside == 1
            continue
        u = int(np.clip(int(Ww / 2 * (1 - np.tan(az) / np.tan(hfov))), 0, Ww - 1))
        v = int(np.clip(int(Hh / 2 * (1 - np.tan(el) / np.tan(vfov))), 0, Hh - 1))
        if val >= img[v, u] * dmax:
            out[i] = True
    return out


def wall_range_image(wall_x=2.0):
    """Range image of an infinite wall at x = wall_x (depth = wall_x)."""
    from sdf_nmpc_tpu.data.points import pixel_grid

    rays = pixel_grid(H, W, HFOV, VFOV, is_spherical=False)  # (3, H, W), x=1
    rays_n = rays / np.linalg.norm(rays, axis=0)
    # range to the wall along each ray: wall_x / cos = wall_x / rays_n[0]
    rng = wall_x / rays_n[0]
    return np.clip(rng / DMAX, 0, 1).astype(np.float32)


@pytest.mark.parametrize("outside", ["free", "col", "extrapolate"])
@pytest.mark.parametrize("is_depth", [False, True])
def test_colcheck_matches_numpy_oracle(outside, is_depth):
    img = wall_range_image(2.0)
    rng = np.random.default_rng(0)
    pts = rng.uniform([-1, -4, -4], [6, 4, 4], size=(500, 3)).astype(np.float32)
    cc = ColChecker(DMAX, HFOV, VFOV, safe_ball_size=0.2, is_depth=is_depth, outside=outside)
    ours = np.asarray(cc.check_image_points(img, pts))
    oracle = numpy_colcheck_oracle(
        img, pts, DMAX, HFOV, VFOV, 0.2, is_depth, {"free": 0, "col": 1, "extrapolate": 2}[outside]
    )
    # pixel-boundary rounding can differ on a handful of points
    assert (ours == oracle).mean() > 0.99


def test_colcheck_wall_semantics():
    img = wall_range_image(2.0)
    cc = ColChecker(DMAX, HFOV, VFOV, 0, outside="extrapolate")
    pts = np.array([[1.0, 0, 0], [1.9, 0, 0], [2.1, 0, 0], [4.0, 0, 0], [5.5, 0, 0]], np.float32)
    labels = np.asarray(cc.check_image_points(img, pts))
    np.testing.assert_array_equal(labels, [False, False, True, True, True])


def test_udf_wall_distance():
    """In front of a wall at x=2, the UDF ~ distance to the wall (within the
    minpooled-pixel discretization)."""
    img = wall_range_image(2.0)
    dfc = DfComputer(signed=False, dmax=DMAX, hfov=HFOV, vfov=VFOV, max_df=1.0)
    pts = np.array([[1.5, 0, 0], [1.2, 0, 0], [1.95, 0, 0]], np.float32)
    udf, grad = dfc.get_df(img, pts)
    udf = np.asarray(udf)
    np.testing.assert_allclose(udf[0], 0.5, atol=0.08)
    np.testing.assert_allclose(udf[1], 0.8, atol=0.08)
    np.testing.assert_allclose(udf[2], 0.05, atol=0.08)
    # gradient points away from the wall (-x) for points in front of it
    g = np.asarray(grad)
    assert g[0, 0] < -0.8


def test_sdf_sign_and_truncation():
    img = wall_range_image(2.0)
    dfc = DfComputer(signed=True, dmax=DMAX, hfov=HFOV, vfov=VFOV, max_df=1.0)
    pts = np.array(
        [[1.5, 0, 0], [2.3, 0, 0], [0.3, 0, 0]], np.float32
    )  # front / behind / far-front
    sdf, grad = dfc.get_df(img, pts)
    sdf = np.asarray(sdf)
    assert sdf[0] > 0 and sdf[0] < 0.6  # ~0.5 in front
    np.testing.assert_allclose(sdf[0], 0.5, atol=0.08)
    assert sdf[1] < 0  # inside the obstacle region
    np.testing.assert_allclose(sdf[1], -0.3, atol=0.08)  # clamped at min_df
    assert sdf[2] == 1.0  # truncated at max_df
    g = np.asarray(grad)
    assert g[0, 0] < -0.8  # free-space gradient away from wall


def test_minpool_ignore_zeros():
    img = np.full((1, 4, 4), 0.5, np.float32)
    img[0, 0, 0] = 0.0  # invalid pixel must be ignored
    img[0, 2:, 2:] = 0.0  # an all-zero block stays 0
    img[0, 1, 1] = 0.2
    out = np.asarray(minpool_ignore_zeros(jnp.asarray(img), 2))
    np.testing.assert_allclose(out[0], [[0.2, 0.5], [0.5, 0.0]])


def test_imgs2points_unit_range():
    img = np.ones((H, W), np.float32)  # everything at dmax
    pts = np.asarray(imgs2points(img, DMAX, HFOV, VFOV, is_depth=False, is_spherical=False))
    norms = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(norms, DMAX, rtol=1e-5)


def test_pos_sampler_bounds():
    ps = PosSampler(DMAX, HFOV, VFOV)
    key = jax.random.PRNGKey(0)
    ball = np.asarray(ps.sample_pos_in_ball(key, 500, 2.0))
    assert (np.linalg.norm(ball, axis=1) <= 2.0 + 1e-5).all()
    fr = np.asarray(ps.sample_pos_in_frustrum(key, 500))
    az = np.arctan2(fr[:, 1], fr[:, 0])
    assert (np.abs(az) <= HFOV + 1e-5).all()
    assert (np.linalg.norm(fr, axis=1) <= DMAX + 1e-5).all()
    box = np.asarray(ps.sample_pos_in_box(key, 500))
    assert (box[:, 0] >= 0).all() and (box[:, 0] <= DMAX).all()
    marg = np.asarray(ps.sample_pos_in_frustrum_margin(key, 500))
    assert marg.shape == (500, 3)
    # margin points lie outside the strict frustum (az/el/d beyond nominal)
    az = np.arctan2(marg[:, 1], marg[:, 0])
    el = np.arctan2(marg[:, 2], np.linalg.norm(marg[:, :2], axis=1))
    d = np.linalg.norm(marg, axis=1)
    outside = (np.abs(az) > HFOV - 1e-6) | (np.abs(el) > VFOV - 1e-6) | (d > DMAX - 1e-6)
    # ~4 of 5 regions are strictly outside; the reference's +vfov band formula
    # (pos_sampler.py:131) actually samples just INSIDE the edge — preserved
    assert outside.mean() > 0.75
    norm = np.asarray(ps.normalize(jnp.asarray([[DMAX, DMAX * ps.atanh, DMAX * ps.atanv]])))
    np.testing.assert_allclose(norm, 1.0, atol=1e-6)


def test_grids():
    ps = PosSampler(DMAX, HFOV, VFOV)
    g = np.asarray(ps.grid_frustrum(1000))
    assert g.shape[0] == 1000
    s = np.asarray(ps.grid_sphere(1000))
    assert (np.linalg.norm(s, axis=1) <= DMAX + 1e-4).all()
    fs = np.asarray(ps.grid_sphere_fixed_step(1.0, in_frustrum=True))
    az = np.arctan2(fs[:, 1], fs[:, 0])
    assert (np.abs(az) <= HFOV * 1.001 + 1e-6).all()
    sl = np.asarray(ps.grid_frustrum_slice(100, 0.0))
    np.testing.assert_allclose(sl[:, 2], 0.0, atol=1e-5)


def test_loss_masked_mse():
    target = jnp.asarray([[[[0.0, 0.5], [1.0, 0.0]]]])
    reconst = jnp.asarray([[[[0.3, 0.7], [0.5, 0.9]]]])
    # only the two valid target pixels count: (0.2^2 + 0.5^2)
    np.testing.assert_allclose(float(loss_mse_valid_pixels(target, reconst)), 0.04 + 0.25, rtol=1e-6)


def test_loss_kld_zero_at_standard_normal():
    mean = jnp.zeros((4, 8))
    logvar = jnp.zeros((4, 8))
    assert float(loss_kld(mean, logvar, beta=1.0, size_latent=8, size_img=(30, 48))) == 0.0


def test_loss_sdf_components():
    from sdf_nmpc_tpu.nn import init_neural_df

    module, params = init_neural_df(size_latent=4, layer_sizes=(8, 8, 8, 8))
    apply_fn = lambda p, x: module.apply(p, x)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 7)), jnp.float32)
    tgrad = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
    tout = jnp.asarray(rng.normal(size=(16,)), jnp.float32)
    reg, gmse, gdir, eik = loss_sdf(apply_fn, params, x, tgrad, tout)
    for v in (reg, gmse, gdir, eik):
        assert np.isfinite(float(v))


def test_augmenter_shapes_and_determinism():
    aug = ImageAugmenter((1, H, W), noise=True, flip=True, translate=True, rotate=True, erase=True)
    img = jnp.asarray(wall_range_image()[None])
    key = jax.random.PRNGKey(3)
    a1, l1 = aug(key, img)
    a2, l2 = aug(key, img)
    assert a1.shape == img.shape and l1.shape == img.shape
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))  # same key -> same aug
    a3, _ = aug(jax.random.PRNGKey(4), img)
    assert not np.array_equal(np.asarray(a1), np.asarray(a3))


def test_spherical_mode_colcheck_and_points():
    """Lidar-style spherical sensor (reference is_spherical=True, e.g. the
    vae_lidar deployment): pixel coords are linear in azimuth/elevation."""
    hfov, vfov = np.pi, np.pi / 6  # 360-deg horizontal lidar geometry
    Hs, Ws = 20, 100
    from sdf_nmpc_tpu.data.points import pixel_grid

    rays = pixel_grid(Hs, Ws, hfov, vfov, is_spherical=True)
    # unit-sphere directions
    np.testing.assert_allclose(np.linalg.norm(rays, axis=0), 1.0, atol=1e-6)

    # constant-range image: every point closer than that range is free,
    # beyond is collision — in every azimuth direction (360 coverage)
    img = np.full((Hs, Ws), 2.0 / DMAX, np.float32)
    cc = ColChecker(DMAX, hfov, vfov, 0, is_depth=False, is_spherical=True,
                    outside="extrapolate")
    ang = np.linspace(-np.pi * 0.99, np.pi * 0.99, 16)
    near = np.stack([1.5 * np.cos(ang), 1.5 * np.sin(ang), np.zeros_like(ang)], -1)
    far = np.stack([2.5 * np.cos(ang), 2.5 * np.sin(ang), np.zeros_like(ang)], -1)
    labels = np.asarray(cc.check_image_points(img, np.concatenate([near, far]).astype(np.float32)))
    assert not labels[:16].any()
    assert labels[16:].all()

    # points roundtrip: constant range r -> all points at |p| = r
    pts = np.asarray(imgs2points(img, DMAX, hfov, vfov, is_depth=False, is_spherical=True))
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 2.0, rtol=1e-5)


def test_spherical_sdf_wall():
    """Spherical-mode DfComputer: a ring wall at range 2 gives sdf ~ 2-|p|."""
    hfov, vfov = np.pi, np.pi / 6
    Hs, Ws = 20, 100
    img = np.full((Hs, Ws), 2.0 / DMAX, np.float32)
    dfc = DfComputer(signed=True, dmax=DMAX, hfov=hfov, vfov=vfov, max_df=1.0,
                     is_spherical=True)
    pts = np.array([[1.2, 0, 0], [0, 1.7, 0], [-2.4, 0, 0]], np.float32)
    sdf, _ = dfc.get_df(img, pts)
    sdf = np.asarray(sdf)
    np.testing.assert_allclose(sdf[0], 0.8, atol=0.1)
    np.testing.assert_allclose(sdf[1], 0.3, atol=0.1)
    assert sdf[2] < 0  # beyond the ring in the -x direction -> inside obstacle
