"""Ground-truth collision labelling from depth/range images.

TPU-native replacement for the reference's Warp CUDA kernel
``_kernel_colcheck`` (collision_checker.py:25-91; SURVEY.md §2.3 N5): the
per-point SIMT thread becomes a vectorized gather over all points at once —
jit/vmap-friendly and identical in semantics:

  * points inside the safe ball are free
  * value-of-interest is depth p_x (depth mode) or |p| (range mode)
  * val >= dmax is collision ("beyond the horizon is unsafe")
  * outside-fov policy: 'free' (label 0), 'col' (label 1), or 'extrapolate'
    (clamp the angles onto the image border)
  * otherwise: project to the pixel (tan-interpolated for Cartesian, linear
    for spherical) and label collision iff val >= img[v, u] * dmax
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_OUTSIDE = {"free": 0, "col": 1, "extrapolate": 2}


class ColChecker:
    """Parallel collision checker (reference ColChecker API)."""

    def __init__(self, dmax, hfov, vfov, safe_ball_size, is_depth=False,
                 is_spherical=False, outside="free"):
        assert outside in _OUTSIDE
        self.dmax = float(dmax)
        self.hfov = float(hfov)
        self.vfov = float(vfov)
        self.safe_ball_size = float(safe_ball_size)
        self.is_depth = bool(is_depth)
        self.is_spherical = bool(is_spherical)
        self.outside = _OUTSIDE[outside]
        self._check = jax.jit(partial(check_image_points_impl,
                                      dmax=self.dmax, hfov=self.hfov, vfov=self.vfov,
                                      safe_ball=self.safe_ball_size,
                                      is_depth=self.is_depth,
                                      is_spherical=self.is_spherical,
                                      outside=self.outside))

    def check_image_points(self, imgs, points, p_to_i=None):
        """imgs: (B, H, W) or (H, W) dmax-normalized; points: (N, 3) meters.
        Returns (N,) bool collision labels (True = collision)."""
        imgs = jnp.asarray(imgs, jnp.float32)
        if imgs.ndim == 2:
            imgs = imgs[None]
        points = jnp.asarray(points, jnp.float32)
        if p_to_i is None:
            per_img = points.shape[0] // imgs.shape[0]
            p_to_i = jnp.repeat(jnp.arange(imgs.shape[0]), per_img)
        else:
            p_to_i = jnp.asarray(p_to_i, jnp.int32)
        return self._check(imgs, points, p_to_i)


def check_image_points_impl(imgs, points, p_to_i, *, dmax, hfov, vfov, safe_ball,
                            is_depth, is_spherical, outside):
    """Vectorized kernel body (reference collision_checker.py:47-90)."""
    px, py, pz = points[:, 0], points[:, 1], points[:, 2]
    norm = jnp.linalg.norm(points, axis=1)
    val = px if is_depth else norm

    azimuth = jnp.arctan2(py, px)
    if is_spherical:
        elevation = jnp.arctan2(pz, jnp.sqrt(px**2 + py**2))
    else:
        elevation = jnp.arctan2(pz, px)

    in_fov = (jnp.abs(azimuth) < hfov) & (jnp.abs(elevation) < vfov)
    if outside == 2:  # extrapolate: clamp onto the image border
        azimuth = jnp.clip(azimuth, -hfov, hfov)
        elevation = jnp.clip(elevation, -vfov, vfov)

    H, W = imgs.shape[1], imgs.shape[2]
    if is_spherical:
        u = (W / 2.0 * (1.0 - azimuth / hfov)).astype(jnp.int32)
        v = (H / 2.0 * (1.0 - elevation / vfov)).astype(jnp.int32)
    else:
        u = (W / 2.0 * (1.0 - jnp.tan(azimuth) / np.tan(hfov))).astype(jnp.int32)
        v = (H / 2.0 * (1.0 - jnp.tan(elevation) / np.tan(vfov))).astype(jnp.int32)
    u = jnp.clip(u, 0, W - 1)
    v = jnp.clip(v, 0, H - 1)

    pixel_val = imgs[p_to_i, v, u]
    col_by_pixel = val >= pixel_val * dmax
    col_beyond = val >= dmax

    if outside == 0:  # outside fov is free
        col = jnp.where(col_beyond, True, jnp.where(in_fov, col_by_pixel, False))
    elif outside == 1:  # outside fov is collision
        col = jnp.where(col_beyond, True, jnp.where(in_fov, col_by_pixel, True))
    else:  # extrapolate
        col = col_beyond | col_by_pixel

    return jnp.where(norm <= safe_ball, False, col)
