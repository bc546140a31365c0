"""Range/depth image -> pointcloud (reference sdf_nmpc/utils/visualization.py
Imgs2Points), pure jnp.

Pixel-ray conventions preserved exactly:
  Cartesian: rays (1, tan(hfov)(1-u/hw), tan(vfov)(1-v/hh)); for range images
  the ray is normalized first.  Spherical: azimuth/elevation interpolated
  linearly, unit sphere directions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def pixel_grid(height: int, width: int, hfov: float, vfov: float, is_spherical: bool) -> np.ndarray:
    """(3, H, W) per-pixel ray directions (reference visualization.py:80-109)."""
    u, v = np.meshgrid(
        np.arange(width, dtype=np.float32), np.arange(height, dtype=np.float32), indexing="xy"
    )
    hw, hh = width / 2, height / 2
    if is_spherical:
        az = hfov * (1 - u / hw)
        el = vfov * (1 - v / hh)
        p = np.stack([np.cos(el) * np.cos(az), np.cos(el) * np.sin(az), np.sin(el)])
    else:
        p = np.stack([np.ones_like(u), np.tan(hfov) * (1 - u / hw), np.tan(vfov) * (1 - v / hh)])
    return p.astype(np.float32)


def minpool(imgs, k: int):
    """Non-overlapping spatial min-pool on (..., H, W) (H, W divisible by k)."""
    if k == 1:
        return imgs
    *lead, H, W = imgs.shape
    x = imgs.reshape(*lead, H // k, k, W // k, k)
    return x.min(axis=(-3, -1))


def imgs2points(
    imgs,
    dmax: float,
    hfov: float,
    vfov: float,
    is_depth: bool,
    is_spherical: bool,
    downsamp: int = 1,
    remove_d0: bool = False,
    remove_dmax: bool = False,
):
    """(H, W) or (B, H, W) dmax-normalized image -> (N, 3) / (B, N, 3) points.

    With remove_* set, invalid points are filtered (host-side, dynamic shape) —
    use the mask variant ``imgs2points_masked`` inside jit.
    """
    imgs = jnp.asarray(imgs)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    imgs = minpool(imgs, downsamp)
    H, W = imgs.shape[-2:]
    rays = jnp.asarray(pixel_grid(H, W, hfov, vfov, is_spherical))
    if not is_spherical and not is_depth:
        rays = rays / jnp.linalg.norm(rays, axis=0)
    pts = (rays[None] * imgs[:, None] * dmax).reshape(imgs.shape[0], 3, -1)
    pts = jnp.transpose(pts, (0, 2, 1))  # (B, N, 3)

    if remove_d0 or remove_dmax:
        d = pts[..., 0] if is_depth else jnp.linalg.norm(pts, axis=-1)
        keep = jnp.ones(d.shape, bool)
        if remove_d0:
            keep &= d > 0.01
        if remove_dmax:
            keep &= d < dmax * 0.99
        pts = np.asarray(pts)[np.asarray(keep)]
        return pts if not single else pts.reshape(-1, 3)

    return pts[0] if single else pts


def imgs2points_masked(imgs, dmax, hfov, vfov, is_depth, is_spherical, downsamp=1):
    """Static-shape variant: returns (points, valid_mask) with d0/dmax flags."""
    imgs = jnp.asarray(imgs)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    imgs = minpool(imgs, downsamp)
    H, W = imgs.shape[-2:]
    rays = jnp.asarray(pixel_grid(H, W, hfov, vfov, is_spherical))
    if not is_spherical and not is_depth:
        rays = rays / jnp.linalg.norm(rays, axis=0)
    pts = (rays[None] * imgs[:, None] * dmax).reshape(imgs.shape[0], 3, -1)
    pts = jnp.transpose(pts, (0, 2, 1))
    d = pts[..., 0] if is_depth else jnp.linalg.norm(pts, axis=-1)
    mask = (d > 0.01) & (d < dmax * 0.99)
    if single:
        return pts[0], mask[0]
    return pts, mask
