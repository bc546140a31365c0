"""Analytic SDF scenes + range-image rendering.

The reference validates closed-loop behavior in external Gazebo worlds
(SURVEY.md §4).  This module provides the in-framework equivalent: analytic
signed-distance scenes (spheres, axis-aligned boxes, slabs/walls) that serve
as ground-truth oracles — directly as the OCP's sdf_fn (bypassing the neural
net), as the plant-side collision monitor, and as a depth-camera simulator via
sphere tracing along the sensor pixel rays.

Scenes are pytrees of primitive parameter arrays, so thousands of randomized
scenes batch/vmap like everything else.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.points import pixel_grid


class Scene(NamedTuple):
    """Analytic world: union of spheres and axis-aligned boxes.

    sphere_c: (S, 3), sphere_r: (S,); box_lo/box_hi: (K, 3).  Use zero-size
    primitives (r = -inf style padding) to keep shapes static across a batch.
    """

    sphere_c: jax.Array
    sphere_r: jax.Array
    box_lo: jax.Array
    box_hi: jax.Array

    @staticmethod
    def empty():
        return Scene(
            sphere_c=jnp.zeros((0, 3)), sphere_r=jnp.zeros((0,)),
            box_lo=jnp.zeros((0, 3)), box_hi=jnp.zeros((0, 3)),
        )

    @staticmethod
    def make(spheres=(), boxes=()):
        """spheres: [(center, radius)]; boxes: [(lo, hi)]."""
        sc = jnp.asarray([s[0] for s in spheres], jnp.float32).reshape(-1, 3)
        sr = jnp.asarray([s[1] for s in spheres], jnp.float32).reshape(-1)
        bl = jnp.asarray([b[0] for b in boxes], jnp.float32).reshape(-1, 3)
        bh = jnp.asarray([b[1] for b in boxes], jnp.float32).reshape(-1, 3)
        return Scene(sphere_c=sc, sphere_r=sr, box_lo=bl, box_hi=bh)


def scene_sdf(scene: Scene, p):
    """Exact signed distance from point p (3,) to the scene (union = min)."""
    d = jnp.asarray(jnp.inf, p.dtype)
    if scene.sphere_c.shape[0]:
        ds = jnp.linalg.norm(p[None, :] - scene.sphere_c, axis=-1) - scene.sphere_r
        d = jnp.minimum(d, jnp.min(ds))
    if scene.box_lo.shape[0]:
        center = 0.5 * (scene.box_lo + scene.box_hi)
        half = 0.5 * (scene.box_hi - scene.box_lo)
        q = jnp.abs(p[None, :] - center) - half
        outside = jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
        inside = jnp.minimum(jnp.max(q, axis=-1), 0.0)
        d = jnp.minimum(d, jnp.min(outside + inside))
    return d


def make_scene_sdf_fn(scene: Scene, max_df: float = 1.0, robot_frame=True):
    """(pos_in_camera_frame, latent) -> truncated SDF, usable as build_ocp's
    sdf_fn — an oracle standing in for the NeuralDF (latent ignored)."""

    def fn(pos, latent):
        return jnp.minimum(scene_sdf(scene, pos), max_df)

    return fn


def render_range_image(scene: Scene, W_p_C, W_R_C, height, width, hfov, vfov,
                      dmax, is_spherical=False, n_steps: int = 48):
    """Sphere-trace the scene from a camera pose -> dmax-normalized range image.

    The camera looks along its +x axis with the reference's pixel-ray
    convention (data/points.pixel_grid).  Returns (H, W) in [0, 1]."""
    rays = jnp.asarray(pixel_grid(height, width, hfov, vfov, is_spherical))
    rays = rays.reshape(3, -1)
    rays = rays / jnp.linalg.norm(rays, axis=0, keepdims=True)
    world_rays = (jnp.asarray(W_R_C) @ rays).T  # (N, 3)
    origin = jnp.asarray(W_p_C)

    def trace(d):
        def body(t, _):
            p = origin[None, :] + world_rays * t[:, None]
            sd = jax.vmap(lambda q: scene_sdf(scene, q))(p)
            return jnp.clip(t + sd, 0.0, dmax), None

        t, _ = jax.lax.scan(body, jnp.full(world_rays.shape[0], 0.05), None, length=n_steps)
        return t

    t = trace(None)
    rng = jnp.where(t >= dmax * 0.999, dmax, t)
    return (rng / dmax).reshape(height, width)
