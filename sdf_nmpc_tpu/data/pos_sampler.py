"""3-D training-point samplers and evaluation grids.

Parity with reference sdf_nmpc/utils/pos_sampler.py (PosSampler): random
samplers over box / ball / frustum / frustum-margin / around-obstacles, and
deterministic evaluation grids (frustum slice, frustum, sphere, fixed-step).
Random sampling uses jax.random keys (explicit, reproducible) instead of the
torch global RNG.  Angle conventions preserved: inclination = pi/2 - elevation,
radial density via r ~ U^(1/3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .points import imgs2points


class PosSampler:
    def __init__(self, dmax, hfov, vfov, margin=20, is_spherical=False):
        self.dmax = float(dmax)
        self.hfov = float(hfov)
        self.vfov = float(vfov)
        self.margin = float(margin)
        self.is_spherical = bool(is_spherical)
        self.atanh = np.tan(self.hfov)
        self.atanv = np.tan(self.vfov)

        ## effective extents with margin (reference pos_sampler.py:24-38)
        hfov_m = min(np.pi, self.hfov * (100 + margin) / 100)
        vfov_m = min(np.pi / 2, self.vfov * (100 + margin) / 100)
        dsup_m = self.dmax * (100 + margin / 2) / 100
        self.sizes_margin = (0.0, dsup_m, dsup_m, hfov_m, vfov_m)
        self.sizes_nomargin = (0.0, self.dmax, self.dmax,
                               min(np.pi, self.hfov), min(np.pi / 2, self.vfov))

    def _sizes(self, add_margin):
        return self.sizes_margin if add_margin else self.sizes_nomargin

    # ------------------------------------------------------------- normalize
    def normalize(self, points):
        """[x/dmax, y/(dmax tan hfov), z/(dmax tan vfov)]
        (reference pos_sampler.py:42-48)."""
        scale = jnp.asarray([self.dmax, self.dmax * self.atanh, self.dmax * self.atanv])
        return points / scale

    # --------------------------------------------------------------- helpers
    @staticmethod
    def _sph_to_xyz(r, azimuth, inclination):
        return jnp.stack(
            [
                r * jnp.sin(inclination) * jnp.cos(azimuth),
                r * jnp.sin(inclination) * jnp.sin(azimuth),
                r * jnp.cos(inclination),
            ],
            axis=-1,
        )

    # --------------------------------------------------------------- samplers
    def sample_pos_in_box(self, key, nb_points, add_margin=False):
        dinf, dsup, drange, _, _ = self._sizes(add_margin)
        kx, ky, kz = jax.random.split(key, 3)
        x = jax.random.uniform(kx, (nb_points,)) * drange + dinf
        y = jax.random.uniform(ky, (nb_points,)) * 2 * dsup - dsup
        z = jax.random.uniform(kz, (nb_points,)) * 2 * dsup - dsup
        return jnp.stack([x, y, z], axis=-1)

    def sample_pos_in_ball(self, key, nb_points, ball_size, add_margin=False):
        if add_margin:
            ball_size = ball_size * (100 + self.margin) / 100
        kr, ka, ki = jax.random.split(key, 3)
        r = jax.random.uniform(kr, (nb_points,)) ** (1 / 3) * ball_size
        azimuth = jax.random.uniform(ka, (nb_points,)) * 2 * jnp.pi
        inclination = jnp.arccos(jax.random.uniform(ki, (nb_points,)) * 2 - 1)
        return self._sph_to_xyz(r, azimuth, inclination)

    def sample_pos_in_frustrum(self, key, nb_points, add_margin=False):
        dinf, dsup, drange, hfov, vfov = self._sizes(add_margin)
        kr, ka, ki = jax.random.split(key, 3)
        r = jax.random.uniform(kr, (nb_points,)) ** (1 / 3) * drange + dinf
        azimuth = (jax.random.uniform(ka, (nb_points,)) * 2 - 1) * hfov
        inclination = jax.random.uniform(ki, (nb_points,)) * 2 * vfov + (jnp.pi / 2 - vfov)
        return self._sph_to_xyz(r, azimuth, inclination)

    def sample_pos_in_frustrum_margin(self, key, nb_points):
        """Boundary-band sampling in 5 regions: +-hfov, +-vfov, +dsup margins
        (reference pos_sampler.py:108-152)."""
        _, dsup_m, drange_m, hfov_m, vfov_m = self.sizes_margin
        _, dsup_0, _, hfov_0, vfov_0 = self.sizes_nomargin
        n = nb_points // 5
        keys = jax.random.split(key, 15)

        def u(k, m):
            return jax.random.uniform(k, (m,))

        parts = []
        # +hfov band
        parts.append(self._sph_to_xyz(
            u(keys[0], n) ** (1 / 3) * drange_m,
            u(keys[1], n) * (hfov_m - hfov_0) + hfov_0,
            u(keys[2], n) * 2 * vfov_m + (jnp.pi / 2 - vfov_m)))
        # -hfov band
        parts.append(self._sph_to_xyz(
            u(keys[3], n) ** (1 / 3) * drange_m,
            -(u(keys[4], n) * (hfov_m - hfov_0) + hfov_0),
            u(keys[5], n) * 2 * vfov_m + (jnp.pi / 2 - vfov_m)))
        # +vfov band
        parts.append(self._sph_to_xyz(
            u(keys[6], n) ** (1 / 3) * drange_m,
            (u(keys[7], n) * 2 - 1) * hfov_m,
            u(keys[8], n) * (vfov_m - vfov_0) + (jnp.pi / 2 - vfov_0)))
        # -vfov band
        parts.append(self._sph_to_xyz(
            u(keys[9], n) ** (1 / 3) * drange_m,
            (u(keys[10], n) * 2 - 1) * hfov_m,
            u(keys[11], n) * (vfov_0 - vfov_m) + (jnp.pi / 2 + vfov_m)))
        # +dsup band
        m_last = nb_points - 4 * n
        parts.append(self._sph_to_xyz(
            u(keys[12], m_last) ** (1 / 3) * (dsup_m - dsup_0) + dsup_0,
            (u(keys[13], m_last) * 2 - 1) * hfov_0,
            u(keys[14], m_last) * 2 * vfov_0 + (jnp.pi / 2 - vfov_0)))
        return jnp.concatenate(parts, axis=0)

    def sample_pos_around_obs(self, key, imgs, points_per_img, mode="closest", std=0.2):
        """Perturbed samples around visible obstacle surfaces
        (reference pos_sampler.py:155-176)."""
        pts = imgs2points(imgs, self.dmax, self.hfov, self.vfov,
                          is_depth=False, is_spherical=self.is_spherical, downsamp=5)
        if pts.ndim == 2:
            pts = pts[None]
        ksel, knoise = jax.random.split(key)
        B, M, _ = pts.shape
        if mode == "random":
            idx = jax.random.randint(ksel, (points_per_img,), 0, M)
            sel = pts[:, idx, :]
        elif mode == "closest":
            assert M >= points_per_img, "too few points; reduce downsamp"
            norms = jnp.linalg.norm(pts, axis=-1)
            idx = jnp.argsort(norms, axis=-1)[..., :points_per_img]
            sel = jnp.take_along_axis(pts, idx[..., None], axis=-2)
        else:
            raise ValueError(mode)
        noise = jax.random.normal(knoise, sel.shape) * std
        out = sel + noise
        return out[0] if imgs.ndim == 2 else out

    # ------------------------------------------------------------------ grids
    def grid_frustrum_slice(self, nb_points, elevation_deg, add_margin=False, h360=False):
        dinf, dsup, _, hfov, vfov = self._sizes(add_margin)
        gs = round(nb_points ** 0.5)
        if h360:
            hfov = np.pi
        r = np.repeat(np.linspace(dinf, dsup, gs), gs)
        azimuth = np.tile(np.linspace(-hfov, hfov, gs, dtype=np.float32), gs)
        inclination = np.pi / 2 - np.deg2rad(elevation_deg)
        return jnp.asarray(np.stack([
            r * np.sin(inclination) * np.cos(azimuth),
            r * np.sin(inclination) * np.sin(azimuth),
            r * np.cos(inclination) * np.ones_like(azimuth),
        ], axis=-1).astype(np.float32))

    def grid_frustrum(self, nb_points, add_margin=False):
        dinf, dsup, _, hfov, vfov = self._sizes(add_margin)
        gs = round(nb_points ** (1 / 3))
        r = np.repeat(np.linspace(dinf, dsup, gs), gs**2)
        azimuth = np.repeat(np.tile(np.linspace(-hfov, hfov, gs), gs), gs)
        inclination = np.tile(np.arccos(np.linspace(-np.sin(vfov), np.sin(vfov), gs)), gs**2)
        return jnp.asarray(np.stack([
            r * np.sin(inclination) * np.cos(azimuth),
            r * np.sin(inclination) * np.sin(azimuth),
            r * np.cos(inclination),
        ], axis=-1).astype(np.float32))

    def grid_sphere(self, nb_points, add_margin=False):
        dinf, dsup, _, _, _ = self._sizes(add_margin)
        gs = int(nb_points ** (1 / 3))
        r = np.repeat(np.linspace(dinf, dsup, gs), gs**2)
        azimuth = np.repeat(np.tile(np.linspace(-np.pi, np.pi, gs), gs), gs)
        inclination = np.tile(np.arccos(np.linspace(-1, 1, gs)), gs**2)
        return jnp.asarray(np.stack([
            r * np.sin(inclination) * np.cos(azimuth),
            r * np.sin(inclination) * np.sin(azimuth),
            r * np.cos(inclination),
        ], axis=-1).astype(np.float32))

    def grid_sphere_fixed_step(self, step, in_frustrum=False, frustrum_is_spherical=False,
                               add_margin=False):
        dinf, dsup, _, hfov, vfov = self._sizes(add_margin)
        dsup = np.round(dsup / step) * step
        x = np.arange(-dsup, dsup * 1.001, step)
        pts = np.stack(np.meshgrid(x, x, x, indexing="ij"), axis=-1).reshape(-1, 3)
        pts = np.unique(pts, axis=0)
        if in_frustrum:
            pts = pts[np.linalg.norm(pts, axis=1) <= dsup * 1.001]
            pts = pts[np.abs(np.arctan2(pts[:, 1], pts[:, 0])) <= hfov * 1.001]
            if frustrum_is_spherical:
                el = np.arctan2(pts[:, 2], np.linalg.norm(pts[:, :2], axis=1))
            else:
                el = np.arctan2(pts[:, 2], pts[:, 0])
            pts = pts[np.abs(el) <= vfov * 1.001]
        return jnp.asarray(pts.astype(np.float32))
