"""Training-time image augmentation.

Parity with reference sdf_nmpc/utils/data.py ImageAugmenter: Gaussian noise on
valid pixels, horizontal/vertical flips, circular horizontal translation (360
lidar), small rotation, random pixel/box erasing, and close-outlier removal
(producing a cleaned label image).  Same probabilities and magnitudes
(data.py:33-48); randomness via explicit jax.random keys.

Images are (1, H, W) dmax-normalized; 0 marks invalid pixels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..perception.preprocessing import remove_close_outliers


class ImageAugmenter:
    def __init__(self, shape, noise=False, flip=False, translate=False, rotate=False,
                 erase=False, outlier_rm=False):
        self.shape = tuple(shape)  # (C, H, W)
        self.noise = noise
        self.flip = flip
        self.translate = translate
        self.rotate = rotate
        self.erase = erase
        self.outlier_rm = outlier_rm
        self.invalid = 0.0

        ## reference probabilities/magnitudes (data.py:33-48)
        self.proba_noise = 1.0
        self.proba_flip = 0.5
        self.proba_translate = 1.0
        self.proba_rotate = 0.8
        self.proba_erase_pixels = 0.3
        self.proba_erase_boxes = 0.3
        self.std_range = 0.02
        self.max_rot = 5.0  # degrees
        H, W = self.shape[1], self.shape[2]
        self.nb_pix_erase_min = int(H * W * 0.03)
        self.nb_pix_erase_max = int(H * W * 0.10)
        self.nb_box_erase_max = 4
        self.boxes_scale_range = (0.02, 0.06)
        self.boxes_ratio_range = (0.2, 5.0)

    def __call__(self, key, img):
        """Returns (augmented_img, label_img)."""
        img = jnp.asarray(img, jnp.float32)
        keys = jax.random.split(key, 10)

        if self.flip:
            do_h = jax.random.uniform(keys[0]) < self.proba_flip
            do_v = jax.random.uniform(keys[1]) < self.proba_flip
            img = jnp.where(do_h, img[..., ::-1], img)
            img = jnp.where(do_v, img[..., ::-1, :], img)

        if self.translate:
            do_t = jax.random.uniform(keys[2]) < self.proba_translate
            n = jax.random.randint(keys[3], (), 0, self.shape[2])
            rolled = jnp.roll(img, -n, axis=-1)
            img = jnp.where(do_t, rolled, img)

        if self.rotate:
            do_r = jax.random.uniform(keys[4]) < self.proba_rotate
            ang = jax.random.uniform(keys[5], (), minval=-self.max_rot, maxval=self.max_rot)
            img = jnp.where(do_r, _rotate_image(img, jnp.deg2rad(ang), self.invalid), img)

        ## label: outlier-removed copy if real-sensor image, else clean copy
        if self.outlier_rm:
            has_invalid = jnp.any(img == self.invalid)
            label = jnp.where(has_invalid, remove_close_outliers(img), img)
        else:
            label = img

        if self.noise:
            do_n = jax.random.uniform(keys[6]) < self.proba_noise
            noisy = jnp.where(
                img != self.invalid,
                jnp.clip(img + jax.random.normal(keys[7], img.shape) * self.std_range, 0, 1),
                self.invalid,
            )
            img = jnp.where(do_n, noisy, img)

        if self.erase:
            img = self._erase_pixels(keys[8], img)
            img = self._erase_boxes(keys[9], img)

        return img, label

    def _erase_pixels(self, key, img):
        kdo, kn, kmask = jax.random.split(key, 3)
        do = jax.random.uniform(kdo) < self.proba_erase_pixels
        # static-shape variant: erase a Bernoulli mask with the expected ratio
        n = jax.random.randint(kn, (), self.nb_pix_erase_min, self.nb_pix_erase_max)
        H, W = self.shape[1], self.shape[2]
        rate = n.astype(jnp.float32) / (H * W)
        mask = jax.random.uniform(kmask, img.shape) < rate
        return jnp.where(do & mask, 0.0, img)

    def _erase_boxes(self, key, img):
        kdo, *kb = jax.random.split(key, 1 + 4 * self.nb_box_erase_max)
        do = jax.random.uniform(kdo) < self.proba_erase_boxes
        H, W = self.shape[1], self.shape[2]
        out = img
        rows = jnp.arange(H)[:, None]
        cols = jnp.arange(W)[None, :]
        for b in range(self.nb_box_erase_max):
            ks, kr, ky, kx = kb[4 * b : 4 * b + 4]
            active = do & (b < self.nb_box_erase_max)  # all candidate boxes
            scale = jax.random.uniform(ks, (), minval=self.boxes_scale_range[0],
                                       maxval=self.boxes_scale_range[1])
            ratio = jax.random.uniform(kr, (), minval=self.boxes_ratio_range[0],
                                       maxval=self.boxes_ratio_range[1])
            area = scale * H * W
            bh = jnp.sqrt(area * ratio).astype(jnp.int32)
            bw = jnp.sqrt(area / ratio).astype(jnp.int32)
            y0 = jax.random.randint(ky, (), 0, H)
            x0 = jax.random.randint(kx, (), 0, W)
            box = (rows >= y0) & (rows < y0 + bh) & (cols >= x0) & (cols < x0 + bw)
            out = jnp.where(active & box[None], 0.0, out)
        return out


def _rotate_image(img, angle_rad, fill):
    """Small-angle rotation about the image center via bilinear resampling."""
    C, H, W = img.shape
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    c, s = jnp.cos(angle_rad), jnp.sin(angle_rad)
    ys = c * (yy - cy) - s * (xx - cx) + cy
    xs = s * (yy - cy) + c * (xx - cx) + cx
    out = jax.scipy.ndimage.map_coordinates(img[0], [ys, xs], order=1, cval=fill, mode="constant")
    return out[None]
