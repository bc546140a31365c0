"""Image preprocessing: depth/range conversions, clipping, resize, morphology.

Parity with reference sdf_nmpc/utils/preprocessing.py (torch modules), as pure
jnp functions / closures.  Conventions preserved:

  * images are dmax-normalized in [0, 1]; 0 marks invalid pixels
  * pixel grids linearly interpolate tan(fov) (Cartesian) or the angle itself
    (spherical) across the image, centered per the reference formulas
  * morphology ops ignore 0 pixels on request by substituting sentinel border
    values (reference Dilate/Erode border_val = ±2)

All functions operate on (..., H, W) arrays and are jit/vmap friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# projection maps
# ---------------------------------------------------------------------------

def _uv_grid(height: int, width: int):
    u = np.arange(width, dtype=np.float32)
    v = np.arange(height, dtype=np.float32)
    return np.meshgrid(u, v, indexing="xy")  # each (H, W)


def depth2range_map(height: int, width: int, hfov: float, vfov: float) -> np.ndarray:
    """Per-pixel sqrt(1 + tan_h^2 + tan_v^2) factor (reference Depth2Range:5-31)."""
    u, v = _uv_grid(height, width)
    th = np.tan(hfov) * (1 - 2 * u / width)
    tv = np.tan(vfov) * (1 - 2 * v / height)
    return np.sqrt(1 + th**2 + tv**2).astype(np.float32)


def depth2range(depth_img, hfov: float, vfov: float):
    """Depth -> range, clipped to [0, 1]."""
    H, W = depth_img.shape[-2], depth_img.shape[-1]
    m = jnp.asarray(depth2range_map(H, W, hfov, vfov))
    return jnp.clip(depth_img * m, 0.0, 1.0)


def range2depth(range_img, hfov: float, vfov: float):
    """Range -> depth (reference Range2Depth:34-64)."""
    H, W = range_img.shape[-2], range_img.shape[-1]
    m = jnp.asarray(depth2range_map(H, W, hfov, vfov))
    return range_img / m


def clip_distance(img, dmax: float, mm_resolution: float = 1000):
    """Raw sensor units -> dmax-normalized [0,1] (reference ClipDistance:67-80)."""
    d = dmax / mm_resolution * 1000
    return jnp.clip(img / d, 0.0, 1.0)


def reshape_resize(img, shape_img=None):
    """-> (1, 1, H, W), bilinear-resized to shape_img[-2:] if needed
    (reference Reshape:83-97)."""
    img = jnp.asarray(img)
    img = img.reshape(1, 1, img.shape[-2], img.shape[-1])
    if shape_img is not None and img.shape[-2:] != tuple(shape_img[-2:]):
        img = jax.image.resize(
            img, (1, 1, shape_img[-2], shape_img[-1]), method="bilinear"
        )
    return img


# ---------------------------------------------------------------------------
# morphology
# ---------------------------------------------------------------------------

def _kernel_offsets(kernel: np.ndarray):
    """(dy, dx) taps of the 0/1 kernel relative to its origin, plus pad sizes."""
    kh, kw = kernel.shape
    oy, ox = kh // 2, kw // 2
    taps = [(i - oy, j - ox) for i in range(kh) for j in range(kw) if kernel[i, j] != 0]
    return taps, (oy, kh - oy - 1, ox, kw - ox - 1)


def _shift_stack(img, taps, pads, fill):
    """Stacked shifted copies of img over kernel taps (pad with fill)."""
    top, bot, left, right = pads
    pad_width = [(0, 0)] * (img.ndim - 2) + [(top, bot), (left, right)]
    padded = jnp.pad(img, pad_width, constant_values=fill)
    H, W = img.shape[-2], img.shape[-1]
    views = [
        padded[..., top + dy : top + dy + H, left + dx : left + dx + W]
        for dy, dx in taps
    ]
    return jnp.stack(views, axis=0)


def dilate(img, kernel=None, ignore_zeros: bool = False):
    """Grayscale dilation (reference Dilate:100-149).  border_val = -2."""
    if kernel is None:
        kernel = np.ones((3, 3))
    border = -2.0
    taps, pads = _kernel_offsets(np.asarray(kernel))
    x = jnp.where(img == 0, border, img) if ignore_zeros else img
    out = jnp.max(_shift_stack(x, taps, pads, border), axis=0)
    if ignore_zeros:
        out = jnp.where(out == border, 0.0, out)
    return out


def erode(img, kernel=None, ignore_zeros: bool = False):
    """Grayscale erosion (reference Erode:152-200).  border_val = +2."""
    if kernel is None:
        kernel = np.ones((3, 3))
    border = 2.0
    taps, pads = _kernel_offsets(np.asarray(kernel))
    x = jnp.where(img == 0, border, img) if ignore_zeros else img
    out = jnp.min(_shift_stack(x, taps, pads, border), axis=0)
    if ignore_zeros:
        out = jnp.where(out == border, 0.0, out)
    return out


def morph_open(img, kernel_erode=None, kernel_dilate=None):
    """Erosion then dilation (reference Open:203-219)."""
    return dilate(erode(img, kernel_erode), kernel_dilate)


def morph_close(img, kernel_erode=None, kernel_dilate=None):
    """Dilation then erosion (reference Close:222-238).

    NOTE: preserves the reference's actual composition ``erode(dilate(x))``
    applied in its forward (Close:238)."""
    return erode(dilate(img, kernel_dilate), kernel_erode)


def remove_close_outliers(img, kernel_size: int = 3, min_range: float = 0.1):
    """Opening-based removal of close-in sensor-shadow outliers
    (reference RemoveCloseOutliers:241-260): crop values below min_range,
    open, then restore surviving pixels to their input values."""
    kernel = np.ones((kernel_size, kernel_size))
    x = jnp.where(img < min_range, 0.0, img)
    morph = morph_open(x, kernel, kernel)
    return jnp.where(morph > 0, x, 0.0)


def disk_kernel(radius: int) -> np.ndarray:
    """Circular 0/1 kernel of the reference's erosion collision mapping
    (reference data.py:181-185)."""
    k = np.fromfunction(
        lambda x, y: ((x - radius) ** 2 + (y - radius) ** 2 <= radius**2) * 1,
        (2 * radius + 1, 2 * radius + 1),
        dtype=int,
    )
    return k.astype(np.uint8)


# ---------------------------------------------------------------------------
# pipeline
# ---------------------------------------------------------------------------

def make_image_pipeline(cfg):
    """Preprocessing closure matching the reference VaeWrapper pipeline
    (reference vae.py:15-24): reshape/resize -> clip (unless normalized) ->
    depth2range (if depth).  Input: raw (H, W) array -> (1, 1, H', W')."""
    shape = tuple(cfg.sensor.shape_imgs)
    hfov, vfov = cfg.sensor.hfov, cfg.sensor.vfov

    def pipeline(img):
        x = jnp.asarray(img, jnp.float32)
        x = reshape_resize(x, shape)
        if not cfg.sensor.is_normalized:
            x = clip_distance(x, cfg.sensor.dmax, cfg.sensor.mm_resolution)
        if cfg.sensor.is_depth:
            x = depth2range(x, hfov, vfov)
        return x

    return pipeline
