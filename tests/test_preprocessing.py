"""Preprocessing pipeline tests: conversions, morphology vs scipy.ndimage,
pipeline composition, VAE runtime wrapper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from sdf_nmpc_tpu.perception import (
    VaeRuntime,
    clip_distance,
    depth2range,
    dilate,
    disk_kernel,
    erode,
    make_image_pipeline,
    morph_close,
    morph_open,
    range2depth,
    remove_close_outliers,
    reshape_resize,
)

RNG = np.random.default_rng(0)
H, W = 30, 48


def test_depth_range_roundtrip():
    depth = RNG.uniform(0.1, 0.55, size=(H, W)).astype(np.float32)  # keep range below the clip at 1
    rng_img = depth2range(jnp.asarray(depth), 0.7592, 0.4903)
    back = range2depth(rng_img, 0.7592, 0.4903)
    np.testing.assert_allclose(np.asarray(back), depth, atol=1e-6)
    # range >= depth everywhere (sqrt factor >= 1), clipped at 1
    assert (np.asarray(rng_img) >= depth - 1e-6).all()


def test_clip_distance_semantics():
    # mm_resolution = millimetres per pixel unit (reference ClipDistance:67-80):
    # 1000 -> pixel values in metres; 1 -> pixel values in millimetres
    raw_m = np.array([[0.0, 2.5, 5.0, 9.0]], np.float32)
    out = np.asarray(clip_distance(jnp.asarray(raw_m), dmax=5.0, mm_resolution=1000))
    np.testing.assert_allclose(out, [[0.0, 0.5, 1.0, 1.0]])
    raw_mm = np.array([[0.0, 2500.0, 5000.0, 9000.0]], np.float32)
    out = np.asarray(clip_distance(jnp.asarray(raw_mm), dmax=5.0, mm_resolution=1))
    np.testing.assert_allclose(out, [[0.0, 0.5, 1.0, 1.0]])


def test_reshape_resize():
    img = RNG.uniform(size=(60, 96)).astype(np.float32)
    out = reshape_resize(jnp.asarray(img), (1, 30, 48))
    assert out.shape == (1, 1, 30, 48)


@pytest.mark.parametrize("op,scipy_op", [(dilate, ndimage.grey_dilation), (erode, ndimage.grey_erosion)])
def test_morphology_matches_scipy(op, scipy_op):
    img = RNG.uniform(0.1, 1.0, size=(H, W)).astype(np.float32)
    kernel = np.ones((3, 3))
    ours = np.asarray(op(jnp.asarray(img), kernel))
    theirs = scipy_op(img, footprint=kernel, mode="constant",
                      cval=-2.0 if op is dilate else 2.0)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_morphology_ignore_zeros():
    img = np.full((5, 5), 0.5, np.float32)
    img[2, 2] = 0.0  # invalid pixel
    er = np.asarray(erode(jnp.asarray(img), np.ones((3, 3)), ignore_zeros=True))
    # with zeros ignored, the invalid pixel doesn't drag neighbors to 0
    assert (er[0, :] == 0.5).all()
    # the invalid pixel location maps back to 0
    assert er[2, 2] == 0.5 or er[2, 2] == 0.0  # depends on neighborhood rule
    dl = np.asarray(dilate(jnp.asarray(img), np.ones((3, 3)), ignore_zeros=True))
    assert dl.max() <= 0.5 + 1e-6


def test_open_close_identities():
    img = RNG.uniform(0.1, 1.0, size=(H, W)).astype(np.float32)
    k = np.ones((3, 3))
    opened = np.asarray(morph_open(jnp.asarray(img), k, k))
    assert (opened <= img + 1e-6).all()  # opening is anti-extensive
    closed = np.asarray(morph_close(jnp.asarray(img), k, k))
    assert (closed >= img - 1e-6).all()  # closing is extensive


def test_remove_close_outliers():
    img = np.full((11, 11), 0.6, np.float32)
    img[5, 5] = 0.05  # isolated close outlier (sensor shadow)
    out = np.asarray(remove_close_outliers(jnp.asarray(img), kernel_size=3, min_range=0.1))
    assert out[5, 5] == 0.0  # removed
    assert out[0, 0] == 0.6  # bulk survives


def test_disk_kernel():
    k = disk_kernel(3)
    assert k.shape == (7, 7)
    assert k[3, 3] == 1 and k[0, 0] == 0


def test_image_pipeline(cfg):
    c = cfg.replace(sensor=dict(shape_imgs=[1, 30, 48]))
    pipe = make_image_pipeline(c)
    raw = RNG.uniform(0, 6000, size=(30, 48)).astype(np.float32)  # mm depth
    out = np.asarray(pipe(raw))
    assert out.shape == (1, 1, 30, 48)
    assert out.min() >= 0 and out.max() <= 1


def test_vae_runtime(cfg):
    c = cfg.replace(sensor=dict(shape_imgs=[1, 30, 48]), nn=dict(size_latent=8))
    from sdf_nmpc_tpu.nn import Decoder, Encoder

    enc = Encoder(1, 8, dropout_rate=0.0, batchnorm=False)
    enc_vars = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 30, 48, 1)))
    dec = Decoder(1, 8, (1, 30, 48), dropout_rate=0.0, batchnorm=False)
    dec_vars = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, 8)))

    rt = VaeRuntime(c, enc_vars, dec_vars, batchnorm=False)
    raw = RNG.uniform(0, 6000, size=(30, 48)).astype(np.float32)
    rt.set_img(raw)
    latent = rt.encode()
    assert latent.shape == (1, 8)
    img = rt.decode()
    assert img.shape == (30, 48)
    assert np.isfinite(img).all()
