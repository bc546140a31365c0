"""Range-image VAE: ResNet encoder to a latent, deconv decoder back to image.

Parity with reference sdf_nmpc/network/vae.py:
  Encoder: Conv 7x7 s2 -> ELU -> MaxPool 3x3 s2 -> ResBlock(64,s2) ->
           ResBlock(128,s2) -> ResBlock(256,s2) -> ResBlock(512,s1) ->
           AdaptiveAvgPool(2,2) -> Dropout -> Flatten -> mean / logvar heads
  Decoder: Dense(512*8*15) -> ELU -> unflatten -> Dropout ->
           4x ResBlockDeconv(s2) -> ConvT 5x5 s1 -> bilinear resize -> sigmoid
  Vae:     training forward samples the latent; eval forward uses the mean.

Layout is NHWC (TPU conv layout); images are (B, H, W, 1).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .resnet import ConvTransposeTorch, ResBlock, ResBlockDeconv


def adaptive_avg_pool2d(x, out_hw=(2, 2)):
    """torch.nn.AdaptiveAvgPool2d semantics in NHWC: region i spans
    [floor(i*S/O), ceil((i+1)*S/O)) — regions may overlap."""
    H, W = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        h0, h1 = (i * H) // oh, -(-(i + 1) * H // oh)
        cols = []
        for j in range(ow):
            w0, w1 = (j * W) // ow, -(-(j + 1) * W // ow)
            cols.append(jnp.mean(x[..., h0:h1, w0:w1, :], axis=(-3, -2)))
        rows.append(jnp.stack(cols, axis=-2))
    return jnp.stack(rows, axis=-3)  # (..., oh, ow, C)


class Encoder(nn.Module):
    nb_chan: int = 1
    size_latent: int = 128
    dropout_rate: float = 0.1
    batchnorm: bool = True

    @nn.compact
    def _features(self, x, train: bool):
        x = nn.Conv(64, (7, 7), strides=2, padding=3)(x)
        x = nn.elu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ResBlock(64, 2, use_batchnorm=self.batchnorm, dropout_rate=self.dropout_rate)(x, train)
        x = ResBlock(128, 2, use_batchnorm=self.batchnorm, dropout_rate=self.dropout_rate)(x, train)
        x = ResBlock(256, 2, use_batchnorm=self.batchnorm, dropout_rate=self.dropout_rate)(x, train)
        x = ResBlock(512, 1, use_batchnorm=self.batchnorm, dropout_rate=0.0)(x, train)
        x = adaptive_avg_pool2d(x, (2, 2))
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        return x.reshape(x.shape[0], -1)

    @nn.compact
    def __call__(self, x, train: bool = False, with_logvar: bool = False):
        """x: (B, H, W, 1).  Returns mean (inference) or (mean, logvar)."""
        feats = self._features(x, train)
        mean = nn.Dense(self.size_latent, name="mean")(feats)
        if not with_logvar:
            return mean
        logvar = nn.Dense(self.size_latent, name="logvar")(feats)
        return mean, logvar


def sample_latent(key, mean, logvar, num_samples: int = 1):
    """Reparameterized latent sampling (reference vae.py:48-61).  For M > 1
    returns (B*M, L) with per-image samples grouped contiguously."""
    if num_samples == 1:
        eps = jax.random.normal(key, mean.shape, mean.dtype)
        return eps * jnp.exp(0.5 * logvar) + mean
    B, L = mean.shape
    eps = jax.random.normal(key, (B, num_samples, L), mean.dtype)
    lat = eps * jnp.exp(0.5 * logvar)[:, None, :] + mean[:, None, :]
    return lat.reshape(B * num_samples, L)


class Decoder(nn.Module):
    nb_chan: int = 1
    size_latent: int = 128
    shape_imgs: Sequence[int] = (1, 270, 480)  # (C, H, W) reference layout
    dropout_rate: float = 0.1
    batchnorm: bool = True
    unflatten_hw: Sequence[int] = (8, 15)  # reference vae.py:75 hardcodes (8, 15)

    @nn.compact
    def __call__(self, z, train: bool = False):
        """z: (B, L) -> (B, H, W, 1)."""
        uh, uw = self.unflatten_hw
        x = nn.elu(nn.Dense(512 * uh * uw)(z))
        x = x.reshape(z.shape[0], uh, uw, 512)
        if self.dropout_rate:
            x = nn.Dropout(self.dropout_rate)(x, deterministic=not train)
        for ch in (512, 256, 128, 64):
            x = ResBlockDeconv(
                ch, 2, use_batchnorm=self.batchnorm,
                dropout_rate=self.dropout_rate, output_padding=1,
            )(x, train)
        x = ConvTransposeTorch(self.nb_chan, (5, 5), padding=2)(x)
        H, W = self.shape_imgs[-2], self.shape_imgs[-1]
        x = jax.image.resize(x, (x.shape[0], H, W, x.shape[-1]), method="bilinear")
        return nn.sigmoid(x)


class Vae(nn.Module):
    size_latent: int = 128
    shape_imgs: Sequence[int] = (1, 270, 480)
    dropout_rate: float = 0.1
    batchnorm: bool = True

    def setup(self):
        self.encoder = Encoder(1, self.size_latent, self.dropout_rate, self.batchnorm)
        self.decoder = Decoder(1, self.size_latent, self.shape_imgs, self.dropout_rate, self.batchnorm)

    def __call__(self, x, train: bool = False, rng=None):
        if train:
            mean, logvar = self.encoder(x, train=True, with_logvar=True)
            rng = rng if rng is not None else self.make_rng("latent")
            latent = sample_latent(rng, mean, logvar)
        else:
            latent = self.encoder(x)
        return self.decoder(latent, train)
