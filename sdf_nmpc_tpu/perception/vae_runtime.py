"""VAE runtime wrapper: image -> preprocess -> encode -> latent (+ decode viz).

Parity with reference sdf_nmpc/vae.py VaeWrapper: ``set_img`` runs the
preprocessing pipeline, ``encode`` returns the latent mean as a numpy vector
(what crosses the robot<->operator-PC network in the reference deployment,
README.md:75-77), ``set_latent``/``decode`` reconstruct for visualization.

The encoder runs jitted on the accelerator; the decode path is operator-side
viz and can run anywhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..nn.vae import Decoder, Encoder
from .preprocessing import make_image_pipeline


class VaeRuntime:
    def __init__(self, cfg, encoder_variables, decoder_variables=None, batchnorm=True):
        self.cfg = cfg
        self.encoder = Encoder(1, cfg.nn.size_latent, dropout_rate=0.0, batchnorm=batchnorm)
        self.decoder = Decoder(1, cfg.nn.size_latent, tuple(cfg.sensor.shape_imgs),
                               dropout_rate=0.0, batchnorm=batchnorm)
        self._enc_vars = encoder_variables
        self._dec_vars = decoder_variables
        self._preprocess = make_image_pipeline(cfg)

        @jax.jit
        def _encode(img_nchw):
            # NCHW (reference layout) -> NHWC (TPU layout)
            x = jnp.transpose(img_nchw, (0, 2, 3, 1))
            return self.encoder.apply(self._enc_vars, x)

        self._encode_fn = _encode
        self.img = None
        self.latent = None
        self.decoded = None

    def set_img(self, img):
        self.img = self._preprocess(img)

    def set_latent(self, latent):
        self.latent = jnp.asarray(latent, jnp.float32).reshape(1, -1)

    def encode(self) -> np.ndarray:
        self.latent = self._encode_fn(self.img)
        return np.asarray(self.latent)

    def decode(self) -> np.ndarray:
        assert self._dec_vars is not None, "decoder weights not loaded"
        out = self.decoder.apply(self._dec_vars, self.latent)
        H, W = self.cfg.sensor.shape_imgs[-2:]
        self.decoded = out.reshape(H, W)
        return np.asarray(self.decoded)
