"""Residual conv blocks (reference sdf_nmpc/network/resnet.py), NHWC/flax.

Semantics preserved: standard (3x3, 3x3) or bottleneck (1x1, 3x3, 1x1) blocks;
``stride`` doubles (ResBlock) or halves (ResBlockDeconv) the channel count and
down/up-samples space; shortcut is a strided 1x1 conv when stride != 1;
optional batchnorm (bias disabled when used) and terminal dropout.

Layout is NHWC — the TPU-native convolution layout — where the reference uses
torch NCHW; the torch-weight importer (torch_import.py) handles the transpose.
"""

from __future__ import annotations

import flax.linen as nn


class ResBlock(nn.Module):
    size_in: int
    stride: int
    bottleneck: bool = False
    use_batchnorm: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        size_out = self.size_in * self.stride
        size_inner = self.size_in // 4
        use_bias = not self.use_batchnorm

        def bn(h):
            if self.use_batchnorm:
                h = nn.BatchNorm(use_running_average=not train)(h)
            return h

        if self.bottleneck:
            h = nn.Conv(size_inner, (1, 1), strides=self.stride, use_bias=use_bias)(x)
            h = nn.relu(bn(h))
            h = nn.Conv(size_inner, (3, 3), padding=1, use_bias=use_bias)(h)
            h = nn.relu(bn(h))
            h = nn.Conv(size_out, (1, 1), use_bias=use_bias)(h)
            h = bn(h)
        else:
            h = nn.Conv(size_out, (3, 3), strides=self.stride, padding=1, use_bias=use_bias)(x)
            h = nn.relu(bn(h))
            h = nn.Conv(size_out, (3, 3), padding=1, use_bias=use_bias)(h)
            h = bn(h)

        if self.stride == 1:
            sc = x
        else:
            sc = nn.Conv(size_out, (1, 1), strides=self.stride, use_bias=use_bias)(x)
            sc = bn(sc)

        h = nn.relu(h + sc)
        if self.dropout_rate:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=not train)
        return h


class ResBlockDeconv(nn.Module):
    size_in: int
    stride: int
    bottleneck: bool = False
    use_batchnorm: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        size_out = self.size_in // self.stride
        size_inner = self.size_in // 4
        use_bias = not self.use_batchnorm

        def bn(h):
            if self.use_batchnorm:
                h = nn.BatchNorm(use_running_average=not train)(h)
            return h

        if self.bottleneck:
            # 'SAME' padding gives exact stride-x upsampling (the flax twin of
            # torch ConvTranspose2d(..., padding=1, output_padding=1))
            h = nn.ConvTranspose(size_inner, (1, 1), strides=(self.stride, self.stride), padding="SAME", use_bias=use_bias)(x)
            h = nn.relu(bn(h))
            h = nn.ConvTranspose(size_inner, (3, 3), padding="SAME", use_bias=use_bias)(h)
            h = nn.relu(bn(h))
            h = nn.ConvTranspose(size_out, (1, 1), padding="SAME", use_bias=use_bias)(h)
            h = bn(h)
        else:
            h = nn.ConvTranspose(
                size_out, (3, 3), strides=(self.stride, self.stride), padding="SAME", use_bias=use_bias
            )(x)
            h = nn.relu(bn(h))
            h = nn.ConvTranspose(size_out, (3, 3), padding="SAME", use_bias=use_bias)(h)
            h = bn(h)

        if self.stride == 1:
            sc = x
        else:
            sc = nn.ConvTranspose(size_out, (1, 1), strides=(self.stride, self.stride), padding="SAME", use_bias=use_bias)(x)
            # reference quirk: the deconv shortcut always applies BatchNorm
            # (resnet.py:103) — preserved only when batchnorm is enabled
            sc = bn(sc)

        h = nn.relu(h + sc)
        if self.dropout_rate:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=not train)
        return h
