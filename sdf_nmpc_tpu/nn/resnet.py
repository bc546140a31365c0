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
import jax


class ConvTransposeTorch(nn.Module):
    """ConvTranspose2d with EXACT torch semantics (stride/padding/
    output_padding), NHWC.

    torch's transposed convolution is the gradient of a strided conv:
    dilate the input by ``stride`` (insert stride-1 zeros), pad spatially by
    (k-1-p) before and (k-1-p+op) after, then cross-correlate with the
    spatially-flipped, io-swapped kernel.  Implemented directly via
    ``lax.conv_general_dilated`` so reference TorchScript decoder weights
    import EXACTLY (torch_import.py:import_decoder) — flax's built-in
    ConvTranspose uses different padding semantics and is not
    weight-compatible.  The stored kernel is (kh, kw, in, out) of the
    already-flipped orientation; fresh inits are plain lecun-normal params of
    the same shape.
    """

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
        )
        ph = (kh - 1 - self.padding,
              kh - 1 - self.padding + self.output_padding)
        pw = (kw - 1 - self.padding,
              kw - 1 - self.padding + self.output_padding)
        y = jax.lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),
            window_strides=(1, 1),
            padding=(ph, pw),
            lhs_dilation=self.strides,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


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
    output_padding: int = 0  # reference resnet.py:68 (decoder passes 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        size_out = self.size_in // self.stride
        size_inner = self.size_in // 4
        use_bias = not self.use_batchnorm

        def bn(h):
            if self.use_batchnorm:
                h = nn.BatchNorm(use_running_average=not train)(h)
            return h

        op = self.output_padding
        if self.bottleneck:
            # torch-exact deconvs (reference resnet.py:76-84: k1 p0 strided
            # with output_padding, k3 p1, k1 p0)
            h = ConvTransposeTorch(size_inner, (1, 1), strides=(self.stride, self.stride), padding=0, output_padding=op, use_bias=use_bias)(x)
            h = nn.relu(bn(h))
            h = ConvTransposeTorch(size_inner, (3, 3), padding=1, use_bias=use_bias)(h)
            h = nn.relu(bn(h))
            h = ConvTransposeTorch(size_out, (1, 1), padding=0, use_bias=use_bias)(h)
            h = bn(h)
        else:
            # reference resnet.py:88-93: k3 p1 strided with output_padding,
            # then k3 p1
            h = ConvTransposeTorch(
                size_out, (3, 3), strides=(self.stride, self.stride), padding=1, output_padding=op, use_bias=use_bias
            )(x)
            h = nn.relu(bn(h))
            h = ConvTransposeTorch(size_out, (3, 3), padding=1, use_bias=use_bias)(h)
            h = bn(h)

        if self.stride == 1:
            sc = x
        else:
            sc = ConvTransposeTorch(size_out, (1, 1), strides=(self.stride, self.stride), padding=0, output_padding=op, use_bias=use_bias)(x)
            # reference quirk: the deconv shortcut always applies BatchNorm
            # (resnet.py:103) — preserved only when batchnorm is enabled
            sc = bn(sc)

        h = nn.relu(h + sc)
        if self.dropout_rate:
            h = nn.Dropout(self.dropout_rate)(h, deterministic=not train)
        return h
