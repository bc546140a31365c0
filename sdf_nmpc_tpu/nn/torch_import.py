"""One-time converter: reference TorchScript weights -> flax param pytrees.

The reference ships TorchScript archives (sdf_90_25664.pt, vae.pt; reference
gen_model.py:32, vae.py:11).  This module maps their state_dicts onto the flax
modules of this package so users can carry trained weights over:

  * NeuralDF  — exact (validated against torch to float tolerance)
  * Mlp       — exact
  * Encoder   — exact, including the NCHW->NHWC kernel transposes and the
                flatten-order permutation of the mean/logvar heads
  * Decoder   — exact: the flax decoder's ConvTransposeTorch (resnet.py)
                reproduces torch ConvTranspose2d semantics
                (stride/padding/output_padding) bit-for-bit given the
                spatially-flipped io-swapped kernels produced here
                (covers the OPC-side viz path, reference vae.py:42-45)

Import is host-side numpy; no torch dependency unless actually called.
"""

from __future__ import annotations

import numpy as np


def _t(x) -> np.ndarray:
    return np.asarray(x.detach().cpu().numpy() if hasattr(x, "detach") else x)


def _linear(sd, prefix):
    return {"kernel": _t(sd[f"{prefix}.weight"]).T, "bias": _t(sd[f"{prefix}.bias"])}


def _conv(sd, prefix, with_bias=True):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}  # OIHW->HWIO
    if with_bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _deconv(sd, prefix, with_bias=True):
    """torch ConvTranspose2d weight (I, O, kh, kw) -> the (kh, kw, I, O)
    already-flipped kernel ConvTransposeTorch stores (resnet.py): transposed
    convolution == dilated cross-correlation with the spatially-flipped
    io-swapped kernel."""
    w = _t(sd[f"{prefix}.weight"])  # (I, O, kh, kw)
    out = {"kernel": w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1).copy()}
    if with_bias and f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def _bn(sd, prefix):
    params = {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}
    stats = {"mean": _t(sd[f"{prefix}.running_mean"]), "var": _t(sd[f"{prefix}.running_var"])}
    return params, stats


def import_neural_df(state_dict) -> dict:
    """Flax params for nn.neural_df.NeuralDF from a reference NeuralDF
    state_dict (torch module layout of reference neural_df.py:60-89:
    layers.main1.{0,3}, layers.main2.{0,3}, layers.df.0)."""
    sd = dict(state_dict)
    return {
        "params": {
            "main1_0": _linear(sd, "layers.main1.0"),
            "main1_1": _linear(sd, "layers.main1.3"),
            "main2_0": _linear(sd, "layers.main2.0"),
            "main2_1": _linear(sd, "layers.main2.3"),
            "df": _linear(sd, "layers.df.0"),
        }
    }


def import_mlp(state_dict, n_hidden: int) -> dict:
    """Flax params for nn.mlp.Mlp from a reference Mlp state_dict
    (torch Sequential: Linear at indices 0, 3, 6, ... reference mlp.py:15-27)."""
    sd = dict(state_dict)
    params = {}
    for i in range(n_hidden + 1):
        params[f"Dense_{i}"] = _linear(sd, f"layers.{3 * i}")
    return {"params": params}


def _resblock(sd, prefix, use_batchnorm, stride):
    """Flax ResBlock params/batch_stats from a torch ResBlock.

    The reference keeps Identity placeholders when batchnorm is off
    (resnet.py:33-38), so the non-bottleneck Sequential indices are fixed at
    [0 conv, 1 bn/Id, 2 relu, 3 conv, 4 bn/Id] in BOTH modes; shortcut.{0,1}.
    """
    params, stats = {}, {}
    for j, idx in enumerate([0, 3]):
        params[f"Conv_{j}"] = _conv(sd, f"{prefix}.layers.{idx}", with_bias=not use_batchnorm)
        if use_batchnorm:
            p, s = _bn(sd, f"{prefix}.layers.{idx + 1}")
            params[f"BatchNorm_{j}"] = p
            stats[f"BatchNorm_{j}"] = s
    if stride != 1:
        params["Conv_2"] = _conv(sd, f"{prefix}.shortcut.0", with_bias=not use_batchnorm)
        if use_batchnorm:
            p, s = _bn(sd, f"{prefix}.shortcut.1")
            params["BatchNorm_2"] = p
            stats["BatchNorm_2"] = s
    return params, stats


def _permute_flatten_head(linear, C=512, H=2, W=2):
    """Reorder a Linear acting on a torch NCHW flatten to act on NHWC flatten.

    torch input index: c*H*W + h*W + w   ->   flax input index: (h*W + w)*C + c
    """
    k = linear["kernel"]  # (C*H*W, L)
    k = k.reshape(C, H * W, -1).transpose(1, 0, 2).reshape(C * H * W, -1)
    return {"kernel": k, "bias": linear["bias"]}


def import_encoder(state_dict, use_batchnorm=True) -> dict:
    """Flax params+batch_stats for nn.vae.Encoder from a reference Encoder
    state_dict (reference vae.py:18-33 layout: layers.resnet.{0,3,4,5,6},
    layers.mean, layers.logvar)."""
    sd = {k.removeprefix("encoder."): v for k, v in dict(state_dict).items()}
    params = {"Conv_0": _conv(sd, "layers.resnet.0")}
    stats = {}
    strides = [2, 2, 2, 1]
    for i, idx in enumerate([3, 4, 5, 6]):
        p, s = _resblock(sd, f"layers.resnet.{idx}", use_batchnorm, strides[i])
        params[f"ResBlock_{i}"] = p
        if s:
            stats[f"ResBlock_{i}"] = s
    params["mean"] = _permute_flatten_head(_linear(sd, "layers.mean"))
    params["logvar"] = _permute_flatten_head(_linear(sd, "layers.logvar"))
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def _resblock_deconv(sd, prefix, use_batchnorm, stride):
    """Flax ResBlockDeconv params/batch_stats from a torch ResBlockDeconv
    (reference resnet.py:76-103: layers.{0 deconv, 1 bn/Id, 3 deconv, 4
    bn/Id}, shortcut.{0 deconv, 1 bn-always})."""
    params, stats = {}, {}
    for j, idx in enumerate([0, 3]):
        params[f"ConvTransposeTorch_{j}"] = _deconv(
            sd, f"{prefix}.layers.{idx}", with_bias=not use_batchnorm
        )
        if use_batchnorm:
            p, s = _bn(sd, f"{prefix}.layers.{idx + 1}")
            params[f"BatchNorm_{j}"] = p
            stats[f"BatchNorm_{j}"] = s
    if stride != 1:
        params["ConvTransposeTorch_2"] = _deconv(
            sd, f"{prefix}.shortcut.0", with_bias=not use_batchnorm
        )
        if use_batchnorm:
            p, s = _bn(sd, f"{prefix}.shortcut.1")
            params["BatchNorm_2"] = p
            stats["BatchNorm_2"] = s
    return params, stats


def _permute_unflatten_head(linear, C=512, H=8, W=15):
    """Reorder a Linear that feeds a torch (C,H,W) Unflatten to feed the flax
    NHWC reshape instead: torch output index c*H*W + h*W + w -> flax output
    index (h*W + w)*C + c."""
    k = linear["kernel"]  # (L, C*H*W)
    k = k.reshape(-1, C, H * W).transpose(0, 2, 1).reshape(-1, H * W * C)
    b = linear["bias"].reshape(C, H * W).T.reshape(H * W * C)
    return {"kernel": k, "bias": b}


def import_decoder(state_dict, use_batchnorm=True, unflatten_hw=(8, 15)) -> dict:
    """Flax params+batch_stats for nn.vae.Decoder from a reference Decoder
    state_dict (reference vae.py:63-90 layout: layers.resnet.{0 Linear,
    4..7 ResBlockDeconv, 8 ConvTranspose2d})."""
    sd = {k.removeprefix("decoder."): v for k, v in dict(state_dict).items()}
    H, W = unflatten_hw
    params = {"Dense_0": _permute_unflatten_head(_linear(sd, "layers.resnet.0"), H=H, W=W)}
    stats = {}
    for i, idx in enumerate([4, 5, 6, 7]):
        p, s = _resblock_deconv(sd, f"layers.resnet.{idx}", use_batchnorm, 2)
        params[f"ResBlockDeconv_{i}"] = p
        if s:
            stats[f"ResBlockDeconv_{i}"] = s
    params["ConvTransposeTorch_0"] = _deconv(sd, "layers.resnet.8")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def load_torchscript_state_dict(path):
    """Load a TorchScript archive's state_dict (requires torch)."""
    import torch

    module = torch.jit.load(path, map_location="cpu")
    return module.state_dict()
