"""One-time converter: reference TorchScript weights -> flax param pytrees.

The reference ships TorchScript archives (sdf_90_25664.pt, vae.pt; reference
gen_model.py:32, vae.py:11).  This module maps their state_dicts onto the flax
modules of this package so users can carry trained weights over:

  * NeuralDF  — exact (validated against torch to float tolerance)
  * Mlp       — exact
  * Encoder   — exact, including the NCHW->NHWC kernel transposes and the
                flatten-order permutation of the mean/logvar heads
  * Decoder   — not supported (torch ConvTranspose2d output_padding has no
                weight-compatible flax twin); the decoder is OPC-side viz only
                (reference vae.py:42) — retrain or keep torch for display.

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


def load_torchscript_state_dict(path):
    """Load a TorchScript archive's state_dict (requires torch)."""
    import torch

    module = torch.jit.load(path, map_location="cpu")
    return module.state_dict()
