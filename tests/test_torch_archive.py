"""TorchScript ARCHIVE round-trip for the weight importer (VERDICT r1 item 10).

The reference ships torch.jit.save'd archives (sdf_90_25664.pt ~841 KB MLP,
vae.pt ~82 MB ResNet VAE; reference gen_model.py:32, vae.py:11) that are git-
LFS stubs in this mount.  These tests keep nn/torch_import.py honest about the
*archive format*: reference-shaped torch modules (identical attribute nesting,
hence identical state_dict keys) are traced, torch.jit.save'd to disk, loaded
back through load_torchscript_state_dict, imported, and checked for forward
parity against the original torch module.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sdf_nmpc_tpu.nn import Encoder, NeuralDF, PositionEmbedding
from sdf_nmpc_tpu.nn.torch_import import (
    import_decoder,
    import_encoder,
    import_neural_df,
    load_torchscript_state_dict,
)

torch = pytest.importorskip("torch")

from tests.test_nn import TorchPosEmbed, build_torch_neural_df  # noqa: E402


def test_neural_df_jit_archive_roundtrip(tmp_path):
    """trace -> torch.jit.save -> load -> import == torch forward (the
    sdf_90_25664.pt path, reference gen_model.py:32-34)."""
    tm = build_torch_neural_df(size_latent=16, layer_sizes=(32, 32, 32, 32))
    tm.eval()

    class Wrapper(torch.nn.Module):
        """Attribute nesting identical to reference NeuralDF (layers.main1...)."""

        def __init__(self, inner):
            super().__init__()
            self.layers = inner.layers

        def forward(self, x):
            state, latent = x[:, :3], x[:, 3:]
            emb = self.layers["embeddings"](state)
            h = torch.cat([emb, latent], 1)
            h = self.layers["main1"](h)
            h = torch.cat([h, emb, latent], 1)
            h = self.layers["main2"](h)
            return self.layers["df"](h)

    wrapped = Wrapper(tm).eval()
    x = np.random.default_rng(0).normal(size=(7, 19)).astype(np.float32)
    traced = torch.jit.trace(wrapped, torch.tensor(x))
    path = tmp_path / "sdf_fixture.pt"
    torch.jit.save(traced, str(path))

    sd = load_torchscript_state_dict(path)
    assert "layers.main1.0.weight" in dict(sd), sorted(dict(sd))[:5]
    params = import_neural_df(sd)
    module = NeuralDF(size_latent=16, layer_sizes=(32, 32, 32, 32), w0=1.0, nb_freqs=5)
    with torch.no_grad():
        theirs = wrapped(torch.tensor(x)).numpy()
    ours = np.asarray(module.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


class _RefResBlock(torch.nn.Module):
    """Reference ResBlock attribute layout (resnet.py:20-56): Identity
    placeholders keep the Sequential indices fixed at [conv, bn/Id, relu,
    conv, bn/Id] whether batchnorm is on or off."""

    def __init__(self, size_in, stride, use_batchnorm=True):
        super().__init__()
        size_out = size_in * stride
        bias = not use_batchnorm
        bn = (
            (lambda c: torch.nn.BatchNorm2d(c))
            if use_batchnorm
            else (lambda c: torch.nn.Identity())
        )
        self.layers = torch.nn.Sequential(
            torch.nn.Conv2d(size_in, size_out, 3, stride=stride, padding=1, bias=bias),
            bn(size_out),
            torch.nn.ReLU(),
            torch.nn.Conv2d(size_out, size_out, 3, padding=1, bias=bias),
            bn(size_out),
        )
        if stride == 1:
            self.shortcut = torch.nn.Identity()
        else:
            self.shortcut = torch.nn.Sequential(
                torch.nn.Conv2d(size_in, size_out, 1, stride=stride, bias=bias),
                bn(size_out),
            )
        self.term_activation = torch.nn.ReLU()
        self.term_dropout = torch.nn.Identity()

    def forward(self, x):
        return self.term_dropout(self.term_activation(self.layers(x) + self.shortcut(x)))


class _RefResBlockDeconv(torch.nn.Module):
    """Reference ResBlockDeconv shape (resnet.py:59+)."""

    def __init__(self, size_in, stride, use_batchnorm=True):
        super().__init__()
        size_out = size_in // stride
        bias = not use_batchnorm
        bn = (
            (lambda c: torch.nn.BatchNorm2d(c))
            if use_batchnorm
            else (lambda c: torch.nn.Identity())
        )
        self.layers = torch.nn.Sequential(
            torch.nn.ConvTranspose2d(
                size_in, size_out, 3, stride=stride, padding=1, output_padding=1, bias=bias
            ),
            bn(size_out),
            torch.nn.ReLU(),
            torch.nn.ConvTranspose2d(size_out, size_out, 3, padding=1, bias=bias),
            bn(size_out),
        )
        self.shortcut = torch.nn.Sequential(
            torch.nn.ConvTranspose2d(
                size_in, size_out, 1, stride=stride, output_padding=1, bias=bias
            ),
            bn(size_out),
        )
        self.term_activation = torch.nn.ReLU()

    def forward(self, x):
        return self.term_activation(self.layers(x) + self.shortcut(x))


class _RefEncoder(torch.nn.Module):
    """Reference Encoder attribute layout (vae.py:11-38)."""

    def __init__(self, nb_chan, size_latent, batchnorm=True):
        super().__init__()
        self.layers = torch.nn.ModuleDict(
            {
                "resnet": torch.nn.Sequential(
                    torch.nn.Conv2d(nb_chan, 64, kernel_size=7, stride=2, padding=3),
                    torch.nn.ELU(),
                    torch.nn.MaxPool2d(kernel_size=3, stride=2, padding=1),
                    _RefResBlock(64, 2, batchnorm),
                    _RefResBlock(128, 2, batchnorm),
                    _RefResBlock(256, 2, batchnorm),
                    _RefResBlock(512, 1, batchnorm),
                    torch.nn.AdaptiveAvgPool2d((2, 2)),
                    torch.nn.Identity(),
                    torch.nn.Flatten(),
                ),
                "mean": torch.nn.Linear(512 * 2 * 2, size_latent),
                "logvar": torch.nn.Linear(512 * 2 * 2, size_latent),
            }
        )

    def forward(self, x):
        return self.layers["mean"](self.layers["resnet"](x))


class _RefDecoder(torch.nn.Module):
    """Reference Decoder attribute layout (vae.py:63-90), shrunk unflatten."""

    def __init__(self, nb_chan, size_latent, shape_imgs, batchnorm=True):
        super().__init__()
        self.layers = torch.nn.ModuleDict(
            {
                "resnet": torch.nn.Sequential(
                    torch.nn.Linear(size_latent, 512 * 2 * 2),
                    torch.nn.ELU(),
                    torch.nn.Unflatten(1, (512, 2, 2)),
                    torch.nn.Identity(),
                    _RefResBlockDeconv(512, 2, batchnorm),
                    _RefResBlockDeconv(256, 2, batchnorm),
                    _RefResBlockDeconv(128, 2, batchnorm),
                    _RefResBlockDeconv(64, 2, batchnorm),
                    torch.nn.ConvTranspose2d(32, nb_chan, kernel_size=5, stride=1, padding=2),
                    torch.nn.Upsample(size=shape_imgs, mode="bilinear"),
                    torch.nn.Sigmoid(),
                ),
            }
        )

    def forward(self, x):
        return self.layers["resnet"](x)


class _RefVae(torch.nn.Module):
    """Reference Vae nesting (vae.py:93-114): self.encoder / self.decoder —
    the state_dict key layout of the shipped vae.pt archive."""

    def __init__(self, size_latent, shape_imgs, batchnorm=True):
        super().__init__()
        self.encoder = _RefEncoder(1, size_latent, batchnorm)
        self.decoder = _RefDecoder(1, size_latent, shape_imgs, batchnorm)

    def forward(self, x):
        return self.decoder(self.encoder(x))


def test_vae_jit_archive_roundtrip(tmp_path):
    """Full ResNet-VAE archive (the vae.pt path, reference vae.py:11-13):
    trace the end-to-end Vae, save, reload, import the ENCODER, compare
    latents against the torch encoder."""
    shape = (48, 80)
    tvae = _RefVae(8, shape, batchnorm=True)
    tvae.eval()
    for m in tvae.modules():  # non-trivial running stats
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.default_rng(1).uniform(size=(1, 1, *shape)).astype(np.float32)
    traced = torch.jit.trace(tvae, torch.tensor(x))
    path = tmp_path / "vae_fixture.pt"
    torch.jit.save(traced, str(path))

    sd = load_torchscript_state_dict(path)
    keys = set(dict(sd))
    assert "encoder.layers.resnet.0.weight" in keys
    assert "encoder.layers.resnet.3.layers.0.weight" in keys
    assert any(k.startswith("decoder.") for k in keys)

    variables = import_encoder(sd, use_batchnorm=True)
    module = Encoder(1, 8, dropout_rate=0.0, batchnorm=True)
    with torch.no_grad():
        theirs = tvae.encoder(torch.tensor(x)).numpy()
    ours = np.asarray(module.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1))))
    np.testing.assert_allclose(ours, theirs, atol=2e-4)

    # DECODER import from the same archive (the OPC-side set_latent/decode
    # viz path, reference vae.py:42-45): torch ConvTranspose2d semantics are
    # reproduced exactly by ConvTransposeTorch given the flipped kernels
    from sdf_nmpc_tpu.nn import Decoder

    dec_vars = import_decoder(sd, use_batchnorm=True, unflatten_hw=(2, 2))
    dec = Decoder(1, 8, shape_imgs=(1, *shape), dropout_rate=0.0,
                  batchnorm=True, unflatten_hw=(2, 2))
    z = np.random.default_rng(2).normal(size=(3, 8)).astype(np.float32)
    with torch.no_grad():
        theirs_img = tvae.decoder(torch.tensor(z)).numpy()  # NCHW
    ours_img = np.asarray(dec.apply(dec_vars, jnp.asarray(z)))  # NHWC
    np.testing.assert_allclose(
        ours_img.transpose(0, 3, 1, 2), theirs_img, atol=2e-5
    )
