"""Neural-stack tests: shapes, SIREN properties, and torch weight-import parity.

The torch reference modules are constructed here from the architecture spec
(SURVEY.md §2.1 L7) to validate that the flax modules + importer reproduce the
reference networks numerically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sdf_nmpc_tpu.nn import (
    Encoder,
    Mlp,
    NeuralDF,
    PositionEmbedding,
    Vae,
    adaptive_avg_pool2d,
    init_neural_df,
    make_sdf_fn,
    sample_latent,
)
from sdf_nmpc_tpu.nn.torch_import import (
    import_encoder,
    import_mlp,
    import_neural_df,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# torch reference constructions (from spec, for parity validation)
# ---------------------------------------------------------------------------

class TorchPosEmbed(torch.nn.Module):
    def __init__(self, nb_freqs, dirs):
        super().__init__()
        self.register_buffer("freq_bands", 2 ** torch.arange(nb_freqs, dtype=torch.float32))
        self.register_buffer("dirs", torch.tensor(dirs, dtype=torch.float32))

    def forward(self, x):
        proj = x @ self.dirs
        xb = (proj[..., None] * self.freq_bands).reshape(*proj.shape[:-1], -1)
        emb = torch.sin(torch.cat([xb, xb + 0.5 * np.pi], dim=-1))
        return torch.cat([x, emb], dim=-1)


def build_torch_neural_df(size_latent=16, layer_sizes=(32, 32, 32, 32), nb_freqs=5, w0=1.0):
    """Reference NeuralDF layout (neural_df.py:60-89): ModuleDict with
    main1/main2 Sequentials [Linear, act, Dropout, Linear, act, Dropout]."""
    pe = PositionEmbedding(nb_freqs, "none")
    embed = TorchPosEmbed(nb_freqs, pe.dirs)
    nemb = pe.nb_embeddings

    class Sine(torch.nn.Module):
        def forward(self, x):
            return torch.sin(w0 * x)

    m = torch.nn.Module()
    m.layers = torch.nn.ModuleDict(
        {
            "embeddings": torch.nn.Sequential(embed),
            "main1": torch.nn.Sequential(
                torch.nn.Linear(nemb + size_latent, layer_sizes[0]),
                Sine(),
                torch.nn.Dropout(0.0),
                torch.nn.Linear(layer_sizes[0], layer_sizes[1]),
                Sine(),
                torch.nn.Dropout(0.0),
            ),
            "main2": torch.nn.Sequential(
                torch.nn.Linear(layer_sizes[1] + nemb + size_latent, layer_sizes[2]),
                Sine(),
                torch.nn.Dropout(0.0),
                torch.nn.Linear(layer_sizes[2], layer_sizes[3]),
                Sine(),
                torch.nn.Dropout(0.0),
            ),
            "df": torch.nn.Sequential(torch.nn.Linear(layer_sizes[3], 1)),
        }
    )

    def forward(x):
        state, latent = x[:, :3], x[:, 3:]
        emb = m.layers["embeddings"](state)
        h = torch.cat([emb, latent], 1)
        h = m.layers["main1"](h)
        h = torch.cat([h, emb, latent], 1)
        h = m.layers["main2"](h)
        return m.layers["df"](h)

    m.forward = forward
    return m


def test_embedding_matches_torch():
    pe = PositionEmbedding(5, "none")
    tp = TorchPosEmbed(5, pe.dirs)
    x = np.random.default_rng(0).normal(size=(7, 3)).astype(np.float32)
    ours = np.asarray(pe(jnp.asarray(x)))
    theirs = tp(torch.tensor(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    assert pe.nb_embeddings == 33


@pytest.mark.parametrize("proj", ["cube", "octohedron", "dodecahedron", "icosahedron"])
def test_offaxis_dirs_unit_norm(proj):
    pe = PositionEmbedding(3, proj)
    np.testing.assert_allclose(np.linalg.norm(pe.dirs, axis=0), 1.0, atol=1e-12)
    assert pe.dirs.shape[1] == {"cube": 6, "octohedron": 8, "dodecahedron": 12, "icosahedron": 20}[proj]


def test_neural_df_import_parity():
    tm = build_torch_neural_df()
    tm.eval()
    params = import_neural_df(
        {k: v for k, v in torch.nn.Module.state_dict(tm).items()}
    )
    module = NeuralDF(size_latent=16, layer_sizes=(32, 32, 32, 32), w0=1.0, nb_freqs=5)
    x = np.random.default_rng(1).normal(size=(9, 19)).astype(np.float32)
    with torch.no_grad():
        theirs = tm.forward(torch.tensor(x)).numpy()
    ours = np.asarray(module.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_mlp_import_parity():
    tm = torch.nn.Module()
    tm.layers = torch.nn.Sequential(
        torch.nn.Linear(3, 16), torch.nn.Tanh(), torch.nn.Dropout(0),
        torch.nn.Linear(16, 16), torch.nn.Tanh(), torch.nn.Dropout(0),
        torch.nn.Linear(16, 1), torch.nn.Identity(),
    )
    tm.eval()
    params = import_mlp(tm.state_dict(), n_hidden=2)
    module = Mlp(size_out=1, layer_sizes=(16, 16), inner_act=jnp.tanh)
    x = np.random.default_rng(2).normal(size=(5, 3)).astype(np.float32)
    with torch.no_grad():
        theirs = tm.layers(torch.tensor(x)).numpy()
    ours = np.asarray(module.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_adaptive_avg_pool_matches_torch():
    x = np.random.default_rng(3).normal(size=(2, 9, 15, 4)).astype(np.float32)
    ours = np.asarray(adaptive_avg_pool2d(jnp.asarray(x), (2, 2)))
    theirs = (
        torch.nn.AdaptiveAvgPool2d((2, 2))(torch.tensor(x.transpose(0, 3, 1, 2)))
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def _build_torch_encoder(size_latent=8, batchnorm=True):
    """Reference Encoder layout (vae.py:18-33) with reference ResBlock layout
    (resnet.py:33-56)."""

    def resblock(size_in, stride):
        size_out = size_in * stride
        use_bias = not batchnorm
        bn = (lambda c: torch.nn.BatchNorm2d(c)) if batchnorm else (lambda c: torch.nn.Identity())
        blk = torch.nn.Module()
        blk.layers = torch.nn.Sequential(
            torch.nn.Conv2d(size_in, size_out, 3, stride=stride, padding=1, bias=use_bias),
            bn(size_out),
            torch.nn.ReLU(),
            torch.nn.Conv2d(size_out, size_out, 3, padding=1, bias=use_bias),
            bn(size_out),
        )
        if stride == 1:
            blk.shortcut = torch.nn.Identity()
        else:
            blk.shortcut = torch.nn.Sequential(
                torch.nn.Conv2d(size_in, size_out, 1, stride=stride, bias=use_bias),
                bn(size_out),
            )
        blk.fwd = lambda x: torch.nn.functional.relu(blk.layers(x) + blk.shortcut(x))
        return blk

    enc = torch.nn.Module()
    enc.conv = torch.nn.Conv2d(1, 64, 7, stride=2, padding=3)
    enc.pool = torch.nn.MaxPool2d(3, stride=2, padding=1)
    enc.blocks = torch.nn.ModuleList([resblock(64, 2), resblock(128, 2), resblock(256, 2), resblock(512, 1)])
    enc.avg = torch.nn.AdaptiveAvgPool2d((2, 2))
    enc.mean = torch.nn.Linear(512 * 4, size_latent)
    enc.logvar = torch.nn.Linear(512 * 4, size_latent)

    def forward(x):
        h = enc.pool(torch.nn.functional.elu(enc.conv(x)))
        for b in enc.blocks:
            h = b.fwd(h)
        h = enc.avg(h).flatten(1)
        return enc.mean(h)

    enc.fwd = forward

    def state_dict_reference_names():
        sd = {}
        sd.update({f"layers.resnet.0.{k}": v for k, v in enc.conv.state_dict().items()})
        for i, b in enumerate(enc.blocks):
            for k, v in b.layers.state_dict().items():
                sd[f"layers.resnet.{3 + i}.layers.{k}"] = v
            if not isinstance(b.shortcut, torch.nn.Identity):
                for k, v in b.shortcut.state_dict().items():
                    sd[f"layers.resnet.{3 + i}.shortcut.{k}"] = v
        sd.update({f"layers.mean.{k}": v for k, v in enc.mean.state_dict().items()})
        sd.update({f"layers.logvar.{k}": v for k, v in enc.logvar.state_dict().items()})
        return sd

    enc.reference_state_dict = state_dict_reference_names
    return enc


def test_encoder_import_parity():
    tm = _build_torch_encoder(size_latent=8, batchnorm=True)
    tm.eval()
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):  # non-trivial running stats
            with torch.no_grad():
                m.running_mean.uniform_(-0.1, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    variables = import_encoder(tm.reference_state_dict(), use_batchnorm=True)
    module = Encoder(1, 8, dropout_rate=0.0, batchnorm=True)

    x = np.random.default_rng(4).uniform(size=(1, 64, 96, 1)).astype(np.float32)
    with torch.no_grad():
        theirs = tm.fwd(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(module.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_neural_df_grad_and_sdf_fn():
    module, params = init_neural_df(size_latent=8, layer_sizes=(16, 16, 16, 16), seed=0)
    sdf = make_sdf_fn(module, params)
    pos = jnp.array([0.5, 0.1, -0.2])
    latent = jnp.zeros(8)
    val = sdf(pos, latent)
    grad = jax.grad(sdf)(pos, latent)
    assert val.shape == () and grad.shape == (3,)
    assert np.isfinite(float(val)) and np.all(np.isfinite(np.asarray(grad)))


def test_vae_end_to_end_shapes():
    vae = Vae(size_latent=8, shape_imgs=(1, 30, 48), dropout_rate=0.0, batchnorm=False)
    x = jnp.zeros((2, 30, 48, 1))
    variables = vae.init(jax.random.PRNGKey(0), x)
    out = vae.apply(variables, x)
    assert out.shape == (2, 30, 48, 1)
    assert (np.asarray(out) >= 0).all() and (np.asarray(out) <= 1).all()


def test_sample_latent_shapes():
    mean = jnp.zeros((3, 8))
    logvar = jnp.zeros((3, 8))
    one = sample_latent(jax.random.PRNGKey(0), mean, logvar)
    many = sample_latent(jax.random.PRNGKey(0), mean, logvar, num_samples=5)
    assert one.shape == (3, 8) and many.shape == (15, 8)
