"""beta-VAE training loop.

Parity with reference scripts/neural_nets/vae_train.py: encoder mean/logvar ->
reparameterized sample -> decoder; reconstruction loss is the masked MSE with
positive+distance bias (bias_pos_ratio 0.1, bias_dist_ratio 0.1, degree 3,
vae_train.py:44-47, :112) plus beta-normalized KLD; labels pass through the
erosion collision mapping (col_map=True); AdamW + epoch cosine LR; per-epoch
checkpoints and resume.
"""

from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.losses import loss_kld, loss_mse_valid_pixels, loss_mse_valid_pixels_bias_pos_dist
from ..nn.initializers import apply_conv_init
from ..nn.vae import Vae, sample_latent
from .checkpoints import load_checkpoint, save_checkpoint
from .metrics import MetricsWriter


@dataclasses.dataclass
class VaeTrainConfig:
    size_latent: int = 128
    nb_epochs: int = 100
    lr_start: float = 1e-4
    lr_min: float = 1e-5
    lr_nb_steps: int = 20
    weight_decay: float = 1e-5
    batch_size: int = 16
    beta_kld: float = 1.0
    bias: bool = True
    bias_dist_ratio: float = 0.1
    bias_dist_degree: int = 3
    bias_pos_ratio: float = 0.1
    dropout_rate: float = 0.1
    batchnorm: bool = True
    seed: int = 0

    def lr_at_epoch(self, epoch: int) -> float:
        t = min(epoch, self.lr_nb_steps)
        return self.lr_min + 0.5 * (self.lr_start - self.lr_min) * (
            1 + np.cos(np.pi * t / self.lr_nb_steps)
        )


def train_vae(train_ds, valid_ds, metadata, out_dir, cfg: VaeTrainConfig = VaeTrainConfig(),
              restart_from_epoch: int = 0, log_fn=print):
    """Returns (vae_module, variables, history)."""
    shape_imgs = metadata["shape_imgs"]
    H, W = shape_imgs[-2], shape_imgs[-1]
    vae = Vae(size_latent=cfg.size_latent, shape_imgs=(1, H, W),
              dropout_rate=cfg.dropout_rate, batchnorm=cfg.batchnorm)

    key = jax.random.PRNGKey(cfg.seed)
    key, kinit = jax.random.split(key)
    variables = vae.init(
        {"params": kinit, "latent": kinit, "dropout": kinit},
        jnp.zeros((1, H, W, 1)), train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    key, kconv = jax.random.split(key)
    params = apply_conv_init(params, kconv)  # xavier convs (layer_init.py:5-12)

    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.lr_start, weight_decay=cfg.weight_decay
    )
    opt_state = tx.init(params)
    if restart_from_epoch:
        params, opt_state, _, batch_stats = load_checkpoint(
            out_dir, params, opt_state, epoch=restart_from_epoch - 1,
            batch_stats_template=batch_stats,
        )

    def recon_loss(target, pred):
        if cfg.bias:
            return loss_mse_valid_pixels_bias_pos_dist(
                target, pred, cfg.bias_pos_ratio, cfg.bias_dist_ratio, cfg.bias_dist_degree
            )
        return loss_mse_valid_pixels(target, pred)

    @jax.jit
    def train_step(params, batch_stats, opt_state, imgs_in, imgs_out, rngs, lr):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": batch_stats} if batch_stats else {"params": p}
            (mean, logvar), mutated = vae.apply(
                variables, imgs_in, train=True, with_logvar=True,
                method=lambda m, x, train, with_logvar: m.encoder(x, train, with_logvar),
                mutable=["batch_stats"] if batch_stats else [],
                rngs=rngs,
            )
            latent = sample_latent(rngs["latent"], mean, logvar)
            variables2 = (
                {"params": p, "batch_stats": mutated.get("batch_stats", batch_stats)}
                if batch_stats
                else {"params": p}
            )
            recon, mutated2 = vae.apply(
                variables2, latent, True,
                method=lambda m, z, train: m.decoder(z, train),
                mutable=["batch_stats"] if batch_stats else [],
                rngs=rngs,
            )
            l_reg = recon_loss(imgs_out, recon)
            l_kld = loss_kld(mean, logvar, cfg.beta_kld, cfg.size_latent, (H, W))
            new_stats = mutated2.get("batch_stats", batch_stats)
            return l_reg + l_kld, (l_reg, l_kld, new_stats)

        (_, (l_reg, l_kld, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, l_reg, l_kld

    @jax.jit
    def eval_step(params, batch_stats, imgs_in, imgs_out):
        variables = {"params": params, "batch_stats": batch_stats} if batch_stats else {"params": params}
        mean, logvar = vae.apply(
            variables, imgs_in, False, True,
            method=lambda m, x, train, with_logvar: m.encoder(x, train, with_logvar),
        )
        recon = vae.apply(variables, mean, False, method=lambda m, z, train: m.decoder(z, train))
        return recon_loss(imgs_out, recon), loss_kld(mean, logvar, cfg.beta_kld, cfg.size_latent, (H, W))

    def to_nhwc(x):
        if x.ndim == 3:
            x = x[:, None]
        return jnp.transpose(x, (0, 2, 3, 1))

    from pathlib import Path

    tsb_train = MetricsWriter(Path(out_dir) / "train")
    tsb_valid = MetricsWriter(Path(out_dir) / "valid")

    history = []
    for epoch in range(restart_from_epoch, cfg.nb_epochs):
        tic = time.time()
        lr = cfg.lr_at_epoch(epoch)
        agg_t, nb_t = np.zeros(2), 0
        key, kshuf = jax.random.split(key)
        for imgs_in, imgs_out in train_ds.batches(cfg.batch_size, key=kshuf, shuffle=True):
            key, kd, kl = jax.random.split(key, 3)
            params, batch_stats, opt_state, l_reg, l_kld = train_step(
                params, batch_stats, opt_state, to_nhwc(imgs_in), to_nhwc(imgs_out),
                {"dropout": kd, "latent": kl}, lr,
            )
            agg_t += [float(l_reg), float(l_kld)]
            nb_t += 1
        agg_t /= max(nb_t, 1)

        agg_v, nb_v = np.zeros(2), 0
        if valid_ds is not None:
            for imgs_in, imgs_out in valid_ds.batches(cfg.batch_size):
                l_reg, l_kld = eval_step(params, batch_stats, to_nhwc(imgs_in), to_nhwc(imgs_out))
                agg_v += [float(l_reg), float(l_kld)]
                nb_v += 1
            agg_v /= max(nb_v, 1)

        tsb_train.add_scalars({"loss/regression": agg_t[0], "loss/kld": agg_t[1]}, epoch)
        if nb_v:
            tsb_valid.add_scalars({"loss/regression": agg_v[0], "loss/kld": agg_v[1]}, epoch)
        save_checkpoint(out_dir, params, opt_state, epoch, extra={"lr": lr},
                        batch_stats=batch_stats)
        rec = {"epoch": epoch, "lr": lr, "time": time.time() - tic,
               "train": agg_t.tolist(), "valid": agg_v.tolist()}
        history.append(rec)
        log_fn(f"epoch {epoch} lr {lr:.2e} train {agg_t.round(5).tolist()} "
               f"valid {agg_v.round(5).tolist()} ({rec['time']:.1f}s)")

    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return vae, variables, history
