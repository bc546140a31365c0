"""SDF-network training loop.

Parity with reference scripts/neural_nets/df_train.py: frozen VAE encoder
produces M sampled latents per image (:163-166), training points are a mixed
frustum/ball/around-obstacles/margin sample (:22-37, ratios :62-64), ground
truth SDF+gradients come from the data engine (:168), the composite SDF loss
(regression/gradient/direction/eikonal) is weighted (50, 0, 1/60, 5) (:73),
optimized with AdamW + epoch-wise cosine LR annealing that stops after
lr_nb_steps (:137-148, :245-247), with per-epoch checkpoints and resume.

TPU-first: the whole batch step (latent sampling -> GT points -> loss ->
update) is one jitted function; GT SDF labels are computed on device by the
jnp DfComputer instead of Warp CUDA.
"""

from __future__ import annotations

import dataclasses
import time
from pathlib import Path
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..data.df_computer import DfComputer
from ..data.losses import loss_sdf
from ..data.pos_sampler import PosSampler
from ..nn.neural_df import NeuralDF
from ..nn.vae import Encoder, sample_latent
from .checkpoints import load_checkpoint, save_checkpoint
from .metrics import MetricsWriter, df_loss_scalars


@dataclasses.dataclass
class DfTrainConfig:
    max_df: float = 1.0
    dmax: float = 5.0
    signed: bool = True
    nb_epochs: int = 200
    lr_start: float = 5e-5
    lr_min: float = 1e-5
    lr_nb_steps: int = 20
    weight_decay: float = 1e-5
    batch_size: int = 50
    points_per_img: int = 2500
    ratio_points_ball: float = 0.2
    ratio_points_obs: float = 0.4
    ratio_points_margin: float = 0.15
    close_ball_size: float = 0.75
    loss_weights: Sequence[float] = (50.0, 0.0, 1 / 60, 5.0)
    seed: int = 0

    def point_counts(self):
        n = self.points_per_img
        nb_ball = int(n * self.ratio_points_ball)
        nb_obs = int(n * self.ratio_points_obs)
        nb_margin = int(n * self.ratio_points_margin)
        nb_frustum = n - nb_ball - nb_obs - nb_margin
        return nb_frustum, nb_ball, nb_obs, nb_margin

    def lr_at_epoch(self, epoch: int) -> float:
        """Cosine annealing frozen after lr_nb_steps (reference behavior)."""
        t = min(epoch, self.lr_nb_steps)
        return self.lr_min + 0.5 * (self.lr_start - self.lr_min) * (
            1 + np.cos(np.pi * t / self.lr_nb_steps)
        )


def sample_points(key, sampler: PosSampler, imgs, counts, ball_size):
    """Mixed-region point sampling, grouped per image
    (reference df_train.py:22-37)."""
    nb_f, nb_b, nb_o, nb_m = counts
    B = imgs.shape[0]
    kf, kb, ko, km = jax.random.split(key, 4)
    states_f = sampler.sample_pos_in_frustrum(kf, B * nb_f).reshape(B, nb_f, 3)
    states_b = sampler.sample_pos_in_ball(kb, B * nb_b, ball_size).reshape(B, nb_b, 3)
    states_m = sampler.sample_pos_in_frustrum_margin(km, B * nb_m).reshape(B, nb_m, 3)
    states_o = sampler.sample_pos_around_obs(ko, imgs, nb_o, mode="random", std=0.1)
    return jnp.concatenate([states_f, states_b, states_o, states_m], axis=1).reshape(-1, 3)


def train_df(
    train_ds,
    valid_ds,
    metadata,
    encoder_variables,
    out_dir,
    cfg: DfTrainConfig = DfTrainConfig(),
    nn_kwargs: Optional[dict] = None,
    size_latent: int = 128,
    restart_from_epoch: int = 0,
    encoder_module: Optional[Encoder] = None,
    log_fn=print,
):
    """Train one NeuralDF variant.  Returns (module, params, history)."""
    defaults = dict(
        signed=cfg.signed, size_latent=size_latent, nb_freqs=5, res="full",
        embed="oct", act="sin", dropout_rate=0.1, w0=20.0,
    )
    defaults.update(nn_kwargs or {})  # caller overrides win (w0 etc.)
    nn_kwargs = defaults
    module = NeuralDF(**nn_kwargs)
    key = jax.random.PRNGKey(cfg.seed)
    key, kinit = jax.random.split(key)
    params = module.init(kinit, jnp.zeros(3 + size_latent), train=False)

    encoder = encoder_module if encoder_module is not None else Encoder(1, size_latent, dropout_rate=0.0)
    df_cpt = DfComputer(cfg.signed, cfg.dmax, metadata["hfov"], metadata["vfov"],
                        cfg.max_df, is_depth=metadata["is_depth"],
                        is_spherical=metadata["is_spherical"])
    sampler = PosSampler(cfg.dmax, metadata["hfov"], metadata["vfov"], margin=40,
                         is_spherical=metadata["is_spherical"])

    tx = optax.inject_hyperparams(optax.adamw)(
        learning_rate=cfg.lr_start, weight_decay=cfg.weight_decay
    )
    opt_state = tx.init(params)
    if restart_from_epoch:
        params, opt_state, _ = load_checkpoint(out_dir, params, opt_state,
                                               epoch=restart_from_epoch - 1)

    counts = cfg.point_counts()
    weights = tuple(cfg.loss_weights)

    def encode_latents(key, imgs_in, train: bool):
        """Frozen encoder -> one latent per sampled point."""
        x = jnp.transpose(imgs_in, (0, 2, 3, 1))  # NCHW -> NHWC
        if train:
            mean, logvar = encoder.apply(encoder_variables, x, with_logvar=True)
            return sample_latent(key, mean, logvar, num_samples=cfg.points_per_img)
        mean = encoder.apply(encoder_variables, x)
        return jnp.repeat(mean, cfg.points_per_img, axis=0)

    def loss_and_metrics(params, states, latents, df_gt, df_grads, dropout_key, train):
        if train:
            apply_fn = lambda p, x: module.apply(
                p, x, train=True, rngs={"dropout": dropout_key}
            )
        else:
            apply_fn = lambda p, x: module.apply(p, x, train=False)
        inputs = jnp.concatenate([states, latents], axis=-1)
        losses = loss_sdf(apply_fn, params, inputs, df_grads, df_gt)
        total = sum(w * l for w, l in zip(weights, losses))
        return total, jnp.stack(losses)

    grad_fn = jax.jit(
        jax.value_and_grad(lambda *a: loss_and_metrics(*a, train=True), has_aux=True)
    )
    eval_fn = jax.jit(lambda *a: loss_and_metrics(*a, train=False))

    @jax.jit
    def apply_update(params, opt_state, grads, lr):
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    tsb_train = MetricsWriter(Path(out_dir) / "train")
    tsb_valid = MetricsWriter(Path(out_dir) / "valid")

    history = []
    for epoch in range(restart_from_epoch, cfg.nb_epochs):
        tic = time.time()
        lr = cfg.lr_at_epoch(epoch)
        agg_train = np.zeros(4)
        n_batches = 0
        key, kshuf = jax.random.split(key)
        for imgs_in, imgs_out in train_ds.batches(cfg.batch_size, key=kshuf, shuffle=True):
            key, klat, kpts, kdrop = jax.random.split(key, 4)
            if imgs_in.ndim == 3:
                imgs_in = imgs_in[:, None]
                imgs_out = imgs_out[:, None]
            latents = encode_latents(klat, imgs_in, train=True)
            states = sample_points(kpts, sampler, imgs_out[:, 0], counts, cfg.close_ball_size)
            df_gt, df_grads = df_cpt.get_df(imgs_out[:, 0], states)
            (total, parts), grads = grad_fn(params, states, latents, df_gt, df_grads, kdrop)
            params, opt_state = apply_update(params, opt_state, grads, lr)
            agg_train += np.asarray(parts)
            n_batches += 1
        agg_train /= max(n_batches, 1)

        agg_valid = np.zeros(4)
        n_valid = 0
        if valid_ds is not None:
            for imgs_in, imgs_out in valid_ds.batches(cfg.batch_size):
                key, klat, kpts, kdrop = jax.random.split(key, 4)
                if imgs_in.ndim == 3:
                    imgs_in = imgs_in[:, None]
                    imgs_out = imgs_out[:, None]
                latents = encode_latents(klat, imgs_in, train=False)
                states = sample_points(kpts, sampler, imgs_out[:, 0], counts, cfg.close_ball_size)
                df_gt, df_grads = df_cpt.get_df(imgs_out[:, 0], states)
                _, parts = eval_fn(params, states, latents, df_gt, df_grads, kdrop)
                agg_valid += np.asarray(parts)
                n_valid += 1
            agg_valid /= max(n_valid, 1)

        tsb_train.add_scalars(df_loss_scalars(agg_train), epoch)
        if n_valid:
            tsb_valid.add_scalars(df_loss_scalars(agg_valid), epoch)
        save_checkpoint(out_dir, params, opt_state, epoch, extra={"lr": lr})
        rec = {
            "epoch": epoch, "lr": lr, "time": time.time() - tic,
            "train": agg_train.tolist(), "valid": agg_valid.tolist(),
        }
        history.append(rec)
        log_fn(
            f"epoch {epoch} lr {lr:.2e} "
            f"train {agg_train.round(4).tolist()} valid {agg_valid.round(4).tolist()} "
            f"({rec['time']:.1f}s)"
        )

    return module, params, history
