"""Training losses: masked/biased VAE reconstruction, beta-KLD, weighted BCE,
composite SDF regression with gradient/eikonal terms.

Parity with reference sdf_nmpc/utils/losses.py.  The SDF composite loss
computes input-space network gradients via jax.grad through the model apply
(the reference uses torch.autograd.grad, losses.py:82-86).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _loss_with_invalid_pixels(loss, target):
    """Mask invalid (0) pixels, sum per image, mean over batch
    (reference losses.py:5-12)."""
    masked = jnp.where(target > 0, loss, 0.0)
    return jnp.mean(jnp.sum(masked, axis=tuple(range(1, loss.ndim))))


def loss_mse_valid_pixels(target, reconst):
    return _loss_with_invalid_pixels((reconst - target) ** 2, target)


def loss_mse_valid_pixels_bias_distance(target, reconst, weight_ratio=0.1, degree=2):
    """Weight errors toward near-range pixels (reference losses.py:20-27)."""
    mse = (reconst - target) ** 2
    biased = mse * (target**degree * (weight_ratio - 1) + 1)
    return _loss_with_invalid_pixels(biased, target)


def loss_mse_valid_pixels_bias_positive(target, reconst, weight_ratio=0.1):
    """Asymmetric penalty: predicting-closer errors get weight_ratio
    (reference losses.py:30-36)."""
    mse = (reconst - target) ** 2
    biased = jnp.where(target > reconst, mse * weight_ratio, mse)
    return _loss_with_invalid_pixels(biased, target)


def loss_mse_valid_pixels_bias_pos_dist(target, reconst, pos_ratio=1.0, dist_ratio=1.0, degree=2):
    """Combined positive+distance bias (reference losses.py:39-47)."""
    mse = (reconst - target) ** 2
    biased = jnp.where(target > reconst, mse * pos_ratio, mse)
    biased = biased * (target**degree * (dist_ratio - 1) + 1)
    return _loss_with_invalid_pixels(biased, target)


def loss_kld(mean, logvar, beta, size_latent, size_img):
    """beta-normalized KLD (reference losses.py:50-55, beta-VAE norm per
    https://openreview.net/pdf?id=Sy2fzU9gl)."""
    beta_norm = (beta * size_latent) / (size_img[0] * size_img[1])
    kld = jnp.mean(-0.5 * jnp.sum(1 + logvar - mean**2 - jnp.exp(logvar), axis=1))
    return kld * beta_norm


def loss_weighted_bce(predictions, labels, weights=(1.0, 1.0)):
    """Class-weighted BCE (reference losses.py:58-64)."""
    p = jnp.clip(predictions, 1e-7, 1 - 1e-7)
    bce = -weights[1] * labels * jnp.log(p) - weights[0] * (1 - labels) * jnp.log(1 - p)
    return jnp.mean(bce)


def loss_sdf(apply_fn, params, inputs, target_grad, target_outputs):
    """Composite SDF loss (reference losses.py:68-96):
      1. sign-weighted regression (x10 on sign mismatch)
      2. gradient MSE against GT direction
      3. gradient direction angle [deg] over unsaturated points
      4. eikonal: |grad| -> |grad_gt|

    apply_fn(params, x) -> (..., 1); gradients w.r.t. the first 3 input dims
    are taken through the network with jax.grad.
    Returns (regression, grad_mse, grad_dir_deg, eikonal).
    """
    outputs = apply_fn(params, inputs)[..., 0]

    scalar = lambda x: apply_fn(params, x)[..., 0]
    nn_grad = jax.vmap(jax.grad(scalar))(inputs)[..., :3]

    mse = (outputs - target_outputs) ** 2
    different_sign = jnp.sign(target_outputs) != jnp.sign(outputs)
    loss_regression = jnp.mean(jnp.where(different_sign, mse * 10.0, mse))

    loss_gradient_mse = jnp.mean((nn_grad - target_grad) ** 2)

    norm_nn = jnp.linalg.norm(nn_grad, axis=-1)
    norm_gt = jnp.linalg.norm(target_grad, axis=-1)
    mask_unsat = norm_gt > 0
    cosang = jnp.sum(nn_grad * target_grad, axis=-1) / (norm_nn + 1e-6)
    ang = jnp.arccos(jnp.clip(cosang, -1.0, 1.0))
    loss_gradient_dir = jnp.rad2deg(
        jnp.sum(jnp.where(mask_unsat, ang, 0.0)) / jnp.maximum(jnp.sum(mask_unsat), 1)
    )

    loss_eikonal = jnp.mean((norm_nn - norm_gt) ** 2)
    return loss_regression, loss_gradient_mse, loss_gradient_dir, loss_eikonal
