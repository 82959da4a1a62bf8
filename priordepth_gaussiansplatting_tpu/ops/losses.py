"""Training losses (reference `utils/loss_utils.py`, `train.py:152-182`)."""

from __future__ import annotations

import jax.numpy as jnp

from .ssim import ssim  # noqa: F401  (re-export)


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - target) ** 2)


def photometric_loss(pred: jnp.ndarray, target: jnp.ndarray,
                     lambda_dssim: float = 0.2) -> jnp.ndarray:
    """(1−λ)·L1 + λ·(1−SSIM) — the reference composite (`train.py:154-160`)."""
    return ((1.0 - lambda_dssim) * l1_loss(pred, target)
            + lambda_dssim * (1.0 - ssim(pred, target)))


def depth_l1_loss(rendered_invdepth: jnp.ndarray, mono_invdepth: jnp.ndarray,
                  depth_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean |render_inv − mono_inv| (`train.py:164-182` semantics:
    the mask is the per-pixel reliability/alpha mask; mean over ALL pixels,
    matching the reference's `(err * mask).mean()`)."""
    err = jnp.abs(rendered_invdepth - mono_invdepth) * depth_mask
    return jnp.mean(err)


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """20·log10(1/√mse), per the reference `utils/image_utils.py:14-19`."""
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
