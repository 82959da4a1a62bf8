"""Depth-training losses (reference `zoedepth/trainers/loss.py`).

All functions take (pred, target, mask) with shapes (..., H, W) and return a
scalar. `compute_scale_and_shift` is the closed-form least-squares used by
the scale-invariant loss and by the depth-prior alignment tooling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silog_loss(pred: jnp.ndarray, target: jnp.ndarray,
               mask: jnp.ndarray | None = None, beta: float = 0.15,
               eps: float = 1e-6) -> jnp.ndarray:
    """Scale-invariant log loss: 10·sqrt(var(g) + β·mean(g)²), g = log ratio
    (`loss.py:42-93`)."""
    if mask is None:
        mask = jnp.ones_like(pred, dtype=bool)
    g = jnp.log(jnp.maximum(pred, eps)) - jnp.log(jnp.maximum(target, eps))
    n = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(jnp.where(mask, g, 0.0)) / n
    var = jnp.sum(jnp.where(mask, (g - mean) ** 2, 0.0)) / n
    return 10.0 * jnp.sqrt(var + beta * mean * mean)


def grad_l1_loss(pred: jnp.ndarray, target: jnp.ndarray,
                 mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """L1 on x/y image gradients of the depth map (`loss.py:110-134`)."""
    if mask is None:
        mask = jnp.ones_like(pred, dtype=bool)

    def grads(x):
        gy = x[..., 1:, :] - x[..., :-1, :]
        gx = x[..., :, 1:] - x[..., :, :-1]
        return gx, gy

    px, py = grads(pred)
    tx, ty = grads(target)
    mx = mask[..., :, 1:] & mask[..., :, :-1]
    my = mask[..., 1:, :] & mask[..., :-1, :]
    nx = jnp.maximum(jnp.sum(mx), 1.0)
    ny = jnp.maximum(jnp.sum(my), 1.0)
    return (jnp.sum(jnp.where(mx, jnp.abs(px - tx), 0.0)) / nx
            + jnp.sum(jnp.where(my, jnp.abs(py - ty), 0.0)) / ny)


def compute_scale_and_shift(prediction: jnp.ndarray, target: jnp.ndarray,
                            mask: jnp.ndarray):
    """Closed-form (s, t) minimising ‖s·pred + t − target‖² over the mask,
    batched over leading dims (`loss.py:259-283`)."""
    m = mask.astype(prediction.dtype)
    axes = tuple(range(prediction.ndim - 2, prediction.ndim))
    a00 = jnp.sum(m * prediction * prediction, axis=axes)
    a01 = jnp.sum(m * prediction, axis=axes)
    a11 = jnp.sum(m, axis=axes)
    b0 = jnp.sum(m * prediction * target, axis=axes)
    b1 = jnp.sum(m * target, axis=axes)
    det = a00 * a11 - a01 * a01
    ok = det > 0
    scale = jnp.where(ok, (a11 * b0 - a01 * b1) / jnp.where(ok, det, 1.0),
                      0.0)
    shift = jnp.where(ok, (-a01 * b0 + a00 * b1) / jnp.where(ok, det, 1.0),
                      0.0)
    return scale, shift


def scale_and_shift_invariant_loss(pred: jnp.ndarray, target: jnp.ndarray,
                                   mask: jnp.ndarray | None = None
                                   ) -> jnp.ndarray:
    """MiDaS-style SSI loss (`loss.py:286-305`)."""
    if mask is None:
        mask = jnp.ones_like(pred, dtype=bool)
    s, t = compute_scale_and_shift(pred, target, mask)
    s = s[..., None, None]
    t = t[..., None, None]
    res = (s * pred + t - target) ** 2
    n = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(jnp.where(mask, res, 0.0)) / n


def ordinal_regression_loss(probs: jnp.ndarray, target: jnp.ndarray,
                            t_min: float, t_max: float,
                            eps: float = 1e-6) -> jnp.ndarray:
    """SID ordinal regression over (B, K, H, W) per-bin probabilities
    (`loss.py:137-180` semantics)."""
    k = probs.shape[1]
    # Ordinal label: number of SID thresholds below the target depth.
    ratio = jnp.log(jnp.maximum(target, eps) / t_min) \
        / jnp.log(t_max / t_min)
    label = jnp.clip((ratio * k).astype(jnp.int32), 0, k)
    ks = jnp.arange(k).reshape(1, k, 1, 1)
    below = ks < label[:, None, :, :]
    p = jnp.clip(probs, eps, 1.0 - eps)
    ll = jnp.where(below, jnp.log(p), jnp.log(1.0 - p))
    return -jnp.mean(jnp.sum(ll, axis=1))


def discrete_nll_loss(log_probs: jnp.ndarray, target: jnp.ndarray,
                      t_min: float, t_max: float,
                      eps: float = 1e-6) -> jnp.ndarray:
    """Cross-entropy against SID-discretised depth (`loss.py:183-254`)."""
    k = log_probs.shape[1]
    ratio = jnp.log(jnp.maximum(target, eps) / t_min) \
        / jnp.log(t_max / t_min)
    label = jnp.clip((ratio * k).astype(jnp.int32), 0, k - 1)
    picked = jnp.take_along_axis(log_probs, label[:, None, :, :], axis=1)
    return -jnp.mean(picked)
