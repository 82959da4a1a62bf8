"""SSIM — XLA-fused separable-convolution implementation.

TPU-native replacement for BOTH reference SSIM paths (SURVEY.md §2.5):
the pure-torch `utils/loss_utils.py:46-86` and the CUDA `fused-ssim`
submodule. Constants match: 11×11 Gaussian window σ=1.5, C1=0.01², C2=0.03²,
zero-padded "same" convolution. The separable 1×11/11×1 depthwise convs fuse
into two passes over the image; autodiff supplies the backward (the CUDA
"fused" backward exists only because torch couldn't fuse — XLA can).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .projection import round_bf16

C1 = 0.01 ** 2
C2 = 0.03 ** 2


def gaussian_window(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _conv_2limb(x: jnp.ndarray, k: jnp.ndarray, pads, dn, groups: int
                ) -> jnp.ndarray:
    """f32-accurate depthwise conv from three DEFAULT (bf16-operand) passes.

    Full f32 precision is REQUIRED here, not optional: on TPU the MXU
    truncates conv operands to bf16 at DEFAULT precision, which puts
    ~2^-8-relative error on blur(x^2) — and sigma^2 = blur(x^2) - mu^2
    then goes negative by up to ~5e-3, crossing the C2=9e-4 stabiliser so
    the SSIM denominator flips sign and the map blows up to +/-inf on real
    frames (the torch reference computes these convs in f32).

    HIGHEST restores f32 but costs six MXU passes. Splitting BOTH operands
    into bf16 hi/lo limbs and summing the three significant cross terms
    (hi·hi + hi·lo + lo·hi; the dropped lo·lo term is ~2^-16 relative,
    ~60× inside C2 after the sigma cancellation) is exact to ~1e-5 at half
    HIGHEST's cost — the conv analog of rasterize_pallas._dot2."""
    conv = lambda a, b: jax.lax.conv_general_dilated(
        a, b, (1, 1), pads, dimension_numbers=dn,
        feature_group_count=groups)
    x_hi = round_bf16(x)
    x_lo = x - x_hi
    k_hi = round_bf16(k)
    k_lo = k - k_hi
    return conv(x_hi, k_hi) + conv(x_hi, k_lo) + conv(x_lo, k_hi)


def _blur(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable same-padded Gaussian blur (2-limb f32 convs).
    x: (C, H, W)."""
    c = x.shape[0]
    w = window.shape[0]
    x = x[None]  # (1, C, H, W)
    kh = jnp.tile(window.reshape(1, 1, w, 1), (c, 1, 1, 1))
    kw = jnp.tile(window.reshape(1, 1, 1, w), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NCHW", "OIHW", "NCHW"))
    pad = w // 2
    x = _conv_2limb(x, kh, [(pad, pad), (0, 0)], dn, c)
    x = _conv_2limb(x, kw, [(0, 0), (pad, pad)], dn, c)
    return x[0]


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray,
             window_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM map (C, H, W) with zero-padded same convolution.

    Because the padding is zeros, computing the map on a zero-padded canvas
    and masking to the true image region reproduces the native-resolution
    result bit-for-bit — the basis of mixed-resolution DP batching."""
    window = jnp.asarray(gaussian_window(window_size))
    mu1 = _blur(img1, window)
    mu2 = _blur(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur(img1 * img1, window) - mu1_sq
    sigma2_sq = _blur(img2 * img2, window) - mu2_sq
    sigma12 = _blur(img1 * img2, window) - mu1_mu2
    return ((2.0 * mu1_mu2 + C1) * (2.0 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))


@partial(jax.jit, static_argnames=("window_size",))
def ssim(img1: jnp.ndarray, img2: jnp.ndarray,
         window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over a (C, H, W) image pair in [0, 1]."""
    return jnp.mean(ssim_map(img1, img2, window_size))
