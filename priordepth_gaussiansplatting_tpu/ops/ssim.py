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


def _band_matrix(n: int, window: np.ndarray) -> jnp.ndarray:
    """(n, n) banded blur operator: B[i, j] = window[j - i + pad] inside
    the band, 0 outside — zero-padded "same" convolution as a matmul.
    Built from iotas (no multi-MB embedded constants at eval sizes)."""
    pad = len(window) // 2
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    d = j - i + pad
    acc = jnp.zeros((n, n), jnp.float32)
    for t, wt in enumerate(window):
        acc = acc + jnp.where(d == t, jnp.float32(wt), 0.0)
    return acc


def _split(a):
    hi = round_bf16(a)
    return hi, a - hi


def _blur(x: jnp.ndarray, window: np.ndarray) -> jnp.ndarray:
    """Separable same-padded Gaussian blur as two banded MXU matmuls.
    x: (C, H, W).

    XLA lowers small-tap depthwise convs terribly on TPU (im2col-style:
    the 5 SSIM blurs at 1024² cost ~35 ms/step — trainstage_probe r05,
    a third of the whole train step). The same blur as (H, H) and (W, W)
    banded matmuls is ~100× more FLOPs but they are MXU FLOPs: ~2 ms.

    Full f32 accuracy is REQUIRED (not optional): the MXU truncates f32
    operands to bf16 at DEFAULT precision, which puts ~2^-8-relative error
    on blur(x²) — and sigma² = blur(x²) − mu² then goes negative past the
    C2 = 9e-4 stabiliser, flipping the SSIM denominator sign to ±inf on
    real frames (the torch reference computes these in f32). Each matmul
    therefore runs as three DEFAULT passes over exact bf16 hi/lo limb
    splits of BOTH operands (hi·hi + hi·lo + lo·hi; the dropped lo·lo is
    ~2^-16 relative) — the blur analog of rasterize_pallas._dot2."""
    h, w = x.shape[1], x.shape[2]
    bh_hi, bh_lo = _split(_band_matrix(h, window))
    bw_hi, bw_lo = _split(_band_matrix(w, window))

    def mm3(a, b, dims):
        a_hi, a_lo = _split(a)
        b_hi, b_lo = b
        d = lambda p, q: jax.lax.dot_general(
            p, q, dims, preferred_element_type=jnp.float32)
        return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)

    # W pass: (C, H, W) x (V, W) -> (C, H, V)
    y = mm3(x, (bw_hi, bw_lo), (((2,), (1,)), ((), ())))
    # H pass: (C, H, V) x (G, H) -> (C, V, G) -> (C, G, V)
    z = mm3(y, (bh_hi, bh_lo), (((1,), (1,)), ((), ())))
    return z.transpose(0, 2, 1)


def ssim_map(img1: jnp.ndarray, img2: jnp.ndarray,
             window_size: int = 11) -> jnp.ndarray:
    """Per-pixel SSIM map (C, H, W) with zero-padded same convolution.

    Because the padding is zeros, computing the map on a zero-padded canvas
    and masking to the true image region reproduces the native-resolution
    result bit-for-bit — the basis of mixed-resolution DP batching."""
    window = gaussian_window(window_size)
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
