"""Evaluation metrics: PSNR/SSIM re-exported; LPIPS implemented in JAX.

LPIPS (reference `lpipsPyTorch/` — VGG16 features + learned linear heads) is
implemented here as pure-jnp convolutions. The learned weights cannot be
bundled (zero-egress environment, no torchvision); provide them via the
`PDGS_LPIPS_WEIGHTS` env var pointing to either
  * a `.npz` with arrays `features.<i>.weight/bias` (torchvision VGG16
    convention) and `lin<k>.model.1.weight` linear heads, or
  * a torch `.pth` state dict of the reference `lpipsPyTorch` module.
Without weights, `have_lpips()` is False and metrics report -1 for LPIPS
(the reference errors instead; we degrade gracefully).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv layout: (out_ch, layers before each pool); LPIPS taps the relu
# after each block's last conv: indices in torchvision features module.
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512, "M"]
_TAP_AFTER = {3, 8, 15, 22, 29}  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

# ImageNet normalisation (shift/scale of the reference ScalingLayer).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _weights_path():
    return os.environ.get("PDGS_LPIPS_WEIGHTS", "")


@functools.lru_cache(maxsize=1)
def _load_weights():
    path = _weights_path()
    if not path or not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        raw = dict(np.load(path))
    else:
        import torch  # noqa: PLC0415 — cpu torch is available in the image
        sd = torch.load(path, map_location="cpu")
        raw = {k: v.numpy() for k, v in sd.items()}
    convs, lins = [], []
    for key in sorted((k for k in raw if k.endswith(".weight")
                       and "features" in k),
                      key=lambda s: int(s.split(".")[-2])):
        idx = key.rsplit(".", 2)[0]
        convs.append((raw[key], raw[key.replace("weight", "bias")]))
        del idx
    for k in range(5):
        for cand in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if cand in raw:
                lins.append(raw[cand])
                break
    if len(lins) != 5:
        return None
    return convs, lins


def have_lpips() -> bool:
    return _load_weights() is not None


def _vgg_features(x, convs):
    """x: (1, 3, H, W) normalised. Returns the 5 tap activations."""
    taps = []
    ci = 0
    layer_idx = 0
    h = x
    for item in _VGG_CFG:
        if item == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
            layer_idx += 1
        else:
            w, b = convs[ci]
            ci += 1
            h = jax.lax.conv_general_dilated(
                h, jnp.asarray(w), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            h = h + jnp.asarray(b)[None, :, None, None]
            layer_idx += 1
            h = jax.nn.relu(h)
            if layer_idx in _TAP_AFTER:
                taps.append(h)
            layer_idx += 1
    return taps


def compute_lpips(img1: jnp.ndarray, img2: jnp.ndarray) -> float:
    """LPIPS(VGG) over (3, H, W) images in [0, 1]. Requires weights."""
    weights = _load_weights()
    if weights is None:
        return -1.0
    convs, lins = weights
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def norm_input(x):
        return ((2.0 * x - 1.0)[None] - shift) / scale

    t1 = _vgg_features(norm_input(img1), convs)
    t2 = _vgg_features(norm_input(img2), convs)
    total = 0.0
    for f1, f2, lin in zip(t1, t2, lins):
        n1 = f1 / jnp.sqrt(jnp.sum(f1 ** 2, 1, keepdims=True) + 1e-10)
        n2 = f2 / jnp.sqrt(jnp.sum(f2 ** 2, 1, keepdims=True) + 1e-10)
        diff = (n1 - n2) ** 2
        w = jnp.asarray(lin).reshape(1, -1, 1, 1)
        total = total + jnp.mean(jnp.sum(diff * w, axis=1))
    return float(total)
