"""Depth inference with the reference's test-time augmentation chain
(`zoedepth/models/depth_model.py:35-151`): reflect-pad augmentation +
horizontal-flip averaging, PIL in / 16-bit inverse-depth PNG out — the
producer of the depth priors the splatting trainer consumes
(README.md:61-75 DepthAnythingV2 recipe)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image


def infer_with_tta(apply_fn, params, image: jnp.ndarray,
                   pad_frac: float = 0.03, with_flip: bool = True,
                   multiple_of: int = 32) -> jnp.ndarray:
    """image: (B, H, W, 3) in [0,1] -> (B, H, W) metric depth."""
    b, h, w, _ = image.shape
    ph = max(int(np.sqrt(h / 2) * pad_frac * h), multiple_of)
    pw = max(int(np.sqrt(w / 2) * pad_frac * w), multiple_of)
    # round padded size up to a multiple (ViT patching)
    th = (-(-(h + 2 * ph) // multiple_of)) * multiple_of
    tw = (-(-(w + 2 * pw) // multiple_of)) * multiple_of
    eh, ew = th - h - 2 * ph, tw - w - 2 * pw
    padded = jnp.pad(image, ((0, 0), (ph, ph + eh), (pw, pw + ew), (0, 0)),
                     mode="reflect")

    def run(x):
        return apply_fn(params, x)["metric_depth"]

    depth = run(padded)
    if with_flip:
        flipped = run(padded[:, :, ::-1, :])
        depth = 0.5 * (depth + flipped[:, :, ::-1])
    return depth[:, ph:ph + h, pw:pw + w]


def infer_pil(apply_fn, params, pil_image: Image.Image,
              **kw) -> np.ndarray:
    arr = np.asarray(pil_image.convert("RGB"), np.float32) / 255.0
    depth = infer_with_tta(apply_fn, params, jnp.asarray(arr)[None], **kw)
    return np.asarray(depth[0])


def save_invdepth_png(path: str, depth: np.ndarray,
                      eps: float = 1e-6) -> None:
    """16-bit inverse-depth PNG, the format the splatting data loader and
    depth-scale tool consume (`utils/camera_utils.py:26-28`)."""
    inv = 1.0 / np.maximum(depth, eps)
    inv = inv / max(inv.max(), eps)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray((inv * 65535.0).astype(np.uint16)).save(path)


def generate_depth_priors(apply_fn, params, images_dir: str,
                          out_dir: str) -> list:
    """DepthAnythingV2-run.py-equivalent batch job: images/ -> 16-bit
    inverse-depth PNGs named like the inputs (`train_image.py:15`)."""
    written = []
    for name in sorted(os.listdir(images_dir)):
        stem, ext = os.path.splitext(name)
        if ext.lower() not in (".png", ".jpg", ".jpeg"):
            continue
        with Image.open(os.path.join(images_dir, name)) as im:
            depth = infer_pil(apply_fn, params, im)
        out = os.path.join(out_dir, stem + ".png")
        save_invdepth_png(out, depth)
        written.append(out)
    return written
