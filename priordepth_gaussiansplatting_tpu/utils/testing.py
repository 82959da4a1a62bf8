"""Synthetic-scene builders shared by tests and benchmarks.

Implements the SURVEY.md §4 plan: a tiny random-Gaussian scene rendered by both
the oracle jnp rasterizer and the Pallas kernels, plus simple look-at cameras.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import cameras as camlib
from ..core import sh as shlib


def look_at_camera(eye, target=(0.0, 0.0, 0.0), up=(0.0, -1.0, 0.0),
                   fovx=math.radians(60), width=256, height=256,
                   **kw) -> camlib.Camera:
    """Camera at `eye` looking at `target` (COLMAP-style: +z forward, +y down)."""
    eye = np.asarray(eye, dtype=np.float64)
    fwd = np.asarray(target, dtype=np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up, dtype=np.float64)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    # R columns are camera axes in world coords = camera-to-world rotation.
    R = np.stack([right, down, fwd], axis=1)
    t = -R.T @ eye  # world-to-camera translation
    focal = width / (2.0 * math.tan(fovx / 2.0))
    fovy = 2.0 * math.atan(height / (2.0 * focal))
    return camlib.make_camera(R, t, fovx, fovy, width, height, **kw)


def random_gaussians(key, n: int, sh_degree: int = 3, extent: float = 1.0,
                     scale_range=(0.02, 0.1), opacity_range=(0.3, 0.95)):
    """World-space Gaussian parameter dict (post-activation values)."""
    ks = jax.random.split(key, 5)
    k_bases = shlib.num_sh_bases(sh_degree)
    means = jax.random.uniform(ks[0], (n, 3), minval=-extent, maxval=extent)
    scales = jax.random.uniform(ks[1], (n, 3), minval=scale_range[0],
                                maxval=scale_range[1])
    quats = jax.random.normal(ks[2], (n, 4))
    opac = jax.random.uniform(ks[3], (n,), minval=opacity_range[0],
                              maxval=opacity_range[1])
    # FLAT channel-minor SH layout (column 3k+c), as the model store uses —
    # (N, K, 3) arrays pad their 3-lane minor dim 42x on TPU.
    sh = 0.3 * jax.random.normal(ks[4], (n, k_bases * 3))
    sh = sh.at[:, :3].set(shlib.rgb_to_sh(
        jax.random.uniform(jax.random.fold_in(key, 9), (n, 3),
                           minval=0.05, maxval=0.95)))
    return dict(means=means, scales=scales, quats=quats, opacities=opac, sh=sh)
