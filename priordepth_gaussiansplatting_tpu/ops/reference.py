"""Oracle rasterizer: slow, obviously-correct, pure-jnp, differentiable.

Replicates the reference CUDA rasterizer's compositing semantics
(diff-gaussian-rasterization `dr_aa`, see SURVEY.md §2.9.1) per pixel over ALL
Gaussians, so it can serve as the golden model for the Pallas tile kernels and
for finite-difference gradient checks. Differentiable by plain autodiff.

Semantics replicated exactly:
  * global front-to-back order by camera-space depth
  * a Gaussian touches a pixel iff the pixel's 16x16 tile intersects the
    Gaussian's radius bounding square (CUDA tile binning), not a per-pixel
    radius test
  * alpha = min(0.99, opacity * exp(power)), skipped if power > 0 or
    alpha < 1/255
  * early stop BEFORE accumulating the Gaussian that would push the
    transmittance below 1e-4
  * output = C + T_final * bg; also expected inverse depth and T_final.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .projection import TILE, ProjectedGaussians, tile_rect

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4


def _composite_pixels(px, py, mean2d, conic, opacity, rgb, invdepth,
                      txmin, tymin, txmax, tymax):
    """Composite a chunk of pixels against all (depth-sorted) Gaussians.

    px, py: (P,) pixel coordinates. Gaussian arrays are (N, ...), already
    sorted front-to-back. Returns (P, 3) color, (P,) invdepth, (P,) final T,
    (P,) n_contrib.
    """
    tx = (px // TILE).astype(jnp.int32)
    ty = (py // TILE).astype(jnp.int32)
    # (P, N) tile-overlap mask — the binning-stage visibility.
    in_rect = (
        (tx[:, None] >= txmin[None, :]) & (tx[:, None] < txmax[None, :])
        & (ty[:, None] >= tymin[None, :]) & (ty[:, None] < tymax[None, :])
    )
    dx = px[:, None] - mean2d[None, :, 0]
    dy = py[:, None] - mean2d[None, :, 1]
    power = -0.5 * (conic[None, :, 0] * dx * dx + conic[None, :, 2] * dy * dy) \
        - conic[None, :, 1] * dx * dy
    alpha = jnp.minimum(ALPHA_MAX, opacity[None, :] * jnp.exp(power))
    keep = in_rect & (power <= 0.0) & (alpha >= ALPHA_MIN)
    a = jnp.where(keep, alpha, 0.0)
    # Inclusive transmittance after each Gaussian; stop is a prefix property.
    cum = jnp.cumprod(1.0 - a, axis=1)
    live = cum >= T_EPS  # Gaussian i contributes iff T_incl(i) stays above eps
    t_excl = jnp.concatenate(
        [jnp.ones_like(cum[:, :1]), cum[:, :-1]], axis=1)
    w = jnp.where(live, a * t_excl, 0.0)  # (P, N) compositing weights
    # HIGHEST: the golden model must not inherit the TPU MXU's DEFAULT
    # bf16 operand truncation (~0.4% colour error on-chip; CPU is f32
    # either way).
    hi = jax.lax.Precision.HIGHEST
    color = jnp.matmul(w, rgb, precision=hi)  # (P, 3)
    inv_d = jnp.matmul(w, invdepth, precision=hi)
    final_t = jnp.prod(jnp.where(live, 1.0 - a, 1.0), axis=1)
    n_contrib = jnp.sum((w > 0.0).astype(jnp.int32), axis=1)
    return color, inv_d, final_t, n_contrib


@partial(jax.jit, static_argnames=("width", "height", "pixel_chunk"))
def rasterize_reference(proj: ProjectedGaussians, bg: jnp.ndarray,
                        width: int, height: int, pixel_chunk: int = 4096):
    """Render (3, H, W) image + (1, H, W) inverse depth from projected Gaussians.

    Returns dict(render, invdepth, final_T, n_contrib, order) where `order` is
    the global depth sort permutation (useful to the tests).
    """
    order = jnp.argsort(proj.depth)
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    opacity = proj.opacity[order]
    rgb = proj.rgb[order]
    invdepth = proj.invdepth[order]
    radius = proj.radius[order]
    txmin, tymin, txmax, tymax = tile_rect(mean2d, radius, width, height)

    npix = height * width
    ys = (jnp.arange(npix) // width).astype(jnp.float32)
    xs = (jnp.arange(npix) % width).astype(jnp.float32)
    nchunk = -(-npix // pixel_chunk)
    pad = nchunk * pixel_chunk - npix
    xs = jnp.pad(xs, (0, pad)).reshape(nchunk, pixel_chunk)
    ys = jnp.pad(ys, (0, pad)).reshape(nchunk, pixel_chunk)

    # Rematerialise per pixel-chunk under autodiff: the (pixels, N)
    # intermediates (masks, alphas, cumulative transmittance) otherwise
    # stack up as scan residuals — ~npix*N*4 bytes PER residual, an HBM
    # OOM for the golden-model grad checks at realistic sizes.
    @jax.checkpoint
    def body(xy):
        return _composite_pixels(xy[0], xy[1], mean2d, conic, opacity, rgb,
                                 invdepth, txmin, tymin, txmax, tymax)

    color, inv_d, final_t, n_contrib = jax.lax.map(body, (xs, ys))
    color = color.reshape(-1, 3)[:npix]
    inv_d = inv_d.reshape(-1)[:npix]
    final_t = final_t.reshape(-1)[:npix]
    n_contrib = n_contrib.reshape(-1)[:npix]

    image = color.T.reshape(3, height, width) \
        + final_t.reshape(1, height, width) * bg[:, None, None]
    return {
        "render": image,
        "invdepth": inv_d.reshape(1, height, width),
        "final_T": final_t.reshape(height, width),
        "n_contrib": n_contrib.reshape(height, width),
        "order": order,
    }
