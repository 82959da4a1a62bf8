"""Per-Gaussian preprocessing: frustum cull, EWA 3D->2D covariance projection,
conic/radius computation, SH colour, inverse depth.

This is the "preprocess" stage of the reference CUDA rasterizer
(diff-gaussian-rasterization branch `dr_aa`, called via
`gaussian_renderer/__init__.py:90-112`), re-derived as batched jnp. It is pure
elementwise + 3x3 matmul work over N Gaussians — exactly what XLA vectorises
onto the VPU/MXU and fuses; a hand-written kernel adds nothing here. The hot,
irregular part (tile binning + ordered compositing) lives in the Pallas path.

Numerical contract (for allclose parity with the CUDA renderer):
  * cull when camera-space z <= 0.2
  * J uses t.x/t.y clamped to ±1.3·tan(fov/2)·z
  * 2D covariance dilated by +0.3 on the diagonal
  * antialiasing ON: opacity scaled by sqrt(max(2.5e-5, det(Σ2d)/det(Σ2d+0.3I)))
  * radius = ceil(3·sqrt(λ_max)) with λ via mid ± sqrt(max(0.1, mid²−det))
  * pixel coords: ndc2Pix(v, S) = ((v+1)·S − 1)/2
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import sh as shlib

# CUDA-parity constants.
FRUSTUM_NEAR_Z = 0.2
DILATION = 0.3
AA_DET_FLOOR = 2.5e-5
LAMBDA_FLOOR = 0.1
TILE = 16  # BLOCK_X = BLOCK_Y = 16 in the reference rasterizer


@jax.custom_jvp
def round_bf16(x):
    """Round f32 to the nearest bf16-representable value (RTNE), staying
    f32 — via explicit bit arithmetic. The idiomatic double-cast
    `x.astype(bf16).astype(f32)` is ELIDED by the current XLA:TPU runtime
    (convert-pair folding returns x bit-exactly — observed 2026-08), which
    silently disables every rounding/limb-split site built on it. Integer
    bit ops survive both XLA and Mosaic lowering unchanged. Matches the
    double-cast (RTNE) bit-for-bit on finite values. NaN/Inf inputs are
    passed through unchanged (the +0x7FFF carry would otherwise walk a
    NaN payload into the exponent and emit Inf, masking upstream
    divergence from `--detect_anomaly`).

    STRAIGHT-THROUGH GRADIENT (custom_jvp, derivative 1): the bitcast
    chain's autodiff gradient is ZERO, which the double-cast's was not —
    without this rule every parameter gradient through
    `project_gaussians(round_bf16=True)` vanishes and training silently
    stops (the round-4 flat-loss regression)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    rounded = u + jnp.uint32(0x7FFF) + ((u >> 16) & jnp.uint32(1))
    nonfinite = (u & jnp.uint32(0x7F800000)) == jnp.uint32(0x7F800000)
    return jax.lax.bitcast_convert_type(
        jnp.where(nonfinite, u, rounded & jnp.uint32(0xFFFF0000)),
        jnp.float32)


@round_bf16.defjvp
def _round_bf16_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    return round_bf16(x), dx


_round_bf16_fn = round_bf16


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProjectedGaussians:
    """Screen-space Gaussians ready for binning/compositing. All (N, ...)."""

    mean2d: jnp.ndarray    # (N, 2) pixel coordinates
    conic: jnp.ndarray     # (N, 3) inverse 2D covariance (a, b, c): ax²+2bxy+cy²
    opacity: jnp.ndarray   # (N,) post-activation, AA-rescaled
    rgb: jnp.ndarray       # (N, 3)
    depth: jnp.ndarray     # (N,) camera-space z (sort key)
    invdepth: jnp.ndarray  # (N,) 1/z
    radius: jnp.ndarray    # (N,) int32 screen radius in pixels; 0 = culled


def compute_cov2d(mean3d, cov3d, viewmatrix, focal_x, focal_y,
                  tan_fovx, tan_fovy):
    """EWA splatting: Σ2d = J W Σ Wᵀ Jᵀ (+ dilation added by caller).

    Args:
      mean3d: (N, 3) world positions.
      cov3d: (N, 3, 3) world-space covariance.
      viewmatrix: (4, 4) world->camera, column-vector convention.
    Returns:
      (N, 2, 2) un-dilated 2D covariance, (N, 3) camera-space position.
    """
    W = viewmatrix[:3, :3]
    # HIGHEST precision on every geometry matmul: the MXU truncates f32
    # operands to bf16 at DEFAULT, which costs ~2^-8 RELATIVE error on
    # world positions — several PIXELS of mean2d error at x~1600, and
    # run-to-run depth-order flips between differently-fused graphs.
    hi = jax.lax.Precision.HIGHEST
    t = jnp.matmul(mean3d, W.T, precision=hi) + viewmatrix[:3, 3]
    tz = t[:, 2]
    # Clamp the x/y extent used for the Jacobian to the (widened) frustum.
    limx = 1.3 * tan_fovx
    limy = 1.3 * tan_fovy
    txz = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    tyz = jnp.clip(t[:, 1] / tz, -limy, limy) * tz
    inv_z = 1.0 / tz
    inv_z2 = inv_z * inv_z
    # J rows (N, 3) expanded elementwise — batched (N,2,3)@(N,3,3) tiny
    # matmuls lower poorly on TPU; everything below is pure VPU columns.
    j0 = jnp.stack([focal_x * inv_z, jnp.zeros_like(tz),
                    -focal_x * txz * inv_z2], axis=-1)
    j1 = jnp.stack([jnp.zeros_like(tz), focal_y * inv_z,
                    -focal_y * tyz * inv_z2], axis=-1)
    t0 = jnp.matmul(j0, W, precision=hi)  # (N, 3) x constant 3x3
    t1 = jnp.matmul(j1, W, precision=hi)
    # cov2d_ab = t_a · Σ · t_b expanded over the 6 unique Σ entries.
    s00 = cov3d[:, 0, 0]
    s01 = cov3d[:, 0, 1]
    s02 = cov3d[:, 0, 2]
    s11 = cov3d[:, 1, 1]
    s12 = cov3d[:, 1, 2]
    s22 = cov3d[:, 2, 2]

    def quad(a, b):
        return (a[:, 0] * b[:, 0] * s00 + a[:, 1] * b[:, 1] * s11
                + a[:, 2] * b[:, 2] * s22
                + (a[:, 0] * b[:, 1] + a[:, 1] * b[:, 0]) * s01
                + (a[:, 0] * b[:, 2] + a[:, 2] * b[:, 0]) * s02
                + (a[:, 1] * b[:, 2] + a[:, 2] * b[:, 1]) * s12)

    c00 = quad(t0, t0)
    c01 = quad(t0, t1)
    c11 = quad(t1, t1)
    cov2d = jnp.stack(
        [jnp.stack([c00, c01], axis=-1), jnp.stack([c01, c11], axis=-1)],
        axis=-2)
    return cov2d, t


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacity: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    sh_degree: int,
    viewmatrix: jnp.ndarray,
    full_proj: jnp.ndarray,
    cam_center: jnp.ndarray,
    width: int,
    height: int,
    tan_fovx: float,
    tan_fovy: float,
    antialiasing: bool = False,
    valid_mask: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    map_width=None,
    map_height=None,
    round_bf16: bool = True,
) -> ProjectedGaussians:
    """Full preprocess. Culled/padded Gaussians get radius 0 and opacity 0.

    `valid_mask` marks live rows of the fixed-capacity Gaussian store; padded
    rows are culled unconditionally.

    `map_width`/`map_height` (optionally TRACED scalars) override the pixel
    mapping and focal lengths when rendering a camera zero-padded onto a
    larger static canvas (mixed-resolution DP): `width`/`height` stay the
    static canvas dims used by the tile grid. `tan_fovx`/`tan_fovy` may also
    be traced scalars.
    """
    n = means3d.shape[0]
    mw = width if map_width is None else map_width
    mh = height if map_height is None else map_height
    focal_x = mw / (2.0 * tan_fovx)
    focal_y = mh / (2.0 * tan_fovy)

    # Homogeneous projection -> NDC -> pixels. HIGHEST: bf16-truncated
    # position matmuls put ~2^-8-relative error on pixel coordinates
    # (several px at 1600 wide) — see compute_cov2d note.
    hi = jax.lax.Precision.HIGHEST
    hom = (jnp.matmul(means3d, full_proj[:3, :3].T, precision=hi)
           + full_proj[:3, 3])
    w = jnp.matmul(means3d, full_proj[3, :3], precision=hi) + full_proj[3, 3]
    inv_w = 1.0 / (w + 1e-7)
    ndc = hom * inv_w[:, None]
    mean2d = jnp.stack(
        [((ndc[:, 0] + 1.0) * mw - 1.0) * 0.5,
         ((ndc[:, 1] + 1.0) * mh - 1.0) * 0.5],
        axis=-1,
    )

    cov2d, t = compute_cov2d(means3d, cov3d, viewmatrix, focal_x, focal_y,
                             tan_fovx, tan_fovy)
    det_raw = (cov2d[:, 0, 0] * cov2d[:, 1, 1]
               - cov2d[:, 0, 1] * cov2d[:, 1, 0])
    cxx = cov2d[:, 0, 0] + DILATION
    cyy = cov2d[:, 1, 1] + DILATION
    cxy = cov2d[:, 0, 1]
    det = cxx * cyy - cxy * cxy
    det_inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)

    mid = 0.5 * (cxx + cyy)
    lam = mid + jnp.sqrt(jnp.maximum(LAMBDA_FLOOR, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lam))

    cull = t[:, 2] <= FRUSTUM_NEAR_Z
    cull |= det == 0.0
    if valid_mask is not None:
        cull |= ~valid_mask
    radius = jnp.where(cull, 0, radius).astype(jnp.int32)

    op = opacity
    if antialiasing:
        aa = jnp.sqrt(jnp.maximum(AA_DET_FLOOR, det_raw * det_inv))
        op = op * aa
    op = jnp.where(cull, 0.0, op)

    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        dirs = means3d - cam_center[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        rgb = shlib.sh_to_color(sh_degree, sh_coeffs, dirs)

    depth = jnp.where(cull, jnp.inf, t[:, 2])
    invdepth = jnp.where(cull, 0.0, 1.0 / jnp.maximum(t[:, 2], 1e-6))
    del n
    # Spec: conic/opacity/colour/invdepth are bf16-valued (kept in f32
    # containers). Both compositing paths (jnp oracle and Pallas) consume
    # these rounded values, so parity between them is exact, while the
    # Pallas pair pipeline can bit-pack two attributes per f32 sort payload
    # lane — the tile-key sort is the single most expensive stage and its
    # cost is linear in payload rows. Quality impact is below output
    # quantisation (bf16 rel. step 2^-8 ~ half an 8-bit LSB on colour);
    # mean2d stays full f32 (a bf16 pixel coordinate at x~1600 would be
    # ~6 px off). The rounding VJP is a cast round-trip (identity up to
    # the same rounding of the cotangent). `round_bf16=False` keeps full
    # f32 attributes (finite-difference gradient checks need a smooth
    # function; the rounding staircase breaks FD at small epsilons).
    if round_bf16:
        bf16r = _round_bf16_fn  # module fn; the bool arg shadows the name
    else:
        bf16r = lambda x: x
    return ProjectedGaussians(
        mean2d=mean2d, conic=bf16r(conic), opacity=bf16r(op), rgb=bf16r(rgb),
        depth=depth, invdepth=bf16r(invdepth), radius=radius,
    )


def tile_rect_tight(proj: "ProjectedGaussians", width: int, height: int):
    """Exact axis-aligned tile rect of the alpha >= 1/255 level set.

    The compositor (Pallas kernel and jnp oracle alike) skips every
    (pixel, Gaussian) pair with alpha = op*exp(power) < 1/255, so tiles
    that cannot reach that threshold anywhere contribute exactly nothing —
    shrinking the rect from the CUDA 3-sigma bounding square
    (`getRect`, SURVEY.md §2.9.1) to the level-set ellipse's AABB preserves
    the rendered output bit-for-bit while cutting the (Gaussian, tile) pair
    count, which every downstream P-sized stage scales with.

    The AABB half-extents are sqrt(tau * Sigma_aa) with
    tau = 2*ln(op/alpha_min), clipped against the 3-sigma square (the outer
    bound for CUDA parity: the reference never composites beyond the square
    even where alpha >= 1/255, and high-opacity splats reach threshold past
    3 sigma, so tau itself must NOT be capped at 9). One pixel of safety
    absorbs f32 rounding. Gaussians with op < 1/255 are everywhere below
    threshold and get an empty rect.
    """
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    a = proj.conic[:, 0]
    b = proj.conic[:, 1]
    c = proj.conic[:, 2]
    detc = a * c - b * b                      # = 1/det(cov2d) for live rows
    inv = 1.0 / jnp.maximum(detc, 1e-30)
    sxx = c * inv                             # Sigma_xx (dilated)
    syy = a * inv
    alpha_min = 1.0 / 255.0
    tau = jnp.maximum(
        2.0 * jnp.log(jnp.maximum(proj.opacity, 1e-12) / alpha_min), 0.0)
    r3 = proj.radius.astype(jnp.float32)
    rx = jnp.minimum(jnp.sqrt(jnp.maximum(tau * sxx, 0.0)) + 1.0, r3)
    ry = jnp.minimum(jnp.sqrt(jnp.maximum(tau * syy, 0.0)) + 1.0, r3)
    empty = (proj.radius <= 0) | (proj.opacity < alpha_min)
    mx = proj.mean2d[:, 0]
    my = proj.mean2d[:, 1]
    xmin = jnp.clip(((mx - rx) / TILE).astype(jnp.int32), 0, grid_x)
    ymin = jnp.clip(((my - ry) / TILE).astype(jnp.int32), 0, grid_y)
    xmax = jnp.clip(((mx + rx + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    ymax = jnp.clip(((my + ry + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    xmax = jnp.where(empty, xmin, jnp.maximum(xmax, xmin))
    ymax = jnp.where(empty, ymin, jnp.maximum(ymax, ymin))
    return xmin, ymin, xmax, ymax


def tile_rect(mean2d: jnp.ndarray, radius: jnp.ndarray, width: int, height: int):
    """Tile-grid bounding rect of each Gaussian, CUDA `getRect` semantics.

    Returns (xmin, ymin, xmax, ymax) in tile units, half-open, each (N,) int32.
    A Gaussian covers tiles with xmin <= tx < xmax and ymin <= ty < ymax;
    radius == 0 yields an empty rect.
    """
    grid_x = (width + TILE - 1) // TILE
    grid_y = (height + TILE - 1) // TILE
    r = radius.astype(jnp.float32)
    xmin = jnp.clip(((mean2d[:, 0] - r) / TILE).astype(jnp.int32), 0, grid_x)
    ymin = jnp.clip(((mean2d[:, 1] - r) / TILE).astype(jnp.int32), 0, grid_y)
    xmax = jnp.clip(((mean2d[:, 0] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_x)
    ymax = jnp.clip(((mean2d[:, 1] + r + TILE - 1) / TILE).astype(jnp.int32), 0, grid_y)
    empty = radius <= 0
    xmax = jnp.where(empty, xmin, xmax)
    ymax = jnp.where(empty, ymin, ymax)
    return xmin, ymin, xmax, ymax
