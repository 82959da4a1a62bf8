"""Tile binning + depth sorting — the TPU replacement for the CUDA
rasterizer's duplicated-key global radix sort (SURVEY.md §2.9.1).

The CUDA pipeline builds (tileID | depth) 64-bit keys, one per
(Gaussian, covered tile) pair, radix-sorts them globally and finds per-tile
ranges. On TPU we express the same thing with static shapes:

  1. pair expansion with a fixed pair capacity P:
     `jnp.repeat(arange(N), tiles_touched, total_repeat_length=P)` — pairs
     beyond P are dropped (counted in `overflow`), padding pairs get an
     invalid tile id that sorts to the end;
  2. lexicographic `lax.sort` on (tile_id, depth) — XLA's TPU sort;
  3. per-tile [start, end) ranges via vectorised `searchsorted`.

Everything is differentiable-free index plumbing; gradients flow through the
subsequent attribute *gather* (whose VJP is the scatter-add back onto
Gaussians).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from .projection import TILE, ProjectedGaussians, tile_rect


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBinning:
    """Sorted (Gaussian, tile) pair lists + per-tile ranges."""

    gauss_ids: jnp.ndarray   # (P,) int32 — Gaussian index per sorted pair
    tile_ids: jnp.ndarray    # (P,) int32 — tile index per sorted pair
    tile_start: jnp.ndarray  # (num_tiles,) int32
    tile_end: jnp.ndarray    # (num_tiles,) int32
    num_pairs: jnp.ndarray   # () int32 — valid pairs (≤ P)
    overflow: jnp.ndarray    # () int32 — pairs dropped for capacity


def grid_shape(width: int, height: int) -> tuple[int, int]:
    return (-(-width // TILE), -(-height // TILE))


@partial(jax.jit, static_argnames=("width", "height", "pair_capacity"))
def bin_gaussians(proj: ProjectedGaussians, width: int, height: int,
                  pair_capacity: int) -> TileBinning:
    n = proj.mean2d.shape[0]
    grid_x, grid_y = grid_shape(width, height)
    num_tiles = grid_x * grid_y
    xmin, ymin, xmax, ymax = tile_rect(proj.mean2d, proj.radius, width, height)
    nx = (xmax - xmin).astype(jnp.int32)
    ny = (ymax - ymin).astype(jnp.int32)
    counts = nx * ny
    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = jnp.sum(counts)

    p = pair_capacity
    gauss_ids = jnp.repeat(jnp.arange(n, dtype=jnp.int32), counts,
                           total_repeat_length=p)
    pair_pos = jnp.arange(p, dtype=jnp.int32)
    rank = pair_pos - offsets[gauss_ids]
    valid = (pair_pos < jnp.minimum(total, p)) & (rank >= 0) \
        & (rank < counts[gauss_ids])
    nxg = jnp.maximum(nx[gauss_ids], 1)
    tx = xmin[gauss_ids] + rank % nxg
    ty = ymin[gauss_ids] + rank // nxg
    tile_ids = jnp.where(valid, ty * grid_x + tx, num_tiles)

    depth = jnp.where(valid, proj.depth[gauss_ids], jnp.inf)
    tile_sorted, _, gauss_sorted = jax.lax.sort(
        (tile_ids, depth, gauss_ids), dimension=0, is_stable=True, num_keys=2)

    tiles = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(tile_sorted, tiles, side="left"
                                  ).astype(jnp.int32)
    tile_end = jnp.searchsorted(tile_sorted, tiles, side="right"
                                ).astype(jnp.int32)
    return TileBinning(
        gauss_ids=gauss_sorted,
        tile_ids=tile_sorted,
        tile_start=tile_start,
        tile_end=tile_end,
        num_pairs=jnp.minimum(total, p).astype(jnp.int32),
        overflow=jnp.maximum(total - p, 0).astype(jnp.int32),
    )


# Packed pair-attribute layout consumed by the Pallas compositor.
# Rows of the (ATTR_ROWS, P) array:
ATTR_MX, ATTR_MY = 0, 1            # mean2d (pixels)
ATTR_CA, ATTR_CB, ATTR_CC = 2, 3, 4  # conic (a, b, c)
ATTR_OP = 5                        # opacity (post-activation, AA-rescaled)
ATTR_R, ATTR_G, ATTR_B = 6, 7, 8   # RGB
ATTR_ID = 9                        # inverse depth
ATTR_ROWS = 10


def pack_attributes(proj: ProjectedGaussians) -> jnp.ndarray:
    """(ATTR_ROWS, N) packed per-Gaussian attributes (see layout above)."""
    return jnp.stack([
        proj.mean2d[:, 0], proj.mean2d[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        proj.opacity,
        proj.rgb[:, 0], proj.rgb[:, 1], proj.rgb[:, 2],
        proj.invdepth,
    ], axis=0)


def unpack_attr_grads(d_attrs: jnp.ndarray) -> ProjectedGaussians:
    """(ATTR_ROWS, N) cotangents -> ProjectedGaussians-shaped cotangents."""
    return ProjectedGaussians(
        mean2d=jnp.stack([d_attrs[ATTR_MX], d_attrs[ATTR_MY]], axis=-1),
        conic=jnp.stack([d_attrs[ATTR_CA], d_attrs[ATTR_CB],
                         d_attrs[ATTR_CC]], axis=-1),
        opacity=d_attrs[ATTR_OP],
        rgb=jnp.stack([d_attrs[ATTR_R], d_attrs[ATTR_G], d_attrs[ATTR_B]],
                      axis=-1),
        depth=jnp.zeros_like(d_attrs[ATTR_ID]),
        invdepth=d_attrs[ATTR_ID],
        radius=jnp.zeros(d_attrs.shape[1], dtype=jnp.int32),
    )
