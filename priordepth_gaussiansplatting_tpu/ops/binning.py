"""Tile binning + depth sorting — the TPU replacement for the CUDA
rasterizer's duplicated-key global radix sort (SURVEY.md §2.9.1).

The CUDA pipeline builds (tileID | depth) 64-bit keys, one per
(Gaussian, covered tile) pair, radix-sorts them globally and finds per-tile
ranges. A naive XLA translation (repeat + per-pair gathers + 2-key sort) is
gather-bound on TPU (arbitrary-index gathers of pair-sized arrays are the
slowest op in the pipeline), so the design here avoids per-pair gathers
entirely:

  1. DEPTH-SORT the N Gaussians once (argsort over N, cheap). After this,
     any stable tile-keyed ordering of pairs is automatically depth-ordered
     within each tile — no depth key, no 2-key sort.
  2. Pair expansion by a Pallas kernel over pair chunks: segment starts of
     the PRESENT (count>0) Gaussians are compacted into an ascending
     offsets table; a chunk of K consecutive pairs can only reference a
     window of K+slack consecutive present Gaussians, so the kernel DMAs
     that window, ranks each pair against it with a compare matrix
     (j = Σ offsets≤pos − 1), recovers (offset, rect, id) with a one-hot
     MXU contraction, and emits per-pair tile + Gaussian id. It also
     accumulates the (tile_y, tile_x) pair histogram with two one-hot
     matmuls per chunk — per-tile ranges are its exclusive cumsum, no
     searchsorted over the sorted pair list.
  3. ONE stable single-key sort by tile id with the pair's Gaussian id
     as payload — XLA's TPU sort is fast; stability preserves depth order.

Pairs beyond capacity are dropped and counted in `overflow`; padding pairs
get tile id = num_tiles and sort to the end. Everything is
differentiable-free index plumbing; gradients flow through the subsequent
attribute gather (VJP = sort-back + Pallas segment reduction).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import (TILE, ProjectedGaussians, round_bf16, tile_rect,
                         tile_rect_tight)

# Rect packing: pack = tile_base * RECT_PACK + nx. Supports nx < 256 tiles
# per row, i.e. image widths up to 256*16 = 4096 px.
RECT_PACK = 256

# Pair-expansion kernel geometry: K pairs per chunk, window of W present
# Gaussians (W ≥ K + DMA alignment slack 128 + 2; multiple of 128).
# K = 1024 keeps the per-field (K/128, 128) output blocks at the TPU's
# (8, 128) block-shape minimum.
EXP_K = 1024
EXP_W = EXP_K + 256
_OFF_SENTINEL = 1 << 30


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TileBinning:
    """Depth-sorted (Gaussian, tile) pair lists + per-tile ranges.

    `gauss_ids` are ORIGINAL Gaussian indices (the caller's array order):
    attribute gathers read the projection outputs directly, with no
    depth-permutation step in between (pairs are still depth-ordered
    within each tile — the payload id space is independent of the
    emission order)."""

    depth_order: jnp.ndarray  # (N,) int32 — front-to-back Gaussian order
    gauss_ids: jnp.ndarray    # (P,) int32 — ORIGINAL Gaussian per sorted pair
    tile_ids: jnp.ndarray     # (P,) int32 — tile index per sorted pair
    tile_start: jnp.ndarray   # (num_tiles,) int32
    tile_end: jnp.ndarray     # (num_tiles,) int32
    num_pairs: jnp.ndarray    # () int32 — valid pairs (≤ P)
    overflow: jnp.ndarray     # () int32 — pairs dropped for capacity


def grid_shape(width: int, height: int) -> tuple[int, int]:
    return (-(-width // TILE), -(-height // TILE))


def _expand_kernel_factory(grid_x: int, grid_y: int, gyp: int, gxp: int):
    num_tiles = grid_x * grid_y

    def kernel(s0_ref, tot_ref, comp_hbm, pairs_ref, hist_ref, wbuf, wsem):
        c = pl.program_id(0)
        nb = pl.num_programs(0)

        def dma(i, slot):
            start = pl.multiple_of(s0_ref[i], 128)
            return pltpu.make_async_copy(
                comp_hbm.at[:, pl.ds(start, EXP_W)],
                wbuf.at[slot], wsem.at[slot])

        @pl.when(c == 0)
        def _():
            dma(0, 0).start()
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nb)
        def _():
            dma(c + 1, 1 - slot).start()
        dma(c, slot).wait()
        win = wbuf[slot, :3]                           # (3, W) int32
        offs = win[0:1, :]                             # (1, W)
        ksub = jax.lax.broadcasted_iota(jnp.int32, (EXP_K, 1), 0)
        pos_s = c * EXP_K + ksub                       # (K, 1)
        cmp = (pos_s >= offs).astype(jnp.float32)      # (K, W)
        # one-hot of the OWNING gaussian: row k is 1 for windows 0..j(k).
        shifted = jnp.concatenate(
            [cmp[:, 1:], jnp.zeros((EXP_K, 1), jnp.float32)], axis=1)
        onehot = cmp - shifted                         # (K, W)
        # exact integer gather of (offset, pack, gid): HIGHEST keeps the
        # f32 values un-truncated on the MXU (they exceed bf16's mantissa).
        sel = jax.lax.dot_general(
            win.astype(jnp.float32), onehot, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)        # (3, K)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, EXP_K), 1)
        pos = c * EXP_K + lane                         # (1, K)
        off_sel, pack_sel, gid_sel = sel[0:1], sel[1:2], sel[2:3]
        rank = pos.astype(jnp.float32) - off_sel
        base = jnp.floor(pack_sel * (1.0 / RECT_PACK))
        nx = jnp.maximum(pack_sel - base * RECT_PACK, 1.0)
        # rank // nx via f32: exact for rank ≤ grid area (≪ 2^23 / margin).
        q = jnp.floor((rank + 0.5) / nx)
        r = rank - q * nx
        tile = base + q * grid_x + r
        valid = pos < tot_ref[0]
        tile_i = jnp.where(valid, tile.astype(jnp.int32), num_tiles)
        pairs_ref[0:1, :] = tile_i
        pairs_ref[1:2, :] = gid_sel.astype(jnp.int32)
        # (tile_y, tile_x) histogram of this chunk via two one-hots on the
        # MXU; padding pairs have tile_y == grid_y and fall outside.
        tile_f = tile_i.astype(jnp.float32)
        ty = jnp.floor((tile_f + 0.5) * (1.0 / grid_x)).astype(jnp.int32)
        tx = tile_i - ty * grid_x
        ity = jax.lax.broadcasted_iota(jnp.int32, (gyp, EXP_K), 0)
        itx = jax.lax.broadcasted_iota(jnp.int32, (gxp, EXP_K), 0)
        oty = (ity == ty).astype(jnp.float32)
        otx = (itx == tx).astype(jnp.float32)

        @pl.when(c == 0)
        def _():
            hist_ref[...] = jnp.zeros((gyp, gxp), jnp.float32)
        hist_ref[...] += jax.lax.dot_general(
            oty, otx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    return kernel


@partial(jax.jit, static_argnames=("width", "height", "pair_capacity",
                                   "interpret"))
def bin_gaussians(proj: ProjectedGaussians, width: int, height: int,
                  pair_capacity: int,
                  interpret: bool | None = None) -> TileBinning:
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n = proj.mean2d.shape[0]
    p = pair_capacity
    assert p % EXP_K == 0, "pair_capacity must be a multiple of EXP_K"
    grid_x, grid_y = grid_shape(width, height)
    num_tiles = grid_x * grid_y

    # 1. depth order (culled Gaussians carry depth=inf → sort last).
    order = jnp.argsort(proj.depth).astype(jnp.int32)

    # Rect geometry in ORIGINAL order, then ONE (2, N) lane-axis permute.
    # Gathers along a small minor dim ((N,2) mean2d rows) lower to scalar
    # row copies on TPU (~7x the cost of a lane gather of the same bytes);
    # packing the per-Gaussian ints as lanes avoids that entirely.
    xmin_u, ymin_u, xmax_u, ymax_u = tile_rect(proj.mean2d, proj.radius,
                                               width, height)
    nx_u = (xmax_u - xmin_u).astype(jnp.int32)
    counts_u = nx_u * (ymax_u - ymin_u).astype(jnp.int32)
    base_u = ymin_u * grid_x + xmin_u
    pack_u = base_u * RECT_PACK + jnp.minimum(nx_u, RECT_PACK - 1)
    packed_s = jnp.stack([pack_u, counts_u])[:, order]
    pack = packed_s[0]
    counts = packed_s[1]
    offsets = jnp.cumsum(counts) - counts  # exclusive
    total = jnp.sum(counts)

    # 2. compact the PRESENT gaussians' (offset, pack, id) into ascending
    # tables for the expansion kernel; a chunk of EXP_K pairs references a
    # window of ≤ EXP_K+1 consecutive present gaussians (each has ≥1 pair).
    # Compaction is ONE stable sort keyed on the masked offset (absent →
    # sentinel): offsets strictly ascend among present gaussians, so the
    # sort just slides the absent ones to the tail. A sort is ~15x faster
    # here than the monotone-inverse searchsorted gather (1M binary-search
    # queries = 20 serial gather rounds, ~156 ms at N=1M), and a scatter is
    # far worse still (XLA TPU lowers it to a serial N-iteration loop).
    # The id row carries ORIGINAL gaussian ids (`order`), so emitted pairs
    # reference the caller's arrays directly.
    present = (counts > 0) & (offsets < p)
    n_pad = -(-(n + EXP_W) // 128) * 128
    off_c, pack_c, ids_c = jax.lax.sort(
        (jnp.where(present, offsets, _OFF_SENTINEL), pack, order),
        dimension=0, is_stable=True, num_keys=1)
    pad = n_pad - n
    comp = jnp.concatenate([
        jnp.stack([jnp.pad(off_c, (0, pad), constant_values=_OFF_SENTINEL),
                   jnp.pad(pack_c, (0, pad)),
                   jnp.pad(ids_c, (0, pad))]),
        jnp.zeros((5, n_pad), jnp.int32)])

    # Per-chunk window starts: C[c] = #present offsets < c*EXP_K via
    # searchsorted over the compacted (ascending, sentinel-tailed) offsets,
    # 128-aligned for the lane DMA.
    nb = p // EXP_K
    cpos = jnp.arange(nb, dtype=jnp.int32) * EXP_K
    c_tab = jnp.searchsorted(comp[0], cpos, side="left").astype(jnp.int32)
    s0 = (jnp.clip(c_tab - 1, 0, jnp.maximum(n - 1, 0)) // 128) * 128
    tot = jnp.minimum(total, p).astype(jnp.int32)[None]

    gyp = -(-grid_y // 8) * 8
    gxp = -(-grid_x // 128) * 128
    pairs, hist = pl.pallas_call(
        _expand_kernel_factory(grid_x, grid_y, gyp, gxp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=[
                pl.BlockSpec((2, EXP_K), lambda c, *_: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((gyp, gxp), lambda c, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, 8, EXP_W), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((2, p), jnp.int32),
                   jax.ShapeDtypeStruct((gyp, gxp), jnp.float32)],
        interpret=interpret,
    )(s0, tot, comp)
    tile_ids = pairs[0]
    gid = pairs[1]

    # 3. per-tile ranges from the histogram (counts partition the sorted
    # pair list; padding sorts last), then the single stable tile-key sort.
    counts_t = hist[:grid_y, :grid_x].reshape(num_tiles).astype(jnp.int32)
    ends = jnp.cumsum(counts_t).astype(jnp.int32)
    tile_start = ends - counts_t
    tile_end = ends
    tile_sorted, gid_sorted = jax.lax.sort(
        (tile_ids, gid), dimension=0, is_stable=True, num_keys=1)
    return TileBinning(
        depth_order=order,
        gauss_ids=gid_sorted,
        tile_ids=tile_sorted,
        tile_start=tile_start,
        tile_end=tile_end,
        num_pairs=tot[0],
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

# Bit-packed PER-PAIR row layout (the tile-sort payloads and the
# compositor's chunk stream). conic/opacity/colour/invdepth are bf16-valued
# by the projection spec (projection.py), so two of them pack losslessly
# into one f32 lane: the tile sort — the most expensive P-sized stage, cost
# linear in payload rows — moves 6 rows instead of 10. mean2d stays f32.
# Packed lanes are only ever MOVED (sort payloads, DMA, lane packing);
# all arithmetic happens after in-kernel unpacking (a packed bit pattern
# is not a meaningful f32 and TPU flush-to-zero would corrupt it).
PAIR_MX, PAIR_MY = 0, 1            # mean2d, full f32
PAIR_CACB = 2                      # hi: conic a,  lo: conic b
PAIR_CCOP = 3                      # hi: conic c,  lo: opacity
PAIR_RG = 4                        # hi: R,        lo: G
PAIR_BID = 5                       # hi: B,        lo: inverse depth
PAIR_ROWS = 6


def _pack_bf16_pair(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """Pack two bf16-valued f32 arrays into one f32 (hi<<16 | lo bits)."""
    uh = jax.lax.bitcast_convert_type(hi, jnp.uint32)
    ul = jax.lax.bitcast_convert_type(lo, jnp.uint32)
    packed = (uh & jnp.uint32(0xFFFF0000)) | (ul >> 16)
    return jax.lax.bitcast_convert_type(packed, jnp.float32)


def _round_pack_bf16_pair(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """RTNE-round two arbitrary f32 arrays to bf16 and bit-pack them."""
    return _pack_bf16_pair(round_bf16(a), round_bf16(b))


def unpack_bf16_rows(packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(rows, K) packed f32 -> (hi, lo) f32 arrays of the same shape."""
    u = jax.lax.bitcast_convert_type(packed, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    return hi, lo


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


@jax.custom_vjp
def gather_pairs(attrs: jnp.ndarray, binned: TileBinning) -> jnp.ndarray:
    """(ROWS, N) original-order attrs -> (ROWS, P) tile-sorted pair attrs.

    The VJP avoids both XLA's scatter-add AND the inverse-permutation
    gather (the two slowest candidates at multi-million pair counts,
    ~2.5x and ~1.4x slower respectively on TPU): pair cotangents are
    sorted into contiguous per-Gaussian segments keyed on the pair's
    (original) Gaussian id, carrying the attribute rows as sort payloads —
    TPU's sort moves payload lanes in vector units where a random-index
    gather degrades to element access. Per-Gaussian order within a
    segment is irrelevant (only the sum survives), so the id itself is a
    sufficient key; padding pairs are bumped past every real id so they
    sort after the last segment. The reduction is then a contiguous
    segment sum — the Pallas `segment_reduce` kernel (one-hot MXU
    contraction per pair chunk; ~2.5x the XLA cumsum + boundary-gather at
    8M pairs, more accurate) — whose output is already in the caller's
    original Gaussian order (no inverse depth-permute step).
    """
    return attrs[:, binned.gauss_ids]


def _gather_pairs_fwd(attrs, binned):
    return attrs[:, binned.gauss_ids], (attrs.shape[1], binned)


def _gather_pairs_bwd(res, d_sorted):
    n, binned = res
    p = binned.gauss_ids.shape[0]
    pair_pos = jnp.arange(p, dtype=jnp.int32)
    key = jnp.where(pair_pos < binned.num_pairs, binned.gauss_ids, n)
    sorted_back = jax.lax.sort(
        (key,) + tuple(d_sorted), dimension=0, is_stable=False,
        num_keys=1)
    gid_sorted = sorted_back[0]                     # ascending gaussian ids
    d_pairs = jnp.stack(sorted_back[1:], axis=0)    # id-segment pairs
    d_attrs = segment_reduce(d_pairs, gid_sorted, binned.num_pairs, n)
    return d_attrs, None


gather_pairs.defvjp(_gather_pairs_fwd, _gather_pairs_bwd)


@jax.custom_vjp
def gather_pairs_padded(attrs: jnp.ndarray, ids_pad: jnp.ndarray,
                        num_pairs: jnp.ndarray) -> jnp.ndarray:
    """Like :func:`gather_pairs` but on a pre-padded id vector.

    `attrs` is (ROWS_pad, N) (already sublane-padded for the compositor);
    `ids_pad` is the tile-sorted Gaussian ids padded with trailing junk to
    the kernel's lane capacity. The output needs no masking: junk lanes are
    outside every tile range, so the compositor never reads them and its
    VJP never writes them. The VJP masks on `num_pairs` when sorting back,
    exactly as gather_pairs does."""
    return attrs[:, ids_pad]


def _gather_pairs_padded_fwd(attrs, ids_pad, num_pairs):
    return attrs[:, ids_pad], (attrs.shape[1], ids_pad, num_pairs)


def _gather_pairs_padded_bwd(res, d_sorted):
    n, ids_pad, num_pairs = res
    p = ids_pad.shape[0]
    pair_pos = jnp.arange(p, dtype=jnp.int32)
    key = jnp.where(pair_pos < num_pairs, ids_pad, n)
    rows = d_sorted.shape[0]
    sorted_back = jax.lax.sort(
        (key,) + tuple(d_sorted[i] for i in range(ATTR_ROWS)),
        dimension=0, is_stable=False, num_keys=1)
    gid_sorted = sorted_back[0]
    d_pairs = jnp.stack(sorted_back[1:], axis=0)
    d_attrs = segment_reduce(d_pairs, gid_sorted, num_pairs, n)
    d_attrs = jnp.pad(d_attrs, ((0, rows - ATTR_ROWS), (0, 0)))
    return d_attrs, None, None


gather_pairs_padded.defvjp(_gather_pairs_padded_fwd, _gather_pairs_padded_bwd)


# --- id-sorted pair -> per-Gaussian segment reduction (Pallas) -------------
#
# After the sort-back, each Gaussian's pair cotangents are contiguous and
# the sorted gaussian-id key is ascending, so a block of SEG_G consecutive
# Gaussians owns a contiguous pair range. The kernel sweeps that range in
# chunks and reduces chunk -> block with a one-hot MXU contraction —
# replacing the XLA cumsum + boundary-gather (a (ROWS, N)-sized random
# gather, ~7x slower at millions of pairs).

SEG_G = 512    # gaussians per block (output lanes)
SEG_K = 512    # pairs per chunk


def _segment_reduce_kernel(bounds_ref, d_hbm, gid_hbm, out_ref,
                           dbuf, gbuf, dsem, gsem):
    b = pl.program_id(0)
    start = bounds_ref[b]
    end = bounds_ref[b + 1]
    astart = pl.multiple_of((start // SEG_K) * SEG_K, SEG_K)
    nchunks = jnp.where(end > start, pl.cdiv(end - astart, SEG_K), 0)
    g0 = b * SEG_G

    def ddma(i, slot):
        return pltpu.make_async_copy(
            d_hbm.at[:, pl.ds(astart + i * SEG_K, SEG_K)],
            dbuf.at[slot], dsem.at[slot])

    def gdma(i, slot):
        return pltpu.make_async_copy(
            gid_hbm.at[:, pl.ds(astart + i * SEG_K, SEG_K)],
            gbuf.at[slot], gsem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        ddma(0, 0).start()
        gdma(0, 0).start()

    def body(i, acc):
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < nchunks)
        def _():
            ddma(i + 1, nxt).start()
            gdma(i + 1, nxt).start()

        ddma(i, slot).wait()
        gdma(i, slot).wait()
        d = dbuf[slot]             # (16, K)
        rel = gbuf[slot] - g0      # (1, K)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, SEG_K), 1)
        pos = astart + i * SEG_K + lane
        in_range = (pos >= start) & (pos < end)
        iota_g = jax.lax.broadcasted_iota(jnp.int32, (SEG_G, SEG_K), 0)
        onehot = ((rel == iota_g) & in_range).astype(jnp.float32)  # (G, K)
        # The MXU truncates f32 operands to bf16 at DEFAULT precision
        # (~0.4% gradient error) and HIGHEST (6-pass) costs 2.3x wall time;
        # since the one-hot operand is exact, two DEFAULT-precision dots on
        # a hi/lo bf16 split of `d` recover f32 accuracy (~1e-7 rel) for
        # one extra cheap pass.
        d_hi = round_bf16(d)
        d_lo = d - d_hi
        dims = (((1,), (1,)), ((), ()))
        return (acc
                + jax.lax.dot_general(
                    d_hi, onehot, dims,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    d_lo, onehot, dims,
                    preferred_element_type=jnp.float32))  # (16, G)

    acc = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((16, SEG_G), jnp.float32))
    out_ref[0] = acc


def segment_reduce(d_pairs: jnp.ndarray, gid_sorted: jnp.ndarray,
                   num_pairs: jnp.ndarray, n: int,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Σ per Gaussian of id-sorted pair rows: (ROWS, P) -> (ROWS, N).

    `gid_sorted` is the ascending gaussian-id key the pairs were sorted by
    (padding pairs carry id >= n and never match a block). Block b's pair
    range comes from a searchsorted over that key — nb+1 ≈ N/512 queries,
    negligible next to an N-element sort."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, p = d_pairs.shape
    nb = -(-n // SEG_G)
    # Block b owns gaussians [b*SEG_G, (b+1)*SEG_G) -> pair range
    # [bounds[b], bounds[b+1]) in the id-sorted list (clipped to the real
    # pair count so padding keys never extend the last block).
    queries = jnp.arange(nb + 1, dtype=jnp.int32) * SEG_G
    bounds = jnp.minimum(
        jnp.searchsorted(gid_sorted, queries, side="left").astype(jnp.int32),
        num_pairs)
    d16 = jnp.pad(d_pairs, ((0, 16 - rows), (0, SEG_K)))
    gid = jnp.pad(gid_sorted, (0, d16.shape[1] - p),
                  constant_values=n)[None, :]
    out = pl.pallas_call(
        _segment_reduce_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 16, SEG_G), lambda b, *_: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, 16, SEG_K), jnp.float32),
                pltpu.VMEM((2, 1, SEG_K), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, 16, SEG_G), jnp.float32),
        interpret=interpret,
    )(bounds, d16, gid)
    return out.transpose(1, 0, 2).reshape(16, nb * SEG_G)[:rows, :n]



# ===========================================================================
# Fused binning: ONE depth sort carrying attributes, a pair-expansion kernel
# that emits per-pair ATTRIBUTES (exact one-hot MXU gather from the windowed
# table) and culls (Gaussian, tile) pairs whose peak alpha in the tile is
# below 1/255 (exact ellipse-vs-tile-box test — output-preserving, the
# compositor skips those pairs anyway), and ONE tile sort carrying the
# attributes as payloads. This replaces the round-1 pipeline's P-sized
# random-index attribute gather (the slowest stage on TPU: sorts move
# payload lanes in vector units, random gathers degrade to element access)
# and its separate N-sized compaction sort / depth permute.
#
# Gradients: the whole block is wrapped in ONE custom VJP whose backward is
# the id-keyed sort-back + Pallas segment reduction (pair cotangents ->
# original-order per-Gaussian cotangents), exactly the round-1 reduction.
# ===========================================================================

_ALPHA_MIN = 1.0 / 255.0
# f32-exact integer limits for the one-hot MXU recovery (HIGHEST precision
# keeps full f32: one nonzero term per row, no cancellation).
_F32_INT_MAX = 1 << 23
_LO_MOD = 1 << 17   # offsets are recovered mod 2^17 (rank < rect area < 2^17)

# f32 window-table rows (attrs follow ATTR_* at offset _CF_A0).
_CF_OFFLO, _CF_PACK, _CF_GID, _CF_A0 = 0, 1, 2, 3
_CF_ROWS = 16


def _exclusive_cumsum_i32(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact exclusive cumsum of non-negative int32 (and the total).

    XLA's 1-D cumsum at N=1M costs ~5 ms on TPU; this runs the row-local
    scans as (B, L) x (L, L) triangular matmuls (exact in f32: row sums stay
    far below 2^24) and accumulates across rows in int32 (exact to 2^31)."""
    n = x.shape[0]
    L = 512
    b = -(-n // L)
    xp = jnp.pad(x, (0, b * L - n)).reshape(b, L).astype(jnp.float32)
    r = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    tri = (r <= c).astype(jnp.float32)
    incl = jax.lax.dot_general(
        xp, tri, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(jnp.int32)   # (b, L)
    row_tot = incl[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot                      # (b,) i32
    excl = incl - xp.astype(jnp.int32) + row_off[:, None]
    total = row_off[-1] + row_tot[-1]
    return excl.reshape(-1)[:n], total


def _expand_attrs_kernel_factory(grid_x: int, grid_y: int,
                                 gyp: int, gxp: int):
    num_tiles = grid_x * grid_y

    def kernel(s0_ref, tot_ref, compi_hbm, compf_hbm, tile_ref, gid_ref,
               hist_ref, *attr_refs_and_scratch):
        attr_refs = attr_refs_and_scratch[:PAIR_ROWS]
        wibuf, wfbuf, wisem, wfsem = attr_refs_and_scratch[PAIR_ROWS:]
        c = pl.program_id(0)
        nb = pl.num_programs(0)

        def dma_i(i, slot):
            start = pl.multiple_of(s0_ref[i], 128)
            return pltpu.make_async_copy(
                compi_hbm.at[:, pl.ds(start, EXP_W)],
                wibuf.at[slot], wisem.at[slot])

        def dma_f(i, slot):
            start = pl.multiple_of(s0_ref[i], 128)
            return pltpu.make_async_copy(
                compf_hbm.at[:, pl.ds(start, EXP_W)],
                wfbuf.at[slot], wfsem.at[slot])

        @pl.when(c == 0)
        def _():
            dma_i(0, 0).start()
            dma_f(0, 0).start()
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nb)
        def _():
            dma_i(c + 1, 1 - slot).start()
            dma_f(c + 1, 1 - slot).start()
        dma_i(c, slot).wait()
        dma_f(c, slot).wait()
        offs = wibuf[slot, 0:1, :]                     # (1, W) int32, exact
        winf = wfbuf[slot]                             # (16, W) f32

        ksub = jax.lax.broadcasted_iota(jnp.int32, (EXP_K, 1), 0)
        pos_s = c * EXP_K + ksub                       # (K, 1) int32
        cmp = (pos_s >= offs).astype(jnp.float32)      # (K, W)
        # one-hot of the OWNING gaussian (last offset <= pos). (A two-level
        # block/fine ranking was measured SLOWER here — 15.7 ms vs 11.2 at
        # bench shapes: the small HIGHEST-precision block-gather matmuls
        # and the cross-lane reductions cost more than the flat compare's
        # extra VPU passes. Measured dead end; see docs/PERF.md.)
        shifted = jnp.concatenate(
            [cmp[:, 1:], jnp.zeros((EXP_K, 1), jnp.float32)], axis=1)
        onehot = cmp - shifted                         # (K, W)
        # One-hot gather of (off_lo, pack, gid, attrs...), EXACT below
        # HIGHEST's cost: all 16 rows go through a three-bf16-limb split
        # (top/mid/low 8 mantissa bits — the full f32 significand)
        # contracted against the EXACTLY-representable one-hot at DEFAULT
        # (1-pass bf16) precision. Each partial product is exact, f32
        # accumulation is exact, so hi+mid+lo reconstructs every value
        # bit-for-bit — 3x16 row-passes vs HIGHEST's 6x16. (Rows 8..15 are
        # bf16-valued by the projection spec, so a 1-pass gather of just
        # those rows would also be exact, but splitting the contraction
        # into winf[0:8]/winf[8:16] operands measured ~0.3 Mray/s SLOWER:
        # the sublane-sliced operands force copies that outweigh the saved
        # MXU passes — see docs/PERF.md "Measured dead ends".)
        w_hi = round_bf16(winf)
        w_mid_f = winf - w_hi
        w_mid = round_bf16(w_mid_f)
        w_lo = w_mid_f - w_mid
        dims = (((1,), (1,)), ((), ()))
        sel = (jax.lax.dot_general(
                   w_hi, onehot, dims, preferred_element_type=jnp.float32)
               + jax.lax.dot_general(
                   w_mid, onehot, dims, preferred_element_type=jnp.float32)
               + jax.lax.dot_general(
                   w_lo, onehot, dims,
                   preferred_element_type=jnp.float32))  # (16, K)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, EXP_K), 1)
        pos = c * EXP_K + lane                         # (1, K) int32
        offlo_sel = sel[_CF_OFFLO:_CF_OFFLO + 1]
        pack_sel = sel[_CF_PACK:_CF_PACK + 1]
        gid_sel = sel[_CF_GID:_CF_GID + 1]
        attrs = sel[_CF_A0:_CF_A0 + ATTR_ROWS]         # (10, K)
        # rank = pos - offset, recovered mod 2^17 (rank < rect area < 2^17;
        # full offsets can exceed f32's exact-integer range at stress pair
        # counts, the mod-2^17 residue cannot).
        pos_lo = (pos % _LO_MOD).astype(jnp.float32)
        r0 = pos_lo - offlo_sel
        rank = r0 + jnp.where(r0 < 0, float(_LO_MOD), 0.0)
        base = jnp.floor(pack_sel * (1.0 / RECT_PACK))
        nx = jnp.maximum(pack_sel - base * RECT_PACK, 1.0)
        q = jnp.floor((rank + 0.5) / nx)
        r = rank - q * nx
        tile = base + q * grid_x + r                   # (1, K) f32 exact int

        # --- exact ellipse-vs-tile cull (output-preserving) -------------
        # keep iff the peak alpha over the tile's pixel box can reach
        # 1/255: min_box q(d) <= 2*ln(op/alpha_min), with the exact min of
        # the PD quadratic over the box = 0 inside, else the min over the
        # four edges (each edge's constrained minimum in closed form).
        ty = jnp.floor((tile + 0.5) * (1.0 / grid_x))
        tx = tile - ty * grid_x
        mx = attrs[ATTR_MX:ATTR_MX + 1]
        my = attrs[ATTR_MY:ATTR_MY + 1]
        ca = attrs[ATTR_CA:ATTR_CA + 1]
        cb = attrs[ATTR_CB:ATTR_CB + 1]
        cc = attrs[ATTR_CC:ATTR_CC + 1]
        op = attrs[ATTR_OP:ATTR_OP + 1]
        dxl = tx * TILE - mx
        dxh = dxl + (TILE - 1)
        dyl = ty * TILE - my
        dyh = dyl + (TILE - 1)
        inside = (dxl <= 0.0) & (dxh >= 0.0) & (dyl <= 0.0) & (dyh >= 0.0)

        def q_at(dx, dy):
            return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

        ica = 1.0 / jnp.maximum(ca, 1e-12)
        icc = 1.0 / jnp.maximum(cc, 1e-12)
        qx0 = q_at(dxl, jnp.clip(-cb * dxl * icc, dyl, dyh))
        qx1 = q_at(dxh, jnp.clip(-cb * dxh * icc, dyl, dyh))
        qy0 = q_at(jnp.clip(-cb * dyl * ica, dxl, dxh), dyl)
        qy1 = q_at(jnp.clip(-cb * dyh * ica, dxl, dxh), dyh)
        qmin = jnp.where(inside, 0.0,
                         jnp.minimum(jnp.minimum(qx0, qx1),
                                     jnp.minimum(qy0, qy1)))
        tau = 2.0 * jnp.log(jnp.maximum(op, 1e-12) * (1.0 / _ALPHA_MIN))
        hit = qmin <= tau + 1e-3    # small slack: never cull a kept pair

        valid = (pos < tot_ref[0]) & hit
        tile_i = jnp.where(valid, tile.astype(jnp.int32), num_tiles)
        # Every per-pair field goes out as its own (K/128, 128)-shaped
        # buffer — the TPU layout of a 1-D array — so the subsequent
        # lax.sort consumes them with NO relayout (extracting 1-D rows
        # from a packed 2-D output costs ~2 ms/row at P=3M in XLA).
        # bf16-valued attribute pairs are bit-packed two-per-lane
        # (PAIR_* layout) so the tile sort moves 6 payload rows, not 10.
        kb = EXP_K // 128
        tile_ref[...] = tile_i.reshape(kb, 128)
        gid_ref[...] = gid_sel.astype(jnp.int32).reshape(kb, 128)
        pair_rows = (
            attrs[ATTR_MX:ATTR_MX + 1],
            attrs[ATTR_MY:ATTR_MY + 1],
            _round_pack_bf16_pair(ca, cb),
            _round_pack_bf16_pair(cc, op),
            _round_pack_bf16_pair(attrs[ATTR_R:ATTR_R + 1],
                                  attrs[ATTR_G:ATTR_G + 1]),
            _round_pack_bf16_pair(attrs[ATTR_B:ATTR_B + 1],
                                  attrs[ATTR_ID:ATTR_ID + 1]),
        )
        for i in range(PAIR_ROWS):
            attr_refs[i][...] = pair_rows[i].reshape(kb, 128)

        tile_f = tile_i.astype(jnp.float32)
        tyi = jnp.floor((tile_f + 0.5) * (1.0 / grid_x)).astype(jnp.int32)
        txi = tile_i - tyi * grid_x
        ity = jax.lax.broadcasted_iota(jnp.int32, (gyp, EXP_K), 0)
        itx = jax.lax.broadcasted_iota(jnp.int32, (gxp, EXP_K), 0)
        oty = (ity == tyi).astype(jnp.float32)
        otx = (itx == txi).astype(jnp.float32)

        @pl.when(c == 0)
        def _():
            hist_ref[...] = jnp.zeros((gyp, gxp), jnp.float32)
        hist_ref[...] += jax.lax.dot_general(
            oty, otx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    return kernel


def _rect_geometry(proj: ProjectedGaussians, width: int, height: int,
                   tight: bool):
    grid_x, _ = grid_shape(width, height)
    if tight:
        xmin, ymin, xmax, ymax = tile_rect_tight(proj, width, height)
    else:
        xmin, ymin, xmax, ymax = tile_rect(proj.mean2d, proj.radius,
                                           width, height)
    nx = (xmax - xmin).astype(jnp.int32)
    counts = nx * (ymax - ymin).astype(jnp.int32)
    pack = ((ymin * grid_x + xmin) * RECT_PACK
            + jnp.minimum(nx, RECT_PACK - 1))
    return pack, counts


def _bin_sorted_core(spec, attrs10, depth_eff, pack_u, counts_u):
    """Index plumbing + attribute routing: original-order per-Gaussian
    attrs -> tile-sorted per-pair attrs. See module comment above."""
    width, height, p, v_cap, interpret = spec[:5]
    n = depth_eff.shape[0]
    assert p % EXP_K == 0, "pair_capacity must be a multiple of EXP_K"
    assert v_cap <= p
    grid_x, grid_y = grid_shape(width, height)
    num_tiles = grid_x * grid_y
    assert n < _F32_INT_MAX, "one-hot gid recovery needs N < 2^23"
    assert num_tiles * RECT_PACK + RECT_PACK < _F32_INT_MAX, \
        "rect packing needs num_tiles*256 < 2^23 (image <= ~3.4 Mpix)"

    # ONE stable N-sort by depth (empty-rect Gaussians sink to the tail so
    # the live prefix has strictly ascending offsets — no compaction sort),
    # carrying pack/counts/id and the 10 attribute rows as payloads.
    # The 8 bf16-valued attribute rows ride the N-sort bit-packed two per
    # payload lane (10 sort rows instead of 14; sorts only move payloads,
    # no arithmetic touches the packed patterns) and are unpacked right
    # after — the window tables need plain values for the MXU gather.
    srt = jax.lax.sort(
        (depth_eff, pack_u, counts_u,
         jnp.arange(n, dtype=jnp.int32),
         attrs10[ATTR_MX], attrs10[ATTR_MY],
         _round_pack_bf16_pair(attrs10[ATTR_CA], attrs10[ATTR_CB]),
         _round_pack_bf16_pair(attrs10[ATTR_CC], attrs10[ATTR_OP]),
         _round_pack_bf16_pair(attrs10[ATTR_R], attrs10[ATTR_G]),
         _round_pack_bf16_pair(attrs10[ATTR_B], attrs10[ATTR_ID])),
        dimension=0, is_stable=True, num_keys=1)
    pack, counts, gid = srt[1], srt[2], srt[3]
    ca_d, cb_d = unpack_bf16_rows(srt[6])
    cc_d, op_d = unpack_bf16_rows(srt[7])
    r_d, g_d = unpack_bf16_rows(srt[8])
    b_d, id_d = unpack_bf16_rows(srt[9])
    attrs_d = (srt[4], srt[5], ca_d, cb_d, cc_d, op_d, r_d, g_d, b_d, id_d)

    offsets, total = _exclusive_cumsum_i32(counts)
    n_pad = -(-(n + EXP_W) // _PACK_L) * _PACK_L
    off_pad = jnp.pad(offsets, (0, n_pad - n),
                      constant_values=_OFF_SENTINEL)
    compi = pack_lanes([off_pad], 8, n_pad, interpret)
    compf = pack_lanes(
        [(offsets % _LO_MOD).astype(jnp.float32),
         pack.astype(jnp.float32),
         gid.astype(jnp.float32)] + list(attrs_d),
        _CF_ROWS, n_pad, interpret)

    nb = p // EXP_K
    cpos = jnp.arange(nb, dtype=jnp.int32) * EXP_K
    c_tab = jnp.searchsorted(off_pad, cpos, side="left").astype(jnp.int32)
    s0 = (jnp.clip(c_tab - 1, 0, jnp.maximum(n - 1, 0)) // 128) * 128
    tot = jnp.minimum(total, p).astype(jnp.int32)[None]

    gyp = -(-grid_y // 8) * 8
    gxp = -(-grid_x // 128) * 128
    kb = EXP_K // 128
    pb = p // 128
    field = lambda dt: jax.ShapeDtypeStruct((pb, 128), dt)  # noqa: E731
    fspec = pl.BlockSpec((kb, 128), lambda c, *_: (c, 0),
                         memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _expand_attrs_kernel_factory(grid_x, grid_y, gyp, gxp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=[fspec, fspec,
                       pl.BlockSpec((gyp, gxp), lambda c, *_: (0, 0),
                                    memory_space=pltpu.VMEM)]
            + [fspec] * PAIR_ROWS,
            scratch_shapes=[
                pltpu.VMEM((2, 8, EXP_W), jnp.int32),
                pltpu.VMEM((2, _CF_ROWS, EXP_W), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[field(jnp.int32), field(jnp.int32),
                   jax.ShapeDtypeStruct((gyp, gxp), jnp.float32)]
        + [field(jnp.float32)] * PAIR_ROWS,
        interpret=interpret,
    )(s0, tot, compi, compf)
    # (p/128, 128) shares the TPU tiled layout of a flat (p,) array, so
    # these reshapes are free and lax.sort sees native 1-D operands.
    tile_ids = outs[0].reshape(-1)
    gidp = outs[1].reshape(-1)
    hist = outs[2]
    pattr_rows = [o.reshape(-1) for o in outs[3:]]

    counts_t = hist[:grid_y, :grid_x].reshape(num_tiles).astype(jnp.int32)
    ends = jnp.cumsum(counts_t).astype(jnp.int32)
    num_valid = ends[-1]
    tile_start = jnp.minimum(ends - counts_t, v_cap)
    tile_end = jnp.minimum(ends, v_cap)

    # ONE stable tile-key sort carrying gid + the PACKED attribute rows
    # (8 rows total instead of 12); culled and padding pairs
    # (tile == num_tiles) sink past every real pair.
    srt2 = jax.lax.sort(
        (tile_ids, gidp) + tuple(pattr_rows),
        dimension=0, is_stable=True, num_keys=1)
    gid_sorted = jax.lax.slice_in_dim(srt2[1], 0, v_cap)
    v_pad = v_cap + _COMPOSITE_PAD
    # The compositor's chunk stream: PAIR_ROWS packed rows padded to a
    # 16-row table. The table KEEPS 16 sublanes so the composite's
    # custom-VJP cotangent — written UNPACKED in ATTR_* row order by the
    # backward kernel — has the same (16, v_pad) shape as this input
    # (a private layout contract between bin_sorted's and the composite's
    # custom VJPs; only the first 8 sublanes are streamed forward).
    attrs16 = pack_lanes(list(srt2[2:2 + PAIR_ROWS]), _CF_ROWS, v_pad,
                         interpret)

    aux = dict(
        tile_start=tile_start,
        tile_end=tile_end,
        gid_sorted=gid_sorted,
        num_valid=num_valid,
        num_rect=total,
        overflow_rect=jnp.maximum(total - p, 0),
        overflow_valid=jnp.maximum(num_valid - v_cap, 0),
    )
    return attrs16, aux


# Lane padding appended past v_cap so the compositor's floored chunk DMAs
# stay in bounds; >= rasterize_pallas.CHUNK, and a multiple of the packing
# kernel's 1024-lane granularity so v_cap ladders stay packable.
_COMPOSITE_PAD = 1024


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _bin_sorted_pairs_vjp(spec, attrs10, depth_eff, pack_u, counts_u):
    return _bin_sorted_core(spec, attrs10, depth_eff, pack_u, counts_u)


def _bin_sorted_fwd(spec, attrs10, depth_eff, pack_u, counts_u):
    out = _bin_sorted_core(spec, attrs10, depth_eff, pack_u, counts_u)
    _, aux = out
    res = (attrs10.shape[0], attrs10.shape[1], depth_eff.shape,
           pack_u.shape, counts_u.shape,
           aux["gid_sorted"], aux["num_valid"])
    return out, res


def _bin_sorted_bwd(spec, res, cts):
    import numpy as np
    rows, n, d_shape, p_shape, c_shape, gid_sorted, num_valid = res
    interpret = spec[4]
    d16 = cts[0]                        # (16, v_pad) tile-sorted pair grads
    v_pad = d16.shape[1]
    # Row extraction / restacking of P-sized 2-D tables costs ~2 ms/row in
    # XLA (sublane relayouts); route through the Pallas un/packing kernels.
    d_rows = unpack_lanes(d16, ATTR_ROWS, interpret)
    gid_pad = jnp.pad(gid_sorted, (0, v_pad - gid_sorted.shape[0]),
                      constant_values=n)
    pair_pos = jnp.arange(v_pad, dtype=jnp.int32)
    key = jnp.where(pair_pos < num_valid, gid_pad, n)
    exact = spec[5] if len(spec) > 5 else False
    if exact:
        # Exact f32 routing: 11 sort rows. Used by parity tests and
        # debugging (rasterize(..., exact_grads=True)).
        sorted_back = jax.lax.sort(
            (key,) + tuple(d_rows),
            dimension=0, is_stable=False, num_keys=1)
        d_pairs = pack_lanes(list(sorted_back[1:]), 16, v_pad, interpret)
    else:
        # DEFAULT: per-pair cotangents ride the id sort bf16-packed
        # two-per-lane (6 sort rows instead of 11; the sort is the dominant
        # backward-plumbing cost and scales linearly in rows). Each pair's
        # contribution is RTNE-rounded to ~2^-9 relative before the
        # per-Gaussian sum — bounded by 2^-8 * sum|cotangents| per output
        # (tests/test_pallas_vs_oracle.py asserts this bound), far below
        # minibatch gradient noise; the f32 segment reduction is unchanged.
        sorted_back = jax.lax.sort(
            (key,
             _round_pack_bf16_pair(d_rows[0], d_rows[1]),
             _round_pack_bf16_pair(d_rows[2], d_rows[3]),
             _round_pack_bf16_pair(d_rows[4], d_rows[5]),
             _round_pack_bf16_pair(d_rows[6], d_rows[7]),
             _round_pack_bf16_pair(d_rows[8], d_rows[9])),
            dimension=0, is_stable=False, num_keys=1)
        unp = [unpack_bf16_rows(r) for r in sorted_back[1:]]
        d_pairs = pack_lanes([row for pair in unp for row in pair], 16,
                             v_pad, interpret)
    d_attrs = segment_reduce(d_pairs, sorted_back[0], num_valid, n,
                             interpret=interpret)[:rows]
    f0 = jax.dtypes.float0
    return (d_attrs, jnp.zeros(d_shape, jnp.float32),
            np.zeros(p_shape, f0), np.zeros(c_shape, f0))


_bin_sorted_pairs_vjp.defvjp(_bin_sorted_fwd, _bin_sorted_bwd)


def bin_sorted_pairs(proj: ProjectedGaussians, width: int, height: int,
                     pair_capacity: int, valid_capacity: int | None = None,
                     interpret: bool | None = None, tight: bool = True,
                     exact_grads: bool = False):
    """Bin + depth/tile sort + per-pair attribute routing in one pass.

    Returns (attrs16, aux): attrs16 is the (16, valid_capacity + 256)
    tile-sorted packed pair-attribute array the Pallas compositor consumes
    directly; aux holds tile ranges (clamped to valid_capacity), the
    tile-sorted gaussian ids, and pair accounting (num_valid/num_rect and
    the two overflow counters). Differentiable w.r.t. the Gaussian
    attributes; the VJP is the sort-back + segment reduction."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if valid_capacity is None:
        valid_capacity = pair_capacity
    pack_u, counts_u = _rect_geometry(proj, width, height, tight)
    depth_eff = jnp.where(counts_u > 0, proj.depth, jnp.inf)
    attrs10 = pack_attributes(proj)
    spec = (width, height, int(pair_capacity), int(valid_capacity),
            bool(interpret), bool(exact_grads))
    return _bin_sorted_pairs_vjp(spec, attrs10, depth_eff, pack_u, counts_u)


# --- 1-D rows -> sublane-packed 2-D table (Pallas) -------------------------
#
# XLA materializes `stack([r0, r1, ...])` / `concatenate([r[None] ...])` of
# 1-D TPU arrays as one sublane relayout per row (~3 ms/row at P=3M — the
# dominant cost of the fused binning path when done in XLA). A (k,) array
# and its (k/128, 128) reshape share the TPU tiled layout (free bitcast),
# so this kernel instead streams each row's (8, 128) blocks and writes them
# into the packed (rows, k) table with static sublane moves — pure
# bandwidth.

_PACK_L = 1024  # lanes per grid step (one (8, 128) block per input row)


def _pack_rows_kernel_factory(n_in: int, out_rows: int):
    def kernel(*refs):
        ins = refs[:n_in]
        out = refs[n_in]

        for r in range(n_in):
            blk = ins[r][...]                      # (8, 128)
            for j in range(8):
                out[r:r + 1, j * 128:(j + 1) * 128] = blk[j:j + 1, :]
        if n_in < out_rows:
            out[n_in:out_rows, :] = jnp.zeros(
                (out_rows - n_in, _PACK_L), out.dtype)

    return kernel


def pack_lanes(rows, out_rows: int, out_len: int,
               interpret: bool | None = None) -> jnp.ndarray:
    """Pack 1-D arrays into a zero-padded (out_rows, out_len) table.

    Rows shorter than out_len are zero-extended; longer ones truncated.
    out_len must be a multiple of 1024."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert out_len % _PACK_L == 0
    assert len(rows) <= out_rows
    dtype = rows[0].dtype
    padded = []
    for r in rows:
        k = r.shape[0]
        if k < out_len:
            r = jnp.pad(r, (0, out_len - k))
        elif k > out_len:
            r = jax.lax.slice_in_dim(r, 0, out_len)
        padded.append(r.reshape(out_len // 128, 128))
    nb = out_len // _PACK_L
    out = pl.pallas_call(
        _pack_rows_kernel_factory(len(rows), out_rows),
        grid=(nb,),
        in_specs=[pl.BlockSpec((8, 128), lambda c: (c, 0))
                  for _ in rows],
        out_specs=pl.BlockSpec((out_rows, _PACK_L), lambda c: (0, c)),
        out_shape=jax.ShapeDtypeStruct((out_rows, out_len), dtype),
        interpret=interpret,
    )(*padded)
    return out


def _unpack_rows_kernel_factory(n_out: int):
    def kernel(*refs):
        inp = refs[0]
        outs = refs[1:]
        for r in range(n_out):
            for j in range(8):
                outs[r][j:j + 1, :] = inp[r:r + 1, j * 128:(j + 1) * 128]

    return kernel


def unpack_lanes(table: jnp.ndarray, n_out: int,
                 interpret: bool | None = None) -> list[jnp.ndarray]:
    """Inverse of :func:`pack_lanes`: rows of a packed (rows, L) table as
    1-D arrays (returned in the TPU-native (L/128, 128) layout, reshaped
    flat for free)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    rows, length = table.shape
    assert length % _PACK_L == 0 and n_out <= rows
    nb = length // _PACK_L
    outs = pl.pallas_call(
        _unpack_rows_kernel_factory(n_out),
        grid=(nb,),
        in_specs=[pl.BlockSpec((rows, _PACK_L), lambda c: (0, c))],
        out_specs=[pl.BlockSpec((8, 128), lambda c: (c, 0))
                   for _ in range(n_out)],
        out_shape=[jax.ShapeDtypeStruct((length // 128, 128), table.dtype)
                   for _ in range(n_out)],
        interpret=interpret,
    )(table)
    return [o.reshape(-1) for o in outs]
