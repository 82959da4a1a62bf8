"""Pallas TPU tile rasterizer: front-to-back alpha compositing with an
analytic custom-VJP backward.

This is the TPU-native replacement for the reference's CUDA
`diff-gaussian-rasterization` render/backward kernels (SURVEY.md §2.9.1).
Design (per SURVEY.md §7.3 / BASELINE.json north star):

  * binning + depth sort happen in XLA (ops/binning.py) with a static pair
    capacity; this module consumes the depth-sorted packed pair attributes
    `attrs` of shape (16, P_pad): attribute rows on sublanes, pairs on lanes,
    so chunk DMAs are tile-aligned (chunk starts are floored to CHUNK and
    out-of-range pairs masked — the kernel-side equivalent of the CUDA
    range loop).
  * the FORWARD kernel runs a sequential grid over 16×16 tiles. Each grid
    step DMA-streams its tile's sorted pairs from HBM in chunks of CHUNK,
    computes the (PIX, CHUNK) alpha matrix on the VPU, the ordered
    transmittance scan with a log-step roll-multiply (Hillis–Steele) along
    the pair axis, and colour/inverse-depth accumulation as MXU
    contractions. Early termination skips chunks once every pixel's
    transmittance is below 1e-4 (CUDA parity).
  * the BACKWARD kernel re-runs the sweep in forward order, converting the
    reverse-order CUDA formulation into prefix sums: with the forward totals
    (C, D, T_fin) saved, the suffix Σ_{j>k} w_j ρ_j needed by dα_k is
    R_total − prefix, where ρ folds all colour/depth cotangents into one
    per-(pixel, pair) field — one extra scan per chunk instead of a reverse
    sweep. Per-pair gradients are written back to HBM with
    read-modify-write chunks (the sequential grid makes the inter-tile
    overlap at aligned chunk boundaries safe); the pair→Gaussian reduction
    is the autodiff VJP of the attribute gather (an XLA scatter-add).

Compositing semantics match the oracle (ops/reference.py) and the CUDA
renderer: alpha = min(0.99, op·exp(power)), skip if power>0 or alpha<1/255,
stop before the pair that would drop transmittance below 1e-4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import binning
from .projection import TILE, ProjectedGaussians, round_bf16

ALPHA_MAX = 0.99
ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
CHUNK = 128          # pairs per compute sub-chunk (multiple of 128).
                     # kernel_ab @1M: 128 ≈ 53.4 ms fwd+bwd, 256 = 55.1,
                     # 512 = 71.4 — smaller chunks halve the floor-to-CHUNK
                     # alignment waste (~0.5 chunk/tile) and the scan
                     # matmul FLOPs, outweighing the extra grid steps.
SUB = 1              # sub-chunks per DMA block. The ~1 µs/chunk fixed cost
                     # (while-loop iteration + DMA wait) was the measured
                     # compositor bound (PERF.md); one BLOCK = SUB·CHUNK
                     # DMA per loop iteration amortises it while each
                     # transmittance scan stays a (PIX, CHUNK)×(CHUNK,
                     # CHUNK) matmul — avoiding the K² scan blowup that
                     # made a plain CHUNK=256 lose.
PIX = TILE * TILE    # 256 pixels per tile
NROW = binning.ATTR_ROWS
ROWS = 16            # gradient rows (ATTR_* order) padded to a tile multiple
IN_ROWS = 8          # bit-packed pair-attr rows streamed in (PAIR_* layout
                     # padded from 6 to the f32 sublane-tile minimum of 8) —
                     # the attrs table itself is (16, P) to match the
                     # unpacked gradient cotangent's shape, but the kernels
                     # only DMA its first 8 sublanes


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _tri(k: int, strict: bool = False) -> jnp.ndarray:
    """Upper-triangular ones (k, k): x @ _tri = inclusive cumsum along lanes
    (strict=True drops the diagonal -> exclusive cumsum).

    Scans along the pair axis are expressed as one (PIX, K) x (K, K) MXU
    matmul instead of a log-step VPU shuffle chain — the scan is the
    dominant per-chunk VPU cost otherwise, and on the MXU it is ~free.
    """
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    return ((r < c) if strict else (r <= c)).astype(jnp.float32)


def _dot2(x, y, dims):
    """dot_general with a 2-limb bf16 split of `x` — exact to ~2^-17 where
    the MXU's DEFAULT precision would truncate f32 operands to bf16
    (~2^-8). `y` must be exactly representable in bf16 (0/1 triangular
    masks, bf16-valued attribute rows): then each partial product is
    exact and only the f32 accumulation rounds. Two DEFAULT passes cost a
    third of HIGHEST's six.

    This is REQUIRED on-chip, not a nicety: with DEFAULT dots the
    transmittance scans and colour accumulations drift ~0.4% and the
    render diverges from the oracle by ~1e-2 (found by
    tools/tpu_parity_check.py; interpret-mode tests run f32 and pass).
    """
    x_hi = round_bf16(x)
    x_lo = x - x_hi
    return (jax.lax.dot_general(
                x_hi, y, dims, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
                x_lo, y, dims, preferred_element_type=jnp.float32))


def _cumsum1(x):
    """Inclusive cumsum along axis 1 via triangular MXU matmul."""
    return _dot2(x, _tri(x.shape[1]), (((1,), (0,)), ((), ())))


# ln2 split: the hi limb has its low 12 mantissa bits zero, so k * _LN2_HI
# is EXACT for the small integer k of the range reductions below; the lo
# limb restores full f64-grade ln2.
_LN2_HI = np.float32(0.693145751953125)
_LN2_LO = np.float32(1.4286068203094172e-06)
_INV_LN2 = np.float32(1.4426950408889634)


def _pexp(x):
    """Accurate f32 exp for x in [-88, 0]: range-reduce by ln2 (two-limb,
    exact) + degree-7 Taylor on [-ln2/2, ln2/2] + exponent bit-scale.

    The platform's VPU exp carries ~5e-6 relative error (measured on-chip
    2026-08); through the compositor's transmittance it was the residual
    final_T parity gap once `_plog` fixed the log. Error here ~1e-7
    relative. Mosaic-safe (floor, bitcast, integer add, FMAs).

    Inputs are clamped to [-87, 0]: the exponent bit-scale wraps outside
    f32 normal range, and the compositor's log-transmittance argument is
    mathematically <= 0 but can reach ~-600 on fully-opaque chunks (any
    T below exp(-87) ~ 1.6e-38 is dead — far under T_EPS).
    """
    x = jnp.clip(x, -87.0, 0.0)
    k = jnp.floor(x * _INV_LN2 + 0.5)
    f = (x - k * _LN2_HI) - k * _LN2_LO
    # Horner e^f, |f| <= 0.3466: truncation ~5e-9 relative.
    p = 1.0 + f * (1.0 + f * (0.5 + f * (
        1.0 / 6.0 + f * (1.0 / 24.0 + f * (
            1.0 / 120.0 + f * (1.0 / 720.0 + f * (1.0 / 5040.0)))))))
    u = jax.lax.bitcast_convert_type(p, jnp.int32)
    return jax.lax.bitcast_convert_type(
        u + (k.astype(jnp.int32) << 23), jnp.float32)


SCAN_MUL = False     # transmittance scan implementation: True = in-chunk
                     # Hillis-Steele roll-multiply cumprod (pure f32
                     # multiplies — same rounding structure as the
                     # oracle/CUDA cumprod, no transcendentals); False =
                     # exp(cumsum(log)) on the MXU with `_plog`/`_pexp`
                     # (the platform log/exp built-ins are too coarse —
                     # see those docstrings). Both are parity-clean; the
                     # multiply scan costs ~21 VPU passes/chunk vs ~38 for
                     # the polynomial transcendentals (kernel_ab).


def _cumprod_incl(x):
    """Inclusive cumprod along the lane axis via log-step roll-multiply.

    K = x.shape[1] steps of: multiply by self shifted right by s lanes
    (1-filled). Pure multiplies — error ~log2(K) ULP per element, and
    bit-structurally the same accumulation as the oracle's `jnp.cumprod`,
    so kernel-vs-oracle transmittance tracks to float noise.
    """
    k = x.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < k:
        x = x * jnp.where(lane < s, 1.0, pltpu.roll(x, s, 1))
        s *= 2
    return x


def _plog(x):
    """Accurate f32 log for x in (0, 2): bit-decomposition + atanh series.

    The platform's `jnp.log` VPU approximation carries ~1.1e-4 absolute
    error (measured on-chip 2026-08; it was ~1e-7 when the exp/log scan
    formulation was parity-validated in r03) — through the transmittance
    scan exp(cumsum(log(1-a))) that inflates render error to ~9e-4 vs the
    cumprod oracle. This routine reduces x = m * 2^k (pure bit ops, exact),
    maps m to [sqrt(1/2), sqrt(2)) and evaluates log(m) = 2*atanh(t),
    t = (m-1)/(m+1), |t| <= 0.1716, with a 5-term odd series (truncation
    ~7e-10; net error ~1e-7 abs). log(1) == 0 exactly, which keeps masked
    lanes (a_eff = 0) exact in the scan. Mosaic-safe: bitcasts, integer
    ops, one divide, fused mul-adds.
    """
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    k = (u >> 23).astype(jnp.int32) - 127
    m = jax.lax.bitcast_convert_type(
        (u & jnp.uint32(0x007FFFFF)) | jnp.uint32(0x3F800000), jnp.float32)
    big = m > 1.4142135
    m = jnp.where(big, 0.5 * m, m)
    k = k + big.astype(jnp.int32)
    t = (m - 1.0) / (m + 1.0)
    t2 = t * t
    p = 2.0 * t * (1.0 + t2 * (1.0 / 3.0 + t2 * (
        1.0 / 5.0 + t2 * (1.0 / 7.0 + t2 * (1.0 / 9.0)))))
    kf = k.astype(jnp.float32)
    return kf * _LN2_HI + (p + kf * _LN2_LO)


def _cumsum0(x):
    """Exclusive cumsum along axis 1 via strict-triangular MXU matmul."""
    return _dot2(x, _tri(x.shape[1], strict=True), (((1,), (0,)), ((), ())))


def _pixel_coords(t, grid_x):
    """Pixel centres of tile t as (PIX, 1) f32 columns (x and y)."""
    tx = t % grid_x
    ty = t // grid_x
    pix = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + pix % TILE).astype(jnp.float32)
    py = (ty * TILE + pix // TILE).astype(jnp.float32)
    return px, py


def _unpack_chunk(chunk):
    """(IN_ROWS, CHUNK) packed pair rows -> individual (1, K) attr rows.

    Rows follow binning.PAIR_*: f32 mean2d plus four bf16-packed lanes
    (conic a|b, conic c|opacity, R|G, B|invdepth). Pure bit ops on the VPU.
    """
    mx = chunk[binning.PAIR_MX:binning.PAIR_MX + 1, :]
    my = chunk[binning.PAIR_MY:binning.PAIR_MY + 1, :]
    hi, lo = binning.unpack_bf16_rows(
        chunk[binning.PAIR_CACB:binning.PAIR_BID + 1, :])
    ca, cc, r, b = hi[0:1], hi[1:2], hi[2:3], hi[3:4]
    cb, op, g_, invd = lo[0:1], lo[1:2], lo[2:3], lo[3:4]
    rgb3 = jnp.concatenate([r, g_, b], axis=0)      # (3, K)
    return mx, my, ca, cb, cc, op, rgb3, invd


def _chunk_alpha(unpacked, px, py, base, start, end):
    """Alpha matrix + validity for one sub-chunk starting at pair `base`.

    unpacked: the _unpack_chunk tuple. Returns (PIX, CHUNK) fields.
    """
    mx, my, ca, cb, cc, op, _, _ = unpacked
    dx = px - mx  # (PIX, K)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    raw = op * g
    alpha = jnp.minimum(ALPHA_MAX, raw)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
    pos = base + lane
    in_range = (pos >= start) & (pos < end)  # (1, K)
    keep = in_range & (power <= 0.0) & (alpha >= ALPHA_MIN)
    a_eff = jnp.where(keep, alpha, 0.0)
    return a_eff, keep, g, raw, dx, dy


def _tile_range(start_ref, end_ref, t):
    """Block walk for tile t (one block = SUB·CHUNK pairs, one DMA). Block
    starts are floored to CHUNK alignment: Mosaic requires lane-dim HBM DMA
    slices to be 128-aligned (an exact tile_start DMA start is rejected at
    compile time), so each tile pays up to one partially-masked leading
    sub-chunk."""
    start = start_ref[t]
    end = end_ref[t]
    astart = pl.multiple_of((start // CHUNK) * CHUNK, CHUNK)
    nblocks = jnp.where(end > start, pl.cdiv(end - astart, CHUNK * SUB), 0)
    return astart, start, end, nblocks


def _fwd_kernel(tid_ref, start_ref, end_ref, attrs_hbm, color_ref, invd_ref,
                t_ref, chunk_ref, sem, *, grid_x):
    """Forward compositing for one tile, double-buffered.

    Early termination is a REAL loop exit (lax.while_loop), not masking:
    once every pixel's transmittance is below 1e-4 the remaining chunks'
    DMAs and compute are skipped entirely. The pipeline keeps one chunk of
    lookahead (body(i) issues i+1's copy before computing i), so at most
    one prefetched DMA is outstanding at exit; the epilogue drains it
    before the next tile reuses the buffers.

    Cross-tile prefetch: with ~2 chunks per tile on real scenes, the
    pipeline never warms up within a tile — each tile would pay a full
    HBM DMA latency on its first chunk. The epilogue of tile t therefore
    issues tile t+1's chunk-0 copy (into slot 0, which t has fully
    consumed), overlapping that latency with the sequential grid's own
    output writeback; only tile 0 cold-starts.
    """
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    blk = CHUNK * SUB
    astart, start, end, nchunks = _tile_range(start_ref, end_ref, t)
    px, py = _pixel_coords(tid_ref[t], grid_x)

    def dma_at(a, slot):
        return pltpu.make_async_copy(
            attrs_hbm.at[0:IN_ROWS, pl.ds(a, blk)],
            chunk_ref.at[slot], sem.at[slot])

    def dma(i, slot):
        return dma_at(astart + i * blk, slot)

    @pl.when((t == 0) & (nchunks > 0))
    def _():
        dma(0, 0).start()

        @pl.when(nchunks > 1)
        def _():
            dma(1, 1).start()

    # Carry: multiplicative transmittance R (SCAN_MUL) or its log S.
    c_eps = np.float32(T_EPS) if SCAN_MUL else np.float32(np.log(T_EPS))
    c_init = np.float32(1.0) if SCAN_MUL else np.float32(0.0)

    def cond(carry):
        i, S, *_ = carry
        return (i < nchunks) & jnp.any(S >= c_eps)

    def body(carry):
        i, S, Tm, C, D = carry  # (PIX,1), (PIX,1), (PIX,3), (PIX,1)
        slot = jax.lax.rem(i, 3)

        @pl.when(i + 2 < nchunks)
        def _():
            # Two-deep lookahead over a 3-slot rotation: block i+2's copy
            # reuses block i-1's buffer (already consumed).
            dma(i + 2, jax.lax.rem(i + 2, 3)).start()

        dma(i, slot).wait()
        # SUB sequential sub-chunks per block (trace-time unroll): one DMA
        # wait and one loop iteration amortise over SUB scan/accumulate
        # passes. A sub-chunk fully past `end` is masked to a_eff = 0 and
        # contributes nothing (log 1 = 0 keeps the scan exact).
        for j in range(SUB):
            unpacked = _unpack_chunk(
                chunk_ref[slot][:, j * CHUNK:(j + 1) * CHUNK])
            a_eff, keep, _, _, _, _ = _chunk_alpha(
                unpacked, px, py, astart + i * blk + j * CHUNK, start, end)
            one_m = 1.0 - a_eff
            # Transmittance scan (see SCAN_MUL). t_ex is the EXCLUSIVE
            # (before-pair) T, incl the inclusive (after-pair) T.
            if SCAN_MUL:
                incl = S * _cumprod_incl(one_m)
                lane2 = jax.lax.broadcasted_iota(jnp.int32, incl.shape, 1)
                t_ex = jnp.where(lane2 == 0, S, pltpu.roll(incl, 1, 1))
            else:
                # cumprod = exp(cumsum(log)); the cumsum rides the MXU.
                # The carry S stays in LOG space so the exp error (even
                # _pexp's ~1e-7) does not compound across chunks.
                log_om = _plog(one_m)
                cs = _cumsum0(log_om)
                t_ex = _pexp(S + cs)              # (PIX, K) before-pair T
                incl = t_ex * one_m               # after-pair T
            live = incl >= T_EPS
            w = jnp.where(live, a_eff * t_ex, 0.0)
            contract = (((1,), (1,)), ((), ()))
            # rgb/invdepth rows are bf16-valued by spec: the 2-limb split
            # of w makes these accumulations exact (see _dot2). One fused
            # (4, K) contraction — a separate 1-row invdepth dot lowers to
            # a Mosaic multi_reduction that rejects non-constant
            # accumulators.
            rgbd = jnp.concatenate([unpacked[6], unpacked[7]],
                                   axis=0)       # (4, K)
            acc = _dot2(w, rgbd, contract)       # (PIX, 4)
            C = C + acc[:, 0:3]
            D = D + acc[:, 3:4]
            if SCAN_MUL:
                S = incl[:, -1:]
            else:
                S = S + (cs[:, -1:] + log_om[:, -1:])  # inclusive log-total
            # Masked final transmittance: `incl` is non-increasing along
            # the pair axis, so `live` is a PREFIX and the transmittance at
            # the last live pair is simply the smallest live `incl` — a
            # masked min instead of a second exp/log round trip (cheaper
            # AND exact).
            Tm = jnp.minimum(
                Tm, jnp.min(jnp.where(live, incl, jnp.inf),
                            axis=1, keepdims=True))
        return i + 1, S, Tm, C, D

    S0 = jnp.full((PIX, 1), c_init, jnp.float32)
    C0 = jnp.zeros((PIX, 3), jnp.float32)
    D0 = jnp.zeros((PIX, 1), jnp.float32)
    i_fin, _, Tm, C, D = jax.lax.while_loop(
        cond, body, (jnp.int32(0), S0, jnp.ones((PIX, 1), jnp.float32),
                     C0, D0))
    color_ref[0] = C
    invd_ref[0] = D
    t_ref[0] = Tm

    # Drain the lookahead copies issued past the exit point.
    @pl.when(i_fin < nchunks)
    def _():
        dma(i_fin, jax.lax.rem(i_fin, 3)).wait()

    @pl.when(i_fin + 1 < nchunks)
    def _():
        dma(i_fin + 1, jax.lax.rem(i_fin + 1, 3)).wait()

    # Cross-tile prefetch: start tile t+1's first two chunks (slots 0/1
    # are quiesced — every copy into them has been waited by now).
    @pl.when(t + 1 < nt)
    def _():
        astart2, _, _, nchunks2 = _tile_range(start_ref, end_ref, t + 1)

        @pl.when(nchunks2 > 0)
        def _():
            dma_at(astart2, 0).start()

        @pl.when(nchunks2 > 1)
        def _():
            # Block 1 starts one full DMA block (CHUNK*SUB pairs) past
            # astart2 — must match the blk stride used by dma(i, slot).
            dma_at(astart2 + CHUNK * SUB, 1).start()


def _bwd_kernel(tid_ref, start_ref, end_ref, attrs_hbm, dC_ref, dD_ref,
                dT_ref, ctot_ref, dtot_ref, tfin_ref, dattrs_in_hbm,
                dattrs_hbm, chunk_ref, gchunk_ref, sem, gsem, wsem, *,
                grid_x):
    """Backward sweep, double-buffered like the forward.

    Per chunk: read the attrs chunk AND the current grad chunk
    (read-modify-write — lanes owned by neighbouring tiles at aligned-chunk
    overlaps must be preserved), compute per-pair gradients, write the
    merged grad chunk back. Reads for chunk i+1 are issued while chunk i
    computes; the write of chunk i drains while i+1 computes (its slot is
    reclaimed at i+2). Within one tile all chunk ranges are disjoint, so
    the only write→read hazard is across grid steps (tiles sharing an
    aligned chunk), handled by the epilogue waits. Early termination is a
    real loop exit: `dattrs` arrives ZERO-INITIALISED (donated by the
    caller via input_output_aliases), so chunks behind full saturation —
    whose gradients are all zero — are never read, computed, or written.

    Cross-tile prefetch (see _fwd_kernel): the epilogue issues tile t+1's
    chunk-0 attrs read as soon as possible, and its grad read only AFTER
    this tile's grad writes have drained — adjacent tiles may share a
    floored chunk, so the grad read must observe this tile's RMW."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    blk = CHUNK * SUB
    astart, start, end, nchunks = _tile_range(start_ref, end_ref, t)
    px, py = _pixel_coords(tid_ref[t], grid_x)

    dC = dC_ref[0]      # (PIX, 3)
    dD = dD_ref[0]      # (PIX, 1)
    dT = dT_ref[0]      # (PIX, 1)
    tfin = tfin_ref[0]  # (PIX, 1)
    # R_total = Σ_c dC_c·C_total_c + dD·D_total per pixel: (PIX, 1).
    r_total = (jnp.sum(dC * ctot_ref[0], axis=1, keepdims=True)
               + dD * dtot_ref[0])
    dt_tfin = dT * tfin  # (PIX, 1)

    def rdma_at(a, slot):
        return pltpu.make_async_copy(
            attrs_hbm.at[0:IN_ROWS, pl.ds(a, blk)],
            chunk_ref.at[slot], sem.at[slot])

    def gdma_at(a, slot):
        return pltpu.make_async_copy(
            dattrs_hbm.at[:, pl.ds(a, blk)],
            gchunk_ref.at[slot], gsem.at[slot])

    def rdma(i, slot):
        return rdma_at(astart + i * blk, slot)

    def gdma(i, slot):
        return gdma_at(astart + i * blk, slot)

    def wdma(i, slot):
        return pltpu.make_async_copy(
            gchunk_ref.at[slot],
            dattrs_hbm.at[:, pl.ds(astart + i * blk, blk)],
            wsem.at[slot])

    # Only chunk 0 can straddle a neighbouring tile's pair range (chunk
    # starts are floored to CHUNK); interior chunks are wholly owned and
    # sit on zero-initialised storage, so they are WRITTEN directly with
    # non-owned lanes zeroed — no grad read at all. Chunk 0 needs the RMW
    # read only when the floor actually moved its start (astart < start).
    need_rmw = astart < start

    @pl.when((t == 0) & (nchunks > 0))
    def _():
        rdma(0, 0).start()

        @pl.when(nchunks > 1)
        def _():
            rdma(1, 1).start()

        @pl.when(need_rmw)
        def _():
            gdma(0, 0).start()

    c_eps = np.float32(T_EPS) if SCAN_MUL else np.float32(np.log(T_EPS))
    c_init = np.float32(1.0) if SCAN_MUL else np.float32(0.0)

    def cond(carry):
        i, S, _ = carry
        return (i < nchunks) & jnp.any(S >= c_eps)

    def body(carry):
        i, S, r_pref = carry  # S: (PIX,1) log of the unmasked kept-product
        rslot = jax.lax.rem(i, 3)
        slot = jax.lax.rem(i, 2)

        @pl.when(i >= 2)
        def _():
            # Grad slot `slot` was written out at step i-2; reclaim it
            # before overwriting the buffer below.
            wdma(i - 2, slot).wait()

        @pl.when(i + 2 < nchunks)
        def _():
            # Two-deep attrs lookahead over a 3-slot rotation.
            rdma(i + 2, jax.lax.rem(i + 2, 3)).start()

        rdma(i, rslot).wait()

        @pl.when((i == 0) & need_rmw)
        def _():
            gdma(0, 0).wait()

        def compute(carry, j):
            S, r_pref = carry
            unpacked = _unpack_chunk(
                chunk_ref[rslot][:, j * CHUNK:(j + 1) * CHUNK])
            a_eff, keep, g, raw, dx, dy = _chunk_alpha(
                unpacked, px, py, astart + i * blk + j * CHUNK, start, end)
            one_m = 1.0 - a_eff
            # The scan must track the forward EXACTLY so live/keep masks
            # and weights match (see _fwd_kernel note).
            if SCAN_MUL:
                incl = S * _cumprod_incl(one_m)
                lane2 = jax.lax.broadcasted_iota(jnp.int32, incl.shape, 1)
                t_ex = jnp.where(lane2 == 0, S, pltpu.roll(incl, 1, 1))
            else:
                log_om = _plog(one_m)
                cs = _cumsum0(log_om)
                t_ex = _pexp(S + cs)              # before-pair T
                incl = t_ex * one_m               # after-pair T
            live = incl >= T_EPS
            w = jnp.where(live, a_eff * t_ex, 0.0)  # (PIX, K)

            # ρ(pix, k) = Σ_c dC_c·c_k_c + dD·d_k — folds all cotangents.
            rho = _dot2(dC, unpacked[6],
                        (((1,), (0,)), ((), ()))) + dD * unpacked[7]
            wrho = w * rho
            cum_wrho = _cumsum1(wrho)                       # inclusive prefix
            suffix = r_total - r_pref - cum_wrho            # Σ_{j>k} w_j ρ_j
            g_alpha = jnp.where(
                live & keep,
                t_ex * rho - (suffix + dt_tfin) / one_m,
                0.0)                                        # (PIX, K)
            # Through alpha = min(0.99, op·G): the clamp kills the gradient.
            g_alpha = jnp.where(raw < ALPHA_MAX, g_alpha, 0.0)

            d_power = a_eff * g_alpha                                # = op·G·gα
            # The six pixel-reductions (d_op/d_mx/d_my/d_ca/d_cb/d_cc) are
            # all Σ_pix d_power·poly(dx, dy): with tile-LOCAL pixel coords
            # u,v ∈ {0..15} (so the moment matrix rows 1,u,v,u²,uv,v² are
            # bf16-EXACT integers ≤ 225), they reduce to ONE (6, PIX) x
            # (PIX, K) MXU contraction of d_power's moments plus cheap
            # per-pair algebra — replacing ~10 (PIX, K) VPU passes and six
            # log-step sublane reductions. d_power rides a 2-limb bf16
            # split (DEFAULT dots) for ~2^-16 relative accuracy.
            pixc = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
            u = (pixc % TILE).astype(jnp.float32)              # (1, PIX)
            v = (pixc // TILE).astype(jnp.float32)             # (1, PIX)
            mom = jnp.concatenate(
                [jnp.ones((1, PIX), jnp.float32), u, v,
                 u * u, u * v, v * v], axis=0)                 # (6, PIX)
            dp_hi = round_bf16(d_power)
            dp_lo = d_power - dp_hi
            cpix = (((1,), (0,)), ((), ()))
            M = (jax.lax.dot_general(
                     mom, dp_hi, cpix, preferred_element_type=jnp.float32)
                 + jax.lax.dot_general(
                     mom, dp_lo, cpix,
                     preferred_element_type=jnp.float32))       # (6, K)
            s00, s10, s01, s20, s11, s02 = (M[r:r + 1] for r in range(6))
            # tile-local mean: dx = u - mxl, dy = v - myl.
            tloc = tid_ref[t]
            tx0 = ((tloc % grid_x) * TILE).astype(jnp.float32)
            ty0 = ((tloc // grid_x) * TILE).astype(jnp.float32)
            mxl = unpacked[0] - tx0
            myl = unpacked[1] - ty0
            e10 = s10 - mxl * s00               # Σ d_power·dx
            e01 = s01 - myl * s00               # Σ d_power·dy
            e20 = s20 - 2.0 * mxl * s10 + mxl * mxl * s00
            e11 = s11 - mxl * s01 - myl * s10 + mxl * myl * s00
            e02 = s02 - 2.0 * myl * s01 + myl * myl * s00
            _, _, ca, cb, cc, op, _, _ = unpacked
            d_op = s00 / jnp.maximum(op, 1e-12)  # g·gα = d_power/op
            d_mx = ca * e10 + cb * e01
            d_my = cc * e01 + cb * e10
            d_ca = -0.5 * e20
            d_cb = -e11
            d_cc = -0.5 * e02
            contract = (((0,), (0,)), ((), ()))
            # One fused (4, K) contraction (see the forward's rgbd note);
            # dC/dD ride the 2-limb split, w's own low bits only meet the
            # low limb (error ~2^-16 relative, inside the grad spec).
            dCD = jnp.concatenate([dC, dD], axis=1)      # (PIX, 4)
            d_rgbd = _dot2(dCD, w, contract)             # (4, K)
            d_rgb = d_rgbd[0:3]
            d_id = d_rgbd[3:4]

            new_g = jnp.concatenate(
                [d_mx, d_my, d_ca, d_cb, d_cc, d_op, d_rgb, d_id,
                 jnp.zeros((ROWS - NROW, CHUNK), jnp.float32)], axis=0)
            if SCAN_MUL:
                S = incl[:, -1:]
            else:
                S = S + (cs[:, -1:] + log_om[:, -1:])
            r_pref = r_pref + cum_wrho[:, -1:]
            return new_g, S, r_pref

        # SUB sequential sub-chunks per block (see _fwd_kernel): one grad
        # block assembled from SUB (ROWS, CHUNK) panels, written with ONE
        # DMA.
        panels = []
        for j in range(SUB):
            new_g, S, r_pref = compute((S, r_pref), j)
            panels.append(new_g)
        new_g = panels[0] if SUB == 1 else jnp.concatenate(panels, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        pos = astart + i * blk + lane
        owned = (pos >= start) & (pos < end)
        # Chunk 0 with RMW merges over the read; all other chunks zero the
        # non-owned lanes (a later tile that owns them RMW-merges over our
        # zeros, and never-owned padding lanes are masked out of the
        # reduction by the num_valid key clamp).
        keep_prev = (i == 0) & need_rmw
        gchunk_ref[slot] = jnp.where(
            owned, new_g,
            jnp.where(keep_prev, gchunk_ref[slot], 0.0))
        wdma(i, slot).start()
        return i + 1, S, r_pref

    S0 = jnp.full((PIX, 1), c_init, jnp.float32)
    R0 = jnp.zeros((PIX, 1), jnp.float32)
    i_fin, _, _ = jax.lax.while_loop(cond, body, (jnp.int32(0), S0, R0))

    # Drain outstanding writes before the next tile (which may share an
    # aligned chunk with this one) issues its first grad read: body(i)
    # reclaims wdma(i-2), so at exit the last TWO writes are in flight.
    @pl.when(i_fin >= 2)
    def _():
        wdma(i_fin - 2, jax.lax.rem(i_fin - 2, 2)).wait()

    @pl.when(i_fin >= 1)
    def _():
        wdma(i_fin - 1, jax.lax.rem(i_fin - 1, 2)).wait()

    # Drain the lookahead reads issued past an early exit.
    @pl.when(i_fin < nchunks)
    def _():
        rdma(i_fin, jax.lax.rem(i_fin, 3)).wait()

    @pl.when(i_fin + 1 < nchunks)
    def _():
        rdma(i_fin + 1, jax.lax.rem(i_fin + 1, 3)).wait()

    # Cross-tile prefetch of tile t+1's first chunks. The slot buffers are
    # quiesced here, and the grad writes above have drained, so the grad
    # read observes this tile's RMW even on a shared floored chunk.
    @pl.when(t + 1 < nt)
    def _():
        astart2, start2, _, nchunks2 = _tile_range(start_ref, end_ref, t + 1)

        @pl.when(nchunks2 > 0)
        def _():
            rdma_at(astart2, 0).start()

            @pl.when(astart2 < start2)
            def _():
                gdma_at(astart2, 0).start()

        @pl.when(nchunks2 > 1)
        def _():
            # Match the blk stride of rdma(i, slot): block 1 is CHUNK*SUB
            # pairs past astart2.
            rdma_at(astart2 + CHUNK * SUB, 1).start()


def _tiles_to_image(tiles: jnp.ndarray, grid_x: int, grid_y: int,
                    width: int, height: int) -> jnp.ndarray:
    """(num_tiles, PIX, C) -> (C, H, W), cropping grid padding."""
    c = tiles.shape[2]
    img = tiles.reshape(grid_y, grid_x, TILE, TILE, c)
    img = img.transpose(4, 0, 2, 1, 3).reshape(c, grid_y * TILE,
                                               grid_x * TILE)
    return img[:, :height, :width]


def _image_to_tiles(img: jnp.ndarray, grid_x: int, grid_y: int) -> jnp.ndarray:
    """(C, H, W) zero-pad to the tile grid and invert _tiles_to_image."""
    c, h, w = img.shape
    img = jnp.pad(img, ((0, 0), (0, grid_y * TILE - h), (0, grid_x * TILE - w)))
    img = img.reshape(c, grid_y, TILE, grid_x, TILE)
    return img.transpose(1, 3, 2, 4, 0).reshape(grid_y * grid_x, PIX, c)


@functools.lru_cache(maxsize=32)
def _make_composite(width: int, height: int, p_pad: int, interpret: bool,
                    num_local_tiles: int | None = None):
    """Build the custom-VJP composite for one (resolution, capacity).

    With `num_local_tiles`, the composite covers only that many tiles (a
    band for tile-sharded multi-chip rendering): inputs gain a `tile_ids`
    array of GLOBAL tile indices, tile_start/tile_end are the band's
    ranges, and outputs stay in raw (tiles, PIX, C) layout for the caller
    to assemble after gathering bands."""
    grid_x, grid_y = binning.grid_shape(width, height)
    num_tiles = num_local_tiles or grid_x * grid_y
    raw_tiles = num_local_tiles is not None

    fwd_call = pl.pallas_call(
        functools.partial(_fwd_kernel, grid_x=grid_x),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=[
                pl.BlockSpec((1, PIX, 3), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((3, IN_ROWS, CHUNK * SUB), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, PIX, 3), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX, 1), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, PIX, 1), jnp.float32),
        ],
        interpret=interpret,
    )

    bwd_call = pl.pallas_call(
        functools.partial(_bwd_kernel, grid_x=grid_x),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),   # attrs
                pl.BlockSpec((1, PIX, 3), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # dC
                pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # dD
                pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # dT
                pl.BlockSpec((1, PIX, 3), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # C_total
                pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # D_total
                pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),  # T_fin
                pl.BlockSpec(memory_space=pltpu.ANY),   # dattrs (zero init)
            ],
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # dattrs
            scratch_shapes=[
                pltpu.VMEM((3, IN_ROWS, CHUNK * SUB), jnp.float32),  # attrs in
                pltpu.VMEM((2, ROWS, CHUNK * SUB), jnp.float32),    # grads RMW
                pltpu.SemaphoreType.DMA((3,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((ROWS, p_pad), jnp.float32)],
        # dattrs is donated zero-initialised storage: early-exited chunks
        # are never written, so they must already hold zeros. Input index
        # counts the scalar-prefetch operands (tile_ids, start, end).
        input_output_aliases={10: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )

    def assemble(tiles3):
        if raw_tiles:
            return tiles3
        return tuple(_tiles_to_image(t, grid_x, grid_y, width, height)
                     for t in tiles3)

    def disassemble(cts):
        if raw_tiles:
            return cts
        return tuple(_image_to_tiles(c, grid_x, grid_y) for c in cts)

    def _zero_cts(cts):
        if raw_tiles:
            shapes = [(num_tiles, PIX, 3), (num_tiles, PIX, 1),
                      (num_tiles, PIX, 1)]
        else:
            shapes = [(3, height, width), (1, height, width),
                      (1, height, width)]
        return tuple(jnp.zeros(sh, jnp.float32) if c is None else c
                     for c, sh in zip(cts, shapes))

    @jax.custom_vjp
    def composite(attrs, tile_ids, tile_start, tile_end):
        outs = fwd_call(tile_ids, tile_start, tile_end, attrs)
        return assemble(outs)

    def composite_fwd(attrs, tile_ids, tile_start, tile_end):
        color_t, invd_t, t_t = fwd_call(tile_ids, tile_start, tile_end,
                                        attrs)
        out = assemble((color_t, invd_t, t_t))
        return out, (attrs, tile_ids, tile_start, tile_end, color_t,
                     invd_t, t_t)

    def composite_bwd(res, cts):
        attrs, tile_ids, tile_start, tile_end, color_t, invd_t, t_t = res
        dC_t, dD_t, dT_t = disassemble(_zero_cts(cts))
        # Zero-initialised donated gradient storage: the kernel only writes
        # lanes it owns (in-range, pre-saturation), so skipped chunks and
        # pairs outside this call's tile ranges stay exactly zero — sharded
        # band calls can be psum'd without any post-masking.
        d_init = jnp.zeros((ROWS, p_pad), jnp.float32)
        (d_attrs,) = bwd_call(tile_ids, tile_start, tile_end, attrs,
                              dC_t, dD_t, dT_t, color_t, invd_t, t_t,
                              d_init)
        return d_attrs, None, None, None

    composite.defvjp(composite_fwd, composite_bwd)
    return composite


def rasterize(proj: ProjectedGaussians, bg: jnp.ndarray,
              width: int, height: int,
              pair_capacity: int | None = None,
              valid_capacity: int | None = None,
              interpret: bool | None = None,
              exact_grads: bool = False):
    """Full Pallas path: fused bin/sort/attribute-routing → composite. Same
    contract as ops/reference.rasterize_reference (render includes the
    background).

    `pair_capacity` bounds the rect-based pair expansion; `valid_capacity`
    (default: same) bounds the pairs that survive the exact ellipse-tile
    cull and is what every composite-side P-sized op scales with — adaptive
    callers set it from the observed `num_pairs`."""
    n = proj.mean2d.shape[0]
    if pair_capacity is None:
        pair_capacity = default_pair_capacity(n)
    if valid_capacity is None:
        valid_capacity = pair_capacity
    if interpret is None:
        interpret = _interpret_default()
    assert binning._COMPOSITE_PAD >= CHUNK * SUB
    sorted_attrs, aux = binning.bin_sorted_pairs(
        proj, width, height, pair_capacity, valid_capacity, interpret,
        exact_grads=exact_grads)

    composite = _make_composite(width, height, sorted_attrs.shape[1],
                                interpret)
    grid_x, grid_y = binning.grid_shape(width, height)
    tile_ids = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    color, invd, t_fin = composite(sorted_attrs, tile_ids,
                                   aux["tile_start"], aux["tile_end"])
    image = color + t_fin * bg[:, None, None]
    return {
        "render": image,
        "invdepth": invd,
        "final_T": t_fin[0],
        "overflow": aux["overflow_rect"] + aux["overflow_valid"],
        "num_pairs": aux["num_valid"],
        "num_rect_pairs": aux["num_rect"],
    }


def default_pair_capacity(n: int) -> int:
    """Static pair-list capacity: ~4 tiles/Gaussian, power-of-two padded.

    Trained scenes average ~2-5 covered tiles per Gaussian; overflow is
    counted and surfaced so callers can re-render with a larger explicit
    capacity when a scene exceeds it. Adaptive callers (the trainer, the
    bench) size the capacity from observed pair counts with
    :func:`round_capacity` instead — every pair-sized op (sort, scans,
    gathers, kernel sweeps) scales with this number, so a tight ladder
    value is a direct throughput win."""
    return int(max(2 ** int(np.ceil(np.log2(max(n * 4, 4096)))), 4096))


def round_capacity(pairs: int) -> int:
    """Smallest ladder capacity >= pairs, sixteenth-octave rungs.

    Every pair-sized sort/kernel sweep scales with the capacity, so at
    multi-million pair counts one ladder rung is worth several ms/step;
    sixteenth-octave steps cap the padding waste at ~6.7% while keeping
    the number of distinct compiled programs per scene scale bounded
    (≤16 per octave; the trainer's hysteresis stops rung-flapping).
    Values stay multiples of 4096 (EXP_K and the lane-packing
    granularity) — at small sizes the grid coarsens accordingly."""
    pairs = max(int(pairs), 4096)
    k = max(int(np.ceil(np.log2(pairs))), 12)
    cands = [m * 2 ** (k - 3) for m in range(8, 16)
             if m * 2 ** (k - 3) % 4096 == 0] + [2 ** (k + 1)]
    cands += [m * 2 ** (k - 4) for m in range(9, 16)
              if m * 2 ** (k - 4) % 4096 == 0]
    cands += [m * 2 ** (k - 5) for m in range(17, 32)
              if m * 2 ** (k - 5) % 4096 == 0]
    return int(min(c for c in cands if c >= pairs))


def composite_bands(sorted_attrs_padded: jnp.ndarray, tile_ids: jnp.ndarray,
                    tile_start: jnp.ndarray, tile_end: jnp.ndarray,
                    width: int, height: int,
                    interpret: bool | None = None):
    """Raw band composite for tile-sharded multi-chip rendering.

    `tile_ids` are GLOBAL tile indices of this band (static length);
    tile_start/tile_end the matching pair ranges. Returns
    (color, invd, T) as raw (n_band_tiles, PIX, C) tiles; assemble the full
    image after gathering bands with :func:`tiles_to_image`. The custom VJP
    zeroes pair-gradient lanes outside the band so per-band cotangents can
    be summed across chips.
    """
    if interpret is None:
        interpret = _interpret_default()
    comp = _make_composite(width, height, sorted_attrs_padded.shape[1],
                           interpret, num_local_tiles=int(tile_ids.shape[0]))
    return comp(sorted_attrs_padded, tile_ids, tile_start, tile_end)


def tiles_to_image(tiles: jnp.ndarray, width: int, height: int) -> jnp.ndarray:
    """Public (num_tiles, PIX, C) -> (C, H, W) assembly for gathered bands."""
    grid_x, grid_y = binning.grid_shape(width, height)
    return _tiles_to_image(tiles, grid_x, grid_y, width, height)
