#!/usr/bin/env python
"""Stage timings of the FUSED binning pipeline (ops/binning.bin_sorted_pairs
-> Pallas composite), the round-2 hot path. Replaces fullstage_probe's
decomposition of the round-1 gather pipeline.

Usage: python tools/fusedstage_probe.py [n_gaussians]
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from chainbench import chain_bench  # noqa: E402


def bench(name, fn, *args, iters=10):
    dt = chain_bench(f"{name:<42}", fn, *args, iters=iters)
    return jax.jit(fn)(*args), dt


def main(argv):
    n = int(argv[0]) if argv else 1_000_000
    w, h = 1600, 1066

    from priordepth_gaussiansplatting_tpu.core import transforms
    from priordepth_gaussiansplatting_tpu.ops import binning
    from priordepth_gaussiansplatting_tpu.ops import projection as proj_ops
    from priordepth_gaussiansplatting_tpu.ops import rasterize_pallas as rp
    from priordepth_gaussiansplatting_tpu.utils import testing as T

    print(f"backend={jax.default_backend()} n={n} res={w}x{h}", flush=True)
    key = jax.random.PRNGKey(0)
    cam = T.look_at_camera((0, 0, -2.5), width=w, height=h)
    params = T.random_gaussians(key, n, extent=1.0,
                                scale_range=(0.001, 0.004))

    def project(p):
        cov3d = transforms.scaling_rotation_to_cov3d(p["scales"], p["quats"])
        return proj_ops.project_gaussians(
            p["means"], cov3d, p["opacities"], p["sh"], 3,
            cam.world_view, cam.full_proj, cam.cam_center,
            w, h, cam.tan_fovx, cam.tan_fovy, antialiasing=True)

    # Identical program shape to bench.py's probe step -> compile-cache hit.
    probe_cap = rp.default_pair_capacity(n)
    _, aux0 = jax.jit(lambda p: binning.bin_sorted_pairs(
        project(p), w, h, probe_cap))(params)
    n_rect, n_valid = int(aux0["num_rect"]), int(aux0["num_valid"])
    p_cap = rp.round_capacity(int(n_rect * 1.05))
    v_cap = rp.round_capacity(int(n_valid * 1.05))
    print(f"rect_pairs={n_rect} valid_pairs={n_valid} "
          f"p_cap={p_cap} v_cap={v_cap}", flush=True)

    proj, _ = bench("project fwd", project, params)

    # --- fused binning internals ------------------------------------------
    pack_u, counts_u = binning._rect_geometry(proj, w, h, True)
    depth_eff = jnp.where(counts_u > 0, proj.depth, jnp.inf)
    attrs10 = binning.pack_attributes(proj)

    bench("  rect_geometry+pack_attrs",
          lambda pr: (binning._rect_geometry(pr, w, h, True),
                      binning.pack_attributes(pr)), proj)

    def depth_sort(a10, de, pu, cu):
        B = binning
        return jax.lax.sort(
            (de, pu, cu, jnp.arange(n, dtype=jnp.int32),
             a10[B.ATTR_MX], a10[B.ATTR_MY],
             B._pack_bf16_pair(a10[B.ATTR_CA], a10[B.ATTR_CB]),
             B._pack_bf16_pair(a10[B.ATTR_CC], a10[B.ATTR_OP]),
             B._pack_bf16_pair(a10[B.ATTR_R], a10[B.ATTR_G]),
             B._pack_bf16_pair(a10[B.ATTR_B], a10[B.ATTR_ID])),
            dimension=0, is_stable=True, num_keys=1)
    srt, _ = bench("  depth sort (N x10 packed)", depth_sort,
                   attrs10, depth_eff, pack_u, counts_u)

    counts_s = srt[2]
    bench("  exclusive cumsum (N)",
          lambda c: binning._exclusive_cumsum_i32(c), counts_s)
    offsets, total = binning._exclusive_cumsum_i32(counts_s)
    n_pad = -(-(n + binning.EXP_W) // binning._PACK_L) * binning._PACK_L

    def build_tables(offs, pk, gd, ad):
        off_pad = jnp.pad(offs, (0, n_pad - n),
                          constant_values=binning._OFF_SENTINEL)
        compi = binning.pack_lanes([off_pad], 8, n_pad, False)
        compf = binning.pack_lanes(
            [(offs % binning._LO_MOD).astype(jnp.float32),
             pk.astype(jnp.float32), gd.astype(jnp.float32)]
            + [ad[i] for i in range(binning.ATTR_ROWS)],
            binning._CF_ROWS, n_pad, False)
        return compi, compf
    up = binning.unpack_bf16_rows
    attrs_d = jnp.stack(
        [srt[4], srt[5]]
        + [row for pair in (up(srt[6]), up(srt[7]), up(srt[8]), up(srt[9]))
           for row in pair])
    (compi, compf), _ = bench("  pack window tables (N x14)", build_tables,
                              offsets, srt[1], srt[3], attrs_d)

    # expansion kernel alone (at p_cap)
    nb = p_cap // binning.EXP_K
    cpos = jnp.arange(nb, dtype=jnp.int32) * binning.EXP_K
    off_pad = jnp.pad(offsets, (0, n_pad - n),
                      constant_values=binning._OFF_SENTINEL)
    c_tab = jnp.searchsorted(off_pad, cpos, side="left").astype(jnp.int32)
    s0 = (jnp.clip(c_tab - 1, 0, max(n - 1, 0)) // 128) * 128
    tot = jnp.minimum(total, p_cap).astype(jnp.int32)[None]
    gx, gy = binning.grid_shape(w, h)
    gyp = -(-gy // 8) * 8
    gxp = -(-gx // 128) * 128
    kb = binning.EXP_K // 128
    pb = p_cap // 128
    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def run_expand(ci, cf):
        field = lambda dt: _jax.ShapeDtypeStruct((pb, 128), dt)  # noqa
        fspec = pl.BlockSpec((kb, 128), lambda c, *_: (c, 0),
                             memory_space=pltpu.MemorySpace.VMEM)
        return pl.pallas_call(
            binning._expand_attrs_kernel_factory(gx, gy, gyp, gxp),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(nb,),
                in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
                          pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
                out_specs=[fspec, fspec,
                           pl.BlockSpec((gyp, gxp), lambda c, *_: (0, 0),
                                        memory_space=pltpu.MemorySpace.VMEM)]
                + [fspec] * binning.PAIR_ROWS,
                scratch_shapes=[
                    pltpu.VMEM((2, 8, binning.EXP_W), jnp.int32),
                    pltpu.VMEM((2, binning._CF_ROWS, binning.EXP_W),
                               jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            ),
            out_shape=[field(jnp.int32), field(jnp.int32),
                       _jax.ShapeDtypeStruct((gyp, gxp), jnp.float32)]
            + [field(jnp.float32)] * binning.PAIR_ROWS,
            interpret=False,
        )(s0, tot, ci, cf)

    outs, _ = bench("  expansion kernel (P x8 out)", run_expand, compi,
                    compf)
    tile_ids = outs[0].reshape(-1)
    gidp = outs[1].reshape(-1)
    pattr_rows = [o.reshape(-1) for o in outs[3:]]

    def tile_sort(t, g, rows):
        return jax.lax.sort((t, g) + tuple(rows), dimension=0,
                            is_stable=True, num_keys=1)
    srt2, _ = bench("  tile sort (P x8)", tile_sort, tile_ids, gidp,
                    pattr_rows)

    v_pad = v_cap + binning._COMPOSITE_PAD
    bench("  pack attrs16 (v_cap x6)",
          lambda rows: binning.pack_lanes(list(rows), binning._CF_ROWS,
                                          v_pad, False),
          srt2[2:2 + binning.PAIR_ROWS])

    # --- whole fused binning, fwd ------------------------------------------
    binned, _ = bench("bin_sorted_pairs fwd (total)",
                      lambda pr: binning.bin_sorted_pairs(
                          pr, w, h, p_cap, v_cap)[0], proj)

    # --- composite ----------------------------------------------------------
    sorted_attrs, aux = jax.jit(
        lambda pr: binning.bin_sorted_pairs(pr, w, h, p_cap, v_cap))(proj)
    comp = rp._make_composite(w, h, int(sorted_attrs.shape[1]), False)
    tids = jnp.arange(gx * gy, dtype=jnp.int32)

    def comp_fwd(a):
        return comp(a, tids, aux["tile_start"], aux["tile_end"])

    bench("composite fwd kernel", comp_fwd, sorted_attrs)

    def comp_fwdbwd(a):
        def f(x):
            c, d, t = comp(x, tids, aux["tile_start"], aux["tile_end"])
            return jnp.sum(c) + jnp.sum(d) + jnp.sum(t)
        return jax.grad(f)(a)

    bench("composite fwd+bwd kernels", comp_fwdbwd, sorted_attrs)

    # --- backward plumbing ---------------------------------------------------
    d16 = jax.jit(comp_fwdbwd)(sorted_attrs)

    def bwd_plumb(d):
        d_rows = binning.unpack_lanes(d, binning.ATTR_ROWS, False)
        gid_pad = jnp.pad(aux["gid_sorted"],
                          (0, v_pad - aux["gid_sorted"].shape[0]),
                          constant_values=n)
        pair_pos = jnp.arange(v_pad, dtype=jnp.int32)
        key = jnp.where(pair_pos < aux["num_valid"], gid_pad, n)
        sb = jax.lax.sort((key,) + tuple(d_rows), dimension=0,
                          is_stable=False, num_keys=1)
        d_pairs = binning.pack_lanes(list(sb[1:]), 16, v_pad, False)
        return binning.segment_reduce(d_pairs, sb[0], aux["num_valid"], n,
                                      interpret=False)

    bench("bwd plumbing (sortback+segreduce)", bwd_plumb, d16)

    def bwd_sb_only(d):
        d_rows = binning.unpack_lanes(d, binning.ATTR_ROWS, False)
        gid_pad = jnp.pad(aux["gid_sorted"],
                          (0, v_pad - aux["gid_sorted"].shape[0]),
                          constant_values=n)
        pair_pos = jnp.arange(v_pad, dtype=jnp.int32)
        key = jnp.where(pair_pos < aux["num_valid"], gid_pad, n)
        return jax.lax.sort((key,) + tuple(d_rows), dimension=0,
                            is_stable=False, num_keys=1)

    bench("  bwd sort-back (v_cap x11)", bwd_sb_only, d16)

    def proj_vjp(p):
        _, vjp = jax.vjp(project, p)
        return vjp(jax.tree.map(jnp.ones_like, proj))

    bench("projection fwd+vjp", proj_vjp, params)

    def full(p):
        out = rp.rasterize(project(p), jnp.zeros(3), w, h,
                           pair_capacity=p_cap, valid_capacity=v_cap)
        return (jnp.mean(out["render"] ** 2)
                + 0.01 * jnp.mean(out["invdepth"]))

    bench("FULL fwd", full, params)
    bench("FULL fwd+bwd", lambda p: jax.grad(full)(p), params)
    rays = w * h
    _, dt = bench("FULL fwd+bwd (check)", lambda p: jax.grad(full)(p), params)
    print(f"=> {rays / dt / 1e6:.2f} Mray/s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
