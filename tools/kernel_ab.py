#!/usr/bin/env python
"""A/B the composite-kernel tuning knobs on real hardware.

Variants (monkeypatched module constants; fresh pallas builds each):
  base        — CHUNK=256, chunk starts floored to CHUNK alignment
  chunk512    — CHUNK=512
  chunk128    — CHUNK=128
  unaligned   — chunk 0 starts exactly at tile_start (unaligned lane DMA)

Timing uses chainbench (the axon runtime is lazy: independent dispatches
are elided, so naive block_until_ready loops measure dispatch only).

Usage: python tools/kernel_ab.py [n_gaussians] [variants...]
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from chainbench import chain_bench  # noqa: E402


def main(argv):
    n = int(argv[0]) if argv and argv[0].isdigit() else 1_000_000
    variants = [a for a in argv if not a.isdigit()] or [
        "base", "chunk512", "chunk128", "unaligned"]
    w, h = 1600, 1066

    from priordepth_gaussiansplatting_tpu.core import transforms
    from priordepth_gaussiansplatting_tpu.ops import binning
    from priordepth_gaussiansplatting_tpu.ops import projection as proj_ops
    from priordepth_gaussiansplatting_tpu.ops import rasterize_pallas as rp
    from priordepth_gaussiansplatting_tpu.utils import testing as T

    print(f"backend={jax.default_backend()} n={n}", flush=True)
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

    probe_cap = rp.default_pair_capacity(n)
    proj = jax.jit(project)(params)
    aux0 = jax.jit(lambda pr: binning.bin_sorted_pairs(
        pr, w, h, probe_cap)[1])(proj)
    p_cap = rp.round_capacity(int(int(aux0["num_rect"]) * 1.05))
    v_cap = rp.round_capacity(int(int(aux0["num_valid"]) * 1.05))
    print(f"rect={int(aux0['num_rect'])} valid={int(aux0['num_valid'])} "
          f"p_cap={p_cap} v_cap={v_cap}", flush=True)

    sorted_attrs, aux = jax.jit(lambda pr: binning.bin_sorted_pairs(
        pr, w, h, p_cap, v_cap))(proj)
    grid_x, grid_y = binning.grid_shape(w, h)
    tile_ids = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    tile_start, tile_end = aux["tile_start"], aux["tile_end"]

    orig_chunk = rp.CHUNK
    orig_range = rp._tile_range

    def unaligned_tile_range(start_ref, end_ref, t):
        import jax.experimental.pallas as pl  # noqa: PLC0415
        start = start_ref[t]
        end = end_ref[t]
        nchunks = jnp.where(end > start, pl.cdiv(end - start, rp.CHUNK), 0)
        return start, start, end, nchunks

    for v in variants:
        rp.CHUNK = orig_chunk
        rp._tile_range = orig_range
        if v == "chunk512":
            rp.CHUNK = 512
        elif v == "chunk128":
            rp.CHUNK = 128
        elif v == "unaligned":
            rp._tile_range = unaligned_tile_range
        rp._make_composite.cache_clear()
        # _COMPOSITE_PAD (1024) covers every CHUNK variant's tail overrun.
        comp = rp._make_composite(w, h, int(sorted_attrs.shape[1]), False)

        def fwd(a, comp=comp):
            return comp(a, tile_ids, tile_start, tile_end)

        def fwdbwd(a, comp=comp):
            def f(x):
                c, d, t = comp(x, tile_ids, tile_start, tile_end)
                return jnp.sum(c) + jnp.sum(d) + jnp.sum(t)
            return jax.grad(f)(a)

        try:
            chain_bench(f"{v}: composite fwd", fwd, sorted_attrs)
            chain_bench(f"{v}: composite fwd+bwd", fwdbwd, sorted_attrs)
        except Exception as e:  # noqa: BLE001 — report and continue A/B
            print(f"{v}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    rp.CHUNK = orig_chunk
    rp._tile_range = orig_range
    rp._make_composite.cache_clear()


if __name__ == "__main__":
    main(sys.argv[1:])
