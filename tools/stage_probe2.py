#!/usr/bin/env python
"""Compare pair->Gaussian gradient-reduction strategies and forward
permute/gather layouts with the REAL binning arrays (micro-benchmarks with
synthetic indices proved unrepresentative)."""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def bench(name, fn, *args, iters=10):
    r = fn(*args)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    print(f"{name:<40} {dt * 1000:8.2f} ms", flush=True)
    return r, dt


def main(argv):
    n = int(argv[0]) if argv else 1_000_000
    w = int(argv[1]) if len(argv) > 1 else 1600
    h = int(argv[2]) if len(argv) > 2 else 1066

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

    proj = jax.jit(project)(params)
    p_cap = rp.default_pair_capacity(n)
    binned = jax.jit(lambda pr: binning.bin_gaussians(pr, w, h, p_cap))(proj)
    binned = jax.block_until_ready(binned)
    p_tight = rp.round_capacity(int(int(binned.num_pairs) * 1.1))
    print(f"pairs={int(binned.num_pairs)} cap={p_cap} tight={p_tight}",
          flush=True)

    rows = 10
    d_sorted = jax.random.normal(key, (rows, p_cap), jnp.float32)
    gids_orig = jax.jit(lambda o, g: o[g])(binned.depth_order,
                                           binned.gauss_ids)

    # ---- forward variants
    attrs_unsorted = jax.jit(binning.pack_attributes)(proj)
    bench("fwd A: pack+lane-permute (10,N)",
          jax.jit(lambda a, o: a[:, o]), attrs_unsorted, binned.depth_order)
    bench("fwd B: gids_orig compose (P-from-N)",
          jax.jit(lambda o, g: o[g]), binned.depth_order, binned.gauss_ids)
    bench("fwd C: pair gather w/ orig ids",
          jax.jit(lambda a, g: a[:, g]), attrs_unsorted, gids_orig)

    # ---- reduction variants (pair grads -> per-gaussian grads)
    def red_scatter(d, g):
        return jnp.zeros((rows, n), jnp.float32).at[:, g].add(d)
    bench("bwd A: scatter-add (10,N)<-(10,P)", jax.jit(red_scatter),
          d_sorted, gids_orig)

    def red_sortback(d, perm_key, lo, hi):
        arrs = jax.lax.sort((perm_key,) + tuple(d), dimension=0, num_keys=1,
                            is_stable=False)
        dd = jnp.stack(arrs[1:], axis=0)
        cum = jnp.concatenate([jnp.zeros((rows, 1)),
                               jnp.cumsum(dd, axis=1)], axis=1)
        return cum[:, hi] - cum[:, lo]
    lo = jnp.clip(binned.seg_offsets, 0, p_cap)
    hi = jnp.clip(binned.seg_offsets + binned.seg_counts, 0, p_cap)
    bench("bwd B: sort-back 10 payloads+segsum", jax.jit(red_sortback),
          d_sorted, binned.inv_perm, lo, hi)

    def red_invperm(d, ip, lo, hi):
        dp = d[:, ip]
        cum = jnp.concatenate([jnp.zeros((rows, 1)),
                               jnp.cumsum(dp, axis=1)], axis=1)
        return cum[:, hi] - cum[:, lo]
    bench("bwd C: inv_perm gather+segsum (cur)", jax.jit(red_invperm),
          d_sorted, binned.inv_perm, lo, hi)

    # bf16-packed inv_perm gather: 10 f32 rows -> 5 f32 rows of 2xbf16
    def red_invperm_bf16(d, ip, lo, hi):
        db = d.astype(jnp.bfloat16)
        packed = jax.lax.bitcast_convert_type(
            db.reshape(rows // 2, 2, -1).swapaxes(1, 2), jnp.float32)
        dp = packed[:, ip]
        un = jax.lax.bitcast_convert_type(dp, jnp.bfloat16)
        dd = un.swapaxes(1, 2).reshape(rows, -1).astype(jnp.float32)
        cum = jnp.concatenate([jnp.zeros((rows, 1)),
                               jnp.cumsum(dd, axis=1)], axis=1)
        return cum[:, hi] - cum[:, lo]
    bench("bwd D: bf16-packed invperm+segsum", jax.jit(red_invperm_bf16),
          d_sorted, binned.inv_perm, lo, hi)

    # segment_sum via jax.ops
    def red_segsum(d, g):
        return jax.ops.segment_sum(d.T, g, num_segments=n).T
    bench("bwd E: jax.ops.segment_sum", jax.jit(red_segsum),
          d_sorted, gids_orig)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
