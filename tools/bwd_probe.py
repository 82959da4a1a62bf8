#!/usr/bin/env python
"""Backward-pass decomposition probe: times the composite kernel VJP, the
pair->Gaussian reduction, the depth-permutation VJP and the projection VJP
separately, so optimization effort lands on the real hot spot.

Usage: python tools/bwd_probe.py [n_gaussians] [width height]
"""

from __future__ import annotations

import sys
import time


def main(argv):
    n = int(argv[0]) if argv else 1_000_000
    w = int(argv[1]) if len(argv) > 1 else 1600
    h = int(argv[2]) if len(argv) > 2 else 1066

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

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

    def bench(name, fn, *args, iters=10):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(iters):
            r = fn(*args)
        jax.block_until_ready(r)
        dt = (time.time() - t0) / iters
        print(f"{name:<28} {dt * 1000:8.2f} ms", flush=True)
        return r, dt

    proj = jax.jit(project)(params)
    p_cap = rp.default_pair_capacity(n)
    binned = jax.jit(lambda pr: binning.bin_gaussians(pr, w, h, p_cap))(proj)
    print(f"pairs={int(binned.num_pairs)} cap={p_cap}", flush=True)

    # Stage A: projection VJP alone (params -> ProjectedGaussians).
    def proj_sum(p):
        pr = project(p)
        return (jnp.sum(pr.mean2d) + jnp.sum(pr.conic) + jnp.sum(pr.opacity)
                + jnp.sum(pr.rgb) + jnp.sum(pr.invdepth))
    bench("projection fwd+vjp", jax.jit(jax.grad(proj_sum)), params)

    # Stage B: depth permutation + pack + pair gather fwd (binning fixed).
    def gather_only(pr):
        ps = jax.tree.map(
            lambda x: binning.permute_rows(x, binned.depth_order,
                                           binned.depth_inv), pr)
        attrs = binning.pack_attributes(ps)
        sorted_attrs = binning.gather_pairs(attrs, binned)
        return jnp.sum(sorted_attrs)
    bench("permute+gather fwd", jax.jit(gather_only), proj)
    bench("permute+gather fwd+vjp",
          jax.jit(lambda pr: jax.grad(gather_only, allow_int=True)(pr)),
          proj)

    # Stage C: composite kernel only (attrs fixed input, vjp to attrs).
    ps = jax.tree.map(lambda x: binning.permute_rows(
        x, binned.depth_order, binned.depth_inv), proj)
    attrs = binning.pack_attributes(ps)
    sorted_attrs = binning.gather_pairs(attrs, binned)
    pair_valid = (jnp.arange(p_cap) < binned.num_pairs)[None, :]
    sorted_attrs = jnp.where(pair_valid, sorted_attrs, 0.0)
    sorted_attrs = jnp.pad(sorted_attrs, ((0, rp.ROWS - rp.NROW),
                                          (0, rp.CHUNK)))
    sorted_attrs = jax.device_put(sorted_attrs)
    grid_x, grid_y = binning.grid_shape(w, h)
    tile_ids = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    composite = rp._make_composite(w, h, int(sorted_attrs.shape[1]), False)

    def comp_loss(a):
        color, invd, tf = composite(a, tile_ids, binned.tile_start,
                                    binned.tile_end)
        return jnp.sum(color) + 0.01 * jnp.sum(invd)

    bench("composite fwd", jax.jit(
        lambda a: composite(a, tile_ids, binned.tile_start,
                            binned.tile_end)[0]), sorted_attrs)
    bench("composite fwd+vjp", jax.jit(jax.grad(comp_loss)), sorted_attrs)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
