#!/usr/bin/env python
"""Pinpoint probe: times each sub-op of the permute/pack/gather stage and
its VJP with binning arrays passed as real jit arguments."""

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
    print(f"{name:<36} {dt * 1000:8.2f} ms", flush=True)
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
    print(f"pairs={int(binned.num_pairs)} cap={p_cap}", flush=True)

    # individual pieces, binning arrays as real args
    bench("permute_rows proj (fwd)", jax.jit(
        lambda pr, o, oi: jax.tree.map(
            lambda x: binning.permute_rows(x, o, oi), pr)),
        proj, binned.depth_order, binned.depth_inv)
    ps = jax.jit(lambda pr, o, oi: jax.tree.map(
        lambda x: binning.permute_rows(x, o, oi), pr))(
            proj, binned.depth_order, binned.depth_inv)
    attrs = jax.jit(binning.pack_attributes)(ps)
    bench("pack_attributes", jax.jit(binning.pack_attributes), ps)
    bench("gather attrs[:, gids]", jax.jit(lambda a, g: a[:, g]),
          attrs, binned.gauss_ids)

    sorted_attrs = jax.jit(lambda a, g: a[:, g])(attrs, binned.gauss_ids)

    # VJP pieces
    bench("vjp inv_perm gather", jax.jit(lambda d, ip: d[:, ip]),
          sorted_attrs, binned.inv_perm)
    d_pairs = jax.jit(lambda d, ip: d[:, ip])(sorted_attrs, binned.inv_perm)
    bench("vjp cumsum (10,P)", jax.jit(lambda d: jnp.cumsum(d, axis=1)),
          d_pairs)
    cum = jax.jit(lambda d: jnp.cumsum(d, axis=1))(d_pairs)
    lo = jnp.clip(binned.seg_offsets, 0, p_cap)
    hi = jnp.clip(binned.seg_offsets + binned.seg_counts, 0, p_cap)
    bench("vjp hi/lo gathers", jax.jit(
        lambda c, lo, hi: c[:, hi] - c[:, lo]), cum, lo, hi)

    # fused whole-stage (args, not closures)
    def gather_stage(pr, o, oi, gids):
        ps = jax.tree.map(lambda x: binning.permute_rows(x, o, oi), pr)
        at = binning.pack_attributes(ps)
        return jnp.sum(at[:, gids])

    bench("stage fwd (fused)", jax.jit(gather_stage),
          proj, binned.depth_order, binned.depth_inv, binned.gauss_ids)
    bench("stage fwd+grad (fused)", jax.jit(
        jax.grad(gather_stage, allow_int=True)),
        proj, binned.depth_order, binned.depth_inv, binned.gauss_ids)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
