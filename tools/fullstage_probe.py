#!/usr/bin/env python
"""Fine-grained stage timings of the full fwd+bwd rasterizer step at the
bench's adaptive pair capacity — the optimization cost model.

Usage: python tools/fullstage_probe.py [n_gaussians]
"""

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
    """Chained-forced timing (see tools/chainbench.py: the axon runtime is
    lazy — unconsumed results are elided, so naive loops measure dispatch)."""
    import os
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from chainbench import chain_bench
    dt = chain_bench(f"{name:<38}", fn, *args, iters=iters)
    r = jax.jit(fn)(*args)
    return r, dt


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

    probe_cap = rp.default_pair_capacity(n)
    npairs = int(jax.jit(lambda p: binning.bin_gaussians(
        project(p), w, h, probe_cap).num_pairs)(params))
    cap = rp.round_capacity(int(npairs * 1.1))
    print(f"pairs={npairs} cap={cap}", flush=True)

    proj, _ = bench("project fwd", project, params)
    binned, _ = bench("bin_gaussians",
                      lambda pr: binning.bin_gaussians(pr, w, h, cap), proj)

    # bin_gaussians internals — APPROXIMATE re-implementation of its stages
    # for timing only (e.g. searchsorted runs over the unpadded table);
    # treat the numbers as stage estimates, not exact decompositions.
    import jax.numpy as _jnp
    from priordepth_gaussiansplatting_tpu.ops.projection import tile_rect

    def _rects(pr):
        gx, gy = binning.grid_shape(w, h)
        xmin, ymin, xmax, ymax = tile_rect(pr.mean2d, pr.radius, w, h)
        nx = (xmax - xmin).astype(_jnp.int32)
        counts_u = nx * (ymax - ymin).astype(_jnp.int32)
        pack_u = ((ymin * gx + xmin) * binning.RECT_PACK
                  + _jnp.minimum(nx, binning.RECT_PACK - 1))
        return pack_u, counts_u

    order, _ = bench("  depth argsort (N)",
                     lambda pr: jnp.argsort(pr.depth).astype(jnp.int32), proj)
    (pack_u, counts_u), _ = bench("  rect+pack (N)", _rects, proj)
    packed_s = jnp.stack([pack_u, counts_u])[:, order]
    counts = packed_s[1]
    offsets = jnp.cumsum(counts) - counts
    bench("  permute+cumsum (N)",
          lambda pu, cu, o: (lambda c: jnp.cumsum(c) - c)(
              jnp.stack([pu, cu])[:, o][1]),
          pack_u, counts_u, order)
    present = (counts > 0) & (offsets < cap)
    bench("  compaction sort (N x3)",
          lambda o, pk, od: jax.lax.sort(
              (jnp.where(present, o, binning._OFF_SENTINEL), pk, od),
              dimension=0, is_stable=True, num_keys=1),
          offsets, packed_s[0], order)
    nbq = cap // binning.EXP_K
    off_c = jax.lax.sort(
        (jnp.where(present, offsets, binning._OFF_SENTINEL),),
        dimension=0, num_keys=1)[0]
    bench("  window searchsorted (P/K)",
          lambda oc: jnp.searchsorted(
              oc, jnp.arange(nbq, dtype=jnp.int32) * binning.EXP_K,
              side="left"), off_c)
    bench("  tile sort (P x2)",
          lambda t, g: jax.lax.sort((t, g), dimension=0, is_stable=True,
                                    num_keys=1),
          binned.tile_ids, binned.gauss_ids)

    attrs, _ = bench("pack_attributes", binning.pack_attributes, proj)
    sorted_attrs, _ = bench("gather_pairs fwd",
                            lambda a: a[:, binned.gauss_ids], attrs)

    pair_valid = (jnp.arange(cap) < binned.num_pairs)[None, :]
    sa = jnp.where(pair_valid, sorted_attrs, 0.0)
    p_pad = cap + rp.CHUNK
    sa = jnp.pad(sa, ((0, rp.ROWS - rp.NROW), (0, rp.CHUNK)))
    grid_x, grid_y = binning.grid_shape(w, h)
    tile_ids = jnp.arange(grid_x * grid_y, dtype=jnp.int32)
    comp = rp._make_composite(w, h, p_pad, False)

    def comp_fwd(a):
        c, d, t = comp(a, tile_ids, binned.tile_start, binned.tile_end)
        return c, d, t

    bench("composite fwd kernel", comp_fwd, sa)

    def comp_fwdbwd(a):
        def f(x):
            c, d, t = comp(x, tile_ids, binned.tile_start, binned.tile_end)
            return jnp.sum(c) + jnp.sum(d) + jnp.sum(t)
        return jax.grad(f)(a)

    d_attrs_pairs, _ = bench("composite fwd+bwd kernels", comp_fwdbwd, sa)

    # Backward plumbing, isolated on realistic cotangents.
    d_sorted = tuple(d_attrs_pairs[i, :cap] for i in range(rp.NROW))
    pair_pos = jnp.arange(cap, dtype=jnp.int32)
    key_arr = jnp.where(pair_pos < binned.num_pairs, binned.gauss_ids, n)

    def sortback(ds):
        return jax.lax.sort((key_arr,) + ds, dimension=0, is_stable=False,
                            num_keys=1)

    sb, _ = bench("bwd sort-back (key+10 payloads)", sortback, d_sorted)
    gid_sorted = sb[0]
    d_pairs = jnp.stack(sb[1:], axis=0)
    bench("bwd segment_reduce",
          lambda d: binning.segment_reduce(d, gid_sorted, binned.num_pairs,
                                           n), d_pairs)

    def proj_vjp(p):
        _, vjp = jax.vjp(project, p)
        return vjp(jax.tree.map(jnp.ones_like, proj))

    bench("projection fwd+vjp", proj_vjp, params)

    def full(p):
        out = rp.rasterize(project(p), jnp.zeros(3), w, h, pair_capacity=cap)
        return jnp.mean(out["render"] ** 2) + 0.01 * jnp.mean(out["invdepth"])

    bench("FULL fwd", full, params)
    bench("FULL fwd+bwd", lambda p: jax.grad(full)(p), params)


if __name__ == "__main__":
    main(sys.argv[1:])
