#!/usr/bin/env python
"""Stage-by-stage rasterizer performance probe on the current backend.

Usage: python tools/perf_probe.py [n_gaussians] [width height]
Reports projection / binning / composite fwd / fwd+bwd timings and derived
rays/s. Uses the persistent compile cache (.jax_cache).
"""

from __future__ import annotations

import sys
import time


def main(argv):
    n = int(argv[0]) if argv else 200_000
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
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, h, w))

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
        print(f"{name:<24} {dt * 1000:8.2f} ms", flush=True)
        return r, dt

    proj_j = jax.jit(project)
    proj, _ = bench("project", proj_j, params)
    p_cap = rp.default_pair_capacity(n)
    binned, _ = bench("bin+sort", jax.jit(
        lambda pr: binning.bin_gaussians(pr, w, h, p_cap)), proj)
    print(f"pairs={int(binned.num_pairs)} overflow={int(binned.overflow)}",
          flush=True)

    fwd = jax.jit(lambda p: rp.rasterize(project(p), jnp.zeros(3), w, h)
                  ["render"])
    _, t_fwd = bench("full fwd", fwd, params)

    def loss(p):
        out = rp.rasterize(project(p), jnp.zeros(3), w, h)
        return (jnp.mean((out["render"] - target) ** 2)
                + 0.01 * jnp.mean(out["invdepth"]))

    grad = jax.jit(jax.grad(loss))
    _, t_full = bench("full fwd+bwd", grad, params)
    print(f"rays/s fwd      = {w * h / t_fwd:12.0f}", flush=True)
    print(f"rays/s fwd+bwd  = {w * h / t_full:12.0f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
