#!/usr/bin/env python
"""Benchmark: rasterizer fwd+bwd throughput per chip (BASELINE.json north
star: rays/s fwd+bwd at 1M Gaussians).

Renders a synthetic 1M-Gaussian scene at 1.6K-class resolution (1600×1066,
the reference's input cap — `utils/camera_utils.py:46-57`) through the full
differentiable path (projection → binning/sort → Pallas composite → loss →
analytic backward to all parameters) and reports pixels(=rays)/s.

`vs_baseline`: the reference publishes no machine-readable throughput
(BASELINE.md); the denominator 30e6 rays/s is the estimated reference CUDA
fwd+bwd throughput derived from upstream 3DGS training-time reports
(~25 min / 30k iters at ~1.3 Mpix on a 24 GB RTX GPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

N_GAUSS = int(__import__("os").environ.get("PDGS_BENCH_N", 1_000_000))
WIDTH, HEIGHT = 1600, 1066
BASELINE_RAYS_PER_S = 30e6
ITERS = 10


def _watchdog(seconds: float, payload: dict):
    """Emit a failure JSON line and hard-exit if the run wedges (a dead TPU
    must not hang the driver forever)."""
    import os
    import threading

    def fire():
        print(json.dumps(payload), flush=True)
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    # Persistent compile cache — first-compile of the 1M-Gaussian program is
    # expensive through the remote TPU compile service.
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(os.path.dirname(__file__) or ".",
                                        ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from priordepth_gaussiansplatting_tpu.core import transforms
    from priordepth_gaussiansplatting_tpu.ops import projection as proj_ops
    from priordepth_gaussiansplatting_tpu.ops import rasterize_pallas as rp
    from priordepth_gaussiansplatting_tpu.utils import testing as T

    fail = {"metric": f"rays/s fwd+bwd, {N_GAUSS//1000}k gaussians "
                      f"@{WIDTH}x{HEIGHT}, 1 chip (TIMED OUT)",
            "value": 0.0, "unit": "rays/s", "vs_baseline": 0.0}
    # Health check: a trivial op must complete quickly on a live chip.
    hc = _watchdog(180.0, fail)
    jax.block_until_ready(jax.numpy.ones(8).sum())
    hc.cancel()
    # Full-run watchdog (generous: first compile of the 1M program is slow).
    wd = _watchdog(3000.0, fail)

    key = jax.random.PRNGKey(0)
    cam = T.look_at_camera((0, 0, -2.5), width=WIDTH, height=HEIGHT)
    params = T.random_gaussians(key, N_GAUSS, extent=1.0,
                                scale_range=(0.001, 0.004))
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, HEIGHT, WIDTH))

    def project(p):
        cov3d = transforms.scaling_rotation_to_cov3d(p["scales"], p["quats"])
        return proj_ops.project_gaussians(
            p["means"], cov3d, p["opacities"], p["sh"], 3,
            cam.world_view, cam.full_proj, cam.cam_center,
            WIDTH, HEIGHT, cam.tan_fovx, cam.tan_fovy, antialiasing=True)

    # Adaptive pair capacities, as the trainer maintains them at steady
    # state: one probe binning measures the scene's rect pair count (bounds
    # the expansion) and surviving pair count (bounds the composite-side
    # work); the camera is fixed here, so thin headroom suffices (the CUDA
    # reference allocates exactly).
    from priordepth_gaussiansplatting_tpu.ops import binning
    probe_cap = rp.default_pair_capacity(N_GAUSS)
    _, aux = jax.jit(lambda p: binning.bin_sorted_pairs(
        project(p), WIDTH, HEIGHT, probe_cap))(params)
    p_cap = rp.round_capacity(int(int(aux["num_rect"]) * 1.05))
    v_cap = rp.round_capacity(int(int(aux["num_valid"]) * 1.05))

    def loss_fn(p):
        out = rp.rasterize(project(p), jnp.zeros(3), WIDTH, HEIGHT,
                           pair_capacity=p_cap, valid_capacity=v_cap)
        return (jnp.mean((out["render"] - target) ** 2)
                + 0.01 * jnp.mean(out["invdepth"]))

    # The axon tunnel runtime is lazy: results that nothing observes may
    # never execute, so time a DEPENDENCY CHAIN of steps (each step's
    # params are perturbed by a runtime-zero of the previous gradient's
    # norm) and difference two chain lengths to cancel the host round trip.
    def step(p, s):
        g = jax.grad(loss_fn)(p)
        # s2 folds every gradient leaf (nothing is dead); p2 depends on s2,
        # so successive steps form an unelidable chain of full executions.
        s2 = sum(jnp.ravel(x)[-1].astype(jnp.float32)
                 for x in jax.tree.leaves(g))
        p2 = jax.tree.map(lambda x: x + (s2 * 1e-38).astype(x.dtype), p)
        return p2, s2

    step = jax.jit(step)

    def run(k):
        p, s = params, jnp.float32(0.0)
        t0 = time.time()
        for _ in range(k):
            p, s = step(p, s)
        float(s)
        return time.time() - t0

    run(1)  # compile
    lo = run(2)
    hi = run(ITERS + 2)
    dt = max(hi - lo, 1e-9) / ITERS
    rays_per_s = WIDTH * HEIGHT / dt
    wd.cancel()
    print(json.dumps({
        "metric": f"rays/s fwd+bwd, {N_GAUSS//1000}k gaussians "
                  f"@{WIDTH}x{HEIGHT}, 1 chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
