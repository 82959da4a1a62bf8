#!/usr/bin/env python
"""Decompose the projection fwd+VJP cost at bench shapes.

fusedstage_probe measured projection fwd+vjp at ~35 ms (fwd alone ~6) —
this probe times each sub-stage's fwd and fwd+vjp to find the regression.

Usage: python tools/projvjp_probe.py [n]
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
    n = int(argv[0]) if argv else 1_000_000
    w, h = 1600, 1066

    from priordepth_gaussiansplatting_tpu.core import sh as shlib
    from priordepth_gaussiansplatting_tpu.core import transforms
    from priordepth_gaussiansplatting_tpu.ops import projection as proj_ops
    from priordepth_gaussiansplatting_tpu.utils import testing as T

    print(f"backend={jax.default_backend()} n={n}", flush=True)
    key = jax.random.PRNGKey(0)
    cam = T.look_at_camera((0, 0, -2.5), width=w, height=h)
    params = T.random_gaussians(key, n, extent=1.0,
                                scale_range=(0.001, 0.004))

    def vjp_of(fn, *args):
        def run(*a):
            out, pull = jax.vjp(fn, *a)
            return pull(jax.tree.map(jnp.ones_like, out))
        return run

    # cov3d from (scales, quats)
    def cov3d_fn(p):
        return transforms.scaling_rotation_to_cov3d(p["scales"], p["quats"])

    chain_bench("cov3d fwd", cov3d_fn, params)
    chain_bench("cov3d fwd+vjp", vjp_of(cov3d_fn), params)

    cov3d = jax.jit(cov3d_fn)(params)

    # SH eval
    def sh_fn(p):
        dirs = p["means"] - cam.cam_center[None, :]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
        return shlib.sh_to_color(3, p["sh"], dirs)

    chain_bench("sh fwd", sh_fn, params)
    chain_bench("sh fwd+vjp", vjp_of(sh_fn), params)

    # projection proper, with cov3d/sh held constant
    def proj_fn(p, cov3d):
        return proj_ops.project_gaussians(
            p["means"], cov3d, p["opacities"], p["sh"], 3,
            cam.world_view, cam.full_proj, cam.cam_center,
            w, h, cam.tan_fovx, cam.tan_fovy, antialiasing=True)

    chain_bench("project fwd (cov3d const)", proj_fn, params, cov3d)
    chain_bench("project fwd+vjp (cov3d const)", vjp_of(proj_fn), params,
                cov3d)

    # full chain
    def full(p):
        return proj_fn(p, cov3d_fn(p))

    chain_bench("FULL project fwd", full, params)
    chain_bench("FULL project fwd+vjp", vjp_of(full), params)


if __name__ == "__main__":
    main(sys.argv[1:])
