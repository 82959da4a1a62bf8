#!/usr/bin/env python
"""Real-TPU parity gate: Pallas kernels vs the jnp oracle on-chip.

The pytest parity suite runs the kernels in interpret mode on CPU, which
validates semantics but NOT Mosaic lowering or DMA choreography (races,
semaphore accounting, prefetch hazards). This probe runs BOTH paths on the
actual chip and compares forward outputs and parameter gradients.

Usage: PYTHONPATH=. python tools/tpu_parity_check.py [n] [width] [height]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main(argv):
    n = int(argv[0]) if argv else 20_000
    w = int(argv[1]) if len(argv) > 1 else 512
    h = int(argv[2]) if len(argv) > 2 else 384

    from priordepth_gaussiansplatting_tpu.core import transforms
    from priordepth_gaussiansplatting_tpu.ops import projection as proj_ops
    from priordepth_gaussiansplatting_tpu.ops import rasterize_pallas as rp
    from priordepth_gaussiansplatting_tpu.ops import reference as ref_ops
    from priordepth_gaussiansplatting_tpu.utils import testing as T

    assert jax.default_backend() == "tpu", "run on the TPU chip"
    key = jax.random.PRNGKey(0)
    cam = T.look_at_camera((0, 0, -2.5), width=w, height=h)
    params = T.random_gaussians(key, n, extent=1.0, scale_range=(0.01, 0.05))
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, h, w))
    bg = jnp.array([0.2, 0.3, 0.4])

    def project(p):
        cov3d = transforms.scaling_rotation_to_cov3d(p["scales"], p["quats"])
        return proj_ops.project_gaussians(
            p["means"], cov3d, p["opacities"], p["sh"], 3,
            cam.world_view, cam.full_proj, cam.cam_center,
            w, h, cam.tan_fovx, cam.tan_fovy, antialiasing=True)

    # Size the pair capacity from the scene: parity only holds when no
    # pairs are dropped (the oracle has no capacity).
    probe = jax.jit(lambda p: rp.rasterize(
        project(p), bg, w, h, interpret=False))(params)
    n_rect = int(probe["num_rect_pairs"])
    cap = rp.round_capacity(int(n_rect * 1.1))
    print(f"rect_pairs={n_rect} capacity={cap}")

    def fwd(p, backend):
        proj = project(p)
        if backend == "oracle":
            return ref_ops.rasterize_reference(proj, bg, w, h)
        return rp.rasterize(proj, bg, w, h, pair_capacity=cap,
                            interpret=False)

    out_p = jax.jit(lambda p: fwd(p, "pallas"))(params)
    out_o = jax.jit(lambda p: fwd(p, "oracle"))(params)
    for k in ("render", "invdepth", "final_T"):
        a = np.asarray(out_o[k])
        b = np.asarray(out_p[k])
        err = np.abs(a - b).max()
        print(f"fwd {k:9s} max|diff| = {err:.3e}")
        if k == "final_T":
            # The T<1e-4 early-termination cutoff is a discrete decision:
            # at pixels whose transmittance lands within float noise of
            # T_EPS, the last pair's inclusion legitimately flips between
            # implementations (CUDA included), changing final_T by up to
            # alpha*T ~ 1e-4 at those pixels ONLY. Allow that: off-boundary
            # pixels keep the 2e-5 bar; boundary pixels (both sides below
            # 10*T_EPS) may differ by a flip, and must be rare.
            d = np.abs(a - b)
            boundary = (a < 1e-3) & (b < 1e-3)
            off = d[~boundary].max() if (~boundary).any() else 0.0
            nflip = int((d[boundary] > 2e-5).sum())
            print(f"    off-boundary max|diff| = {off:.3e}; "
                  f"boundary flips = {nflip}/{d.size}")
            assert off < 2e-5, "TPU forward parity broke on final_T"
            assert nflip < d.size * 1e-3, "too many termination flips"
        else:
            assert err < 2e-5, f"TPU forward parity broke on {k}"

    def loss(p, backend, exact=False, interpret=False):
        proj = project(p)
        if backend == "oracle":
            out = ref_ops.rasterize_reference(proj, bg, w, h)
        else:
            out = rp.rasterize(proj, bg, w, h, pair_capacity=cap,
                               interpret=interpret, exact_grads=exact)
        return (jnp.mean((out["render"] - target) ** 2)
                + 0.1 * jnp.mean(jnp.abs(out["invdepth"])))

    # Gradient gate: Mosaic kernels vs the SAME kernel semantics lowered
    # through interpret mode, both on this chip. This isolates exactly what
    # the on-chip gate exists to test — Mosaic lowering and DMA
    # choreography (races, stale prefetch, semaphore bugs) — with
    # identical math on both sides, so the tolerance can be tight.
    #
    # The jnp oracle is NOT a usable on-chip gradient reference at tight
    # tolerance anymore: the 2026-08 TPU runtime's exp carries ~5e-6
    # relative error, and the backward's suffix-from-prefix cancellation
    # amplifies platform transcendental noise so much that the ORACLE
    # disagrees with ITSELF between TPU and CPU by ~1e-1 of max-grad scale
    # (measured; >half of all rows move >1e-3). Semantic parity vs the
    # oracle is covered by the CPU interpret-mode suite
    # (tests/test_pallas_vs_oracle.py) where transcendentals are accurate;
    # here the oracle diff is reported for information with a loose bound.
    g_o = jax.jit(jax.grad(lambda p: loss(p, "oracle")))(params)
    g_x = jax.jit(jax.grad(lambda p: loss(p, "pallas", True)))(params)
    g_f = jax.jit(jax.grad(lambda p: loss(p, "pallas", False)))(params)
    g_i = jax.jit(jax.grad(
        lambda p: loss(p, "pallas", True, interpret=True)))(params)
    for name in params:
        r = np.asarray(g_i[name])
        scale = max(np.abs(r).max(), 1e-12)
        ex = np.abs(np.asarray(g_x[name]) - r).max() / scale
        fa = np.abs(np.asarray(g_f[name]) - r).max() / scale
        orc = np.abs(np.asarray(g_o[name]) - r).max() / scale
        print(f"grad {name:10s} mosaic-exact {ex:.3e}  mosaic-fast "
              f"{fa:.3e}  oracle {orc:.3e}  (of interpret scale)")
        assert ex < 1e-4, f"Mosaic exact-grad lowering broke on {name}"
        assert fa < 3e-2, f"Mosaic fast-grad spec bound broke on {name}"
        assert orc < 2e-1, f"oracle grad sanity bound broke on {name}"
    print("TPU parity OK")


if __name__ == "__main__":
    main(sys.argv[1:])
