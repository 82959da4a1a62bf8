"""TPU microbenchmark: Pallas segment_reduce vs XLA cumsum+boundary-gather.

Builds a realistic binning (1M Gaussians, 1297x840 image) and compares the
pair-gradient reduction paths numerically and for wall time.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from priordepth_gaussiansplatting_tpu.ops import binning as B
from priordepth_gaussiansplatting_tpu.ops.projection import ProjectedGaussians


def xla_segment_reduce(d_pairs, binned, n):
    p = d_pairs.shape[1]
    cum = jnp.cumsum(d_pairs, axis=1)
    zero = jnp.zeros((d_pairs.shape[0], 1), d_pairs.dtype)
    cum = jnp.concatenate([zero, cum], axis=1)
    bounds = jnp.clip(
        jnp.concatenate([binned.seg_offsets,
                         (binned.seg_offsets[-1:]
                          + binned.seg_counts[-1:])]), 0, p)
    cumb = cum[:, bounds]
    return cumb[:, 1:] - cumb[:, :-1]


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)
    n = 1_000_000
    w, h = 1296, 840
    mean2d = np.stack([rng.uniform(-50, w + 50, n),
                       rng.uniform(-50, h + 50, n)], -1).astype(np.float32)
    radius = rng.integers(0, 40, n).astype(np.int32)
    radius[rng.random(n) < 0.3] = 0  # culled
    depth = rng.uniform(0.1, 100, n).astype(np.float32)
    depth[radius == 0] = np.inf
    proj = ProjectedGaussians(
        mean2d=jnp.asarray(mean2d),
        conic=jnp.ones((n, 3), jnp.float32),
        opacity=jnp.ones((n,), jnp.float32) * 0.5,
        rgb=jnp.ones((n, 3), jnp.float32),
        depth=jnp.asarray(depth),
        invdepth=jnp.asarray(1.0 / depth),
        radius=jnp.asarray(radius),
    )
    cap = 1 << 23
    binned = jax.jit(B.bin_gaussians,
                     static_argnames=("width", "height", "pair_capacity"))(
        proj, w, h, cap)
    jax.block_until_ready(binned)
    print("num_pairs:", int(binned.num_pairs), "overflow:",
          int(binned.overflow))

    d_pairs = jnp.asarray(
        rng.standard_normal((B.ATTR_ROWS, cap)).astype(np.float32))

    f_xla = jax.jit(lambda d: xla_segment_reduce(d, binned, n))
    f_pl = jax.jit(lambda d: B.segment_reduce(d, binned, n))

    a = f_xla(d_pairs)
    b = f_pl(d_pairs)
    jax.block_until_ready((a, b))
    err = float(jnp.max(jnp.abs(a - b)))
    ref = float(jnp.max(jnp.abs(a)))
    print(f"max abs err: {err:.3e}  (ref max {ref:.3e})")
    assert err <= 1e-3 * max(ref, 1.0), "MISMATCH"

    for name, f in [("xla", f_xla), ("pallas", f_pl)]:
        # warm
        jax.block_until_ready(f(d_pairs))
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            out = f(d_pairs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1e3:.3f} ms")


if __name__ == "__main__":
    main()
