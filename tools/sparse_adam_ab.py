#!/usr/bin/env python
"""Quantify sparse vs dense Adam on TPU (VERDICT item: the reference's
SparseGaussianAdam CUDA kernel exists to SKIP work for invisible rows;
the TPU implementation is a masked dense update, so this measures whether
masking costs anything at realistic visibility rates).

Measures `adam_update` dense vs sparse (20% visibility) on 1M-row params.

Usage: python tools/sparse_adam_ab.py [n]
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
    from priordepth_gaussiansplatting_tpu.models.gaussians import \
        GaussianParams
    from priordepth_gaussiansplatting_tpu.train import optim

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    params = GaussianParams(
        xyz=jax.random.normal(ks[0], (n, 3)),
        features_dc=jax.random.normal(ks[1], (n, 3)),
        features_rest=jax.random.normal(ks[2], (n, 45)),
        scaling=jax.random.normal(ks[3], (n, 3)),
        rotation=jax.random.normal(ks[4], (n, 4)),
        opacity=jax.random.normal(ks[5], (n, 1)),
        exposure=jax.random.normal(ks[6], (8, 3, 4)),
    )
    grads = jax.tree.map(lambda x: x * 0.01, params)
    state = optim.init_adam(params)
    lrs = optim.LearningRates(*(jnp.float32(1e-3),) * 7)
    vis = (jax.random.uniform(ks[7], (n,)) < 0.2)

    print(f"backend={jax.default_backend()} n={n} "
          f"visible={float(vis.mean()):.2f}", flush=True)

    def dense(p, g, s):
        return optim.adam_update(p, g, s, lrs)

    def sparse(p, g, s):
        return optim.adam_update(p, g, s, lrs, visibility=vis, sparse=True)

    dt_d = chain_bench("dense adam_update", dense, params, grads, state)
    dt_s = chain_bench("sparse adam_update (20% visible)", sparse, params,
                       grads, state)
    # Bytes moved: params+grads+2 moments read, params+2 moments written
    # = 6 reads + 3 writes of ~59 f32/row.
    rows = 3 + 3 + 45 + 3 + 4 + 1
    gb = n * rows * 4 * 9 / 1e9
    print(f"dense {gb / dt_d:.0f} GB/s eff, sparse {gb / dt_s:.0f} GB/s eff; "
          f"sparse/dense = {dt_s / dt_d:.3f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
