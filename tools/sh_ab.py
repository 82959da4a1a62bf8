#!/usr/bin/env python
"""A/B spherical-harmonics evaluation formulations (fwd + VJP) at N=1M.

The projection VJP probe showed sh fwd+vjp ~28 ms (fwd ~3 ms) — the
einsum's transposed forms lower badly on TPU. Variants:

  einsum  — current core/sh.py ('...k,...kc->...c')
  mulsum  — broadcast multiply + reduce over k
  rows    — transpose coeffs to (3K, N) rows, contract column-wise on the
            VPU (attrs-as-rows layout, like ops/binning.pack_attributes)

Usage: python tools/sh_ab.py [n]
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
    from priordepth_gaussiansplatting_tpu.core import sh as shlib

    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    coeffs = jax.random.normal(k1, (n, 16, 3), jnp.float32) * 0.2
    dirs = jax.random.normal(k2, (n, 3), jnp.float32)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    print(f"backend={jax.default_backend()} n={n}", flush=True)

    def vjp_of(fn):
        def run(c, d):
            out, pull = jax.vjp(fn, c, d)
            return pull(jnp.ones_like(out))
        return run

    def einsum_fn(c, d):
        return jnp.maximum(
            jnp.einsum("...k,...kc->...c", shlib.sh_basis(d, 3), c) + 0.5,
            0.0)

    def mulsum_fn(c, d):
        b = shlib.sh_basis(d, 3)                      # (N, 16)
        return jnp.maximum(jnp.sum(b[..., None] * c, axis=-2) + 0.5, 0.0)

    def rows_fn(c, d):
        b = shlib.sh_basis(d, 3)                      # (N, 16)
        ct = c.reshape(n, 48).T                       # (48, N) rows
        bt = b.T                                      # (16, N)
        out = []
        for ch in range(3):
            acc = ct[ch::3][0] * bt[0]
            for kk in range(1, 16):
                acc = acc + ct[ch + 3 * kk] * bt[kk]
            out.append(acc)
        return jnp.maximum(jnp.stack(out, axis=-1) + 0.5, 0.0)

    for name, fn in (("einsum", einsum_fn), ("mulsum", mulsum_fn),
                     ("rows", rows_fn)):
        chain_bench(f"{name} fwd", fn, coeffs, dirs)
        chain_bench(f"{name} fwd+vjp", vjp_of(fn), coeffs, dirs)
        # parity vs einsum
        ref = jax.jit(einsum_fn)(coeffs, dirs)
        got = jax.jit(fn)(coeffs, dirs)
        import numpy as np
        err = float(jnp.max(jnp.abs(ref - got)))
        g_ref = jax.jit(vjp_of(einsum_fn))(coeffs, dirs)
        g_got = jax.jit(vjp_of(fn))(coeffs, dirs)
        gerr = max(float(jnp.max(jnp.abs(a - b)))
                   for a, b in zip(jax.tree.leaves(g_ref),
                                   jax.tree.leaves(g_got)))
        print(f"  {name}: max|d_out|={err:.2e} max|d_grad|={gerr:.2e}",
              flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
