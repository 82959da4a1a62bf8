#!/usr/bin/env python
"""Measure TPU physical-layout cost of small-minor-dim arrays at N=1M.

If (N, 16, 3) / (N, 3) arrays are lane-padded 3->128 at jit boundaries,
every step's parameter/gradient traffic is inflated ~42x — which would
explain the ~25 ms SH/projection VJP. Times elementwise ops and
boundary-crossing identity on various shapes.

Usage: python tools/layout_probe.py [n]
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
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    key = jax.random.PRNGKey(0)

    for shape in [(n, 16, 3), (n, 48), (48, n), (n, 15, 3), (n, 3), (3, n),
                  (n, 4), (n, 16, 128)]:
        x = jax.random.normal(key, shape, jnp.float32)
        chain_bench(f"x*2+1 {shape}", lambda a: a * 2.0 + 1.0, x)

    # adam-ish update on (N,16,3): 3 arrays in, 3 out
    g = jax.random.normal(key, (n, 16, 3), jnp.float32)
    mu = jnp.zeros((n, 16, 3))
    nu = jnp.zeros((n, 16, 3))

    def adamish(g, mu, nu):
        mu = 0.9 * mu + 0.1 * g
        nu = 0.999 * nu + 0.001 * g * g
        return mu, nu, mu / (jnp.sqrt(nu) + 1e-8)

    chain_bench("adam-ish (n,16,3) x3", adamish, g, mu, nu)

    # outer-product materialisation: basis (N,16) x drgb (N,3) -> (N,16,3)
    b = jax.random.normal(key, (n, 16), jnp.float32)
    d = jax.random.normal(key, (n, 3), jnp.float32)
    chain_bench("outer (n,16)x(n,3)->(n,16,3)",
                lambda b, d: b[:, :, None] * d[:, None, :], b, d)
    chain_bench("outer ->(n,48) reshaped",
                lambda b, d: (b[:, :, None] * d[:, None, :]).reshape(n, 48),
                b, d)
    # transpose costs
    x48 = jax.random.normal(key, (n, 48), jnp.float32)
    chain_bench("transpose (n,48)->(48,n)", lambda a: a.T + 0.0, x48)
    x163 = jax.random.normal(key, (n, 16, 3), jnp.float32)
    chain_bench("reshape (n,16,3)->(n,48)*2",
                lambda a: a.reshape(n, 48) * 2.0, x163)


if __name__ == "__main__":
    main(sys.argv[1:])
