#!/usr/bin/env python
"""Micro-benchmarks for the pair-space index plumbing variants (gather
layouts, cumsum, sort) that dominate the rasterizer step on TPU."""

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
    p = int(argv[1]) if len(argv) > 1 else 4_194_304
    rows = 10
    key = jax.random.PRNGKey(0)
    ids = jax.random.randint(key, (p,), 0, n, dtype=jnp.int32)
    # piecewise-ascending ids (like per-tile runs) — sort within 1024 blocks
    ids_runs = jax.lax.sort(ids.reshape(-1, 1024), dimension=1).reshape(-1)
    attrs = jax.random.normal(key, (rows, n), jnp.float32)
    attrs_t = jnp.asarray(attrs.T)  # (n, rows)
    attrs_pad = jnp.pad(attrs_t, ((0, 0), (0, 128 - rows)))  # (n, 128)
    d_sorted = jax.random.normal(key, (rows, p), jnp.float32)

    bench("gather (rows,P) axis1", jax.jit(lambda a, i: a[:, i]), attrs, ids)
    bench("gather (rows,P) axis1 runs",
          jax.jit(lambda a, i: a[:, i]), attrs, ids_runs)
    bench("gather (N,rows) axis0", jax.jit(lambda a, i: a[i]), attrs_t, ids)
    bench("gather (N,128) axis0", jax.jit(lambda a, i: a[i]), attrs_pad, ids)
    bench("gather (N,rows) axis0 +T",
          jax.jit(lambda a, i: a[i].T), attrs_t, ids)
    bench("one row gather (P,) from (N,)",
          jax.jit(lambda a, i: a[0][i]), attrs, ids)
    bench("cumsum (rows,P) axis1",
          jax.jit(lambda x: jnp.cumsum(x, axis=1)), d_sorted)
    bench("cumsum (P,) single",
          jax.jit(lambda x: jnp.cumsum(x[0])), d_sorted)
    bench("cummax (P,) int32",
          jax.jit(lambda i: jax.lax.cummax(i)), ids)
    pair_pos = jnp.arange(p, dtype=jnp.int32)
    tile = ids >> 7
    bench("sort key+2 payloads", jax.jit(
        lambda t, g, pp: jax.lax.sort((t, g, pp), dimension=0,
                                      is_stable=True, num_keys=1)),
        tile, ids, pair_pos)
    bench("sort key+1 payload", jax.jit(
        lambda t, pp: jax.lax.sort((t, pp), dimension=0,
                                   is_stable=True, num_keys=1)),
        tile, pair_pos)
    bench("sort key+11 payloads", jax.jit(
        lambda t, g, pp, a: jax.lax.sort(
            (t, g, pp) + tuple(a), dimension=0, is_stable=True, num_keys=1)),
        tile, ids, pair_pos, d_sorted)
    bench("argsort (N,) f32", jax.jit(
        lambda d: jnp.argsort(d)), attrs[0])
    bench("scatter-add (rows,N) from (rows,P)", jax.jit(
        lambda d, i: jnp.zeros((rows, n), jnp.float32).at[:, i].add(d)),
        d_sorted, ids)
    bench("segment hi-lo (cumsum+2 gathers)", jax.jit(
        lambda d, lo, hi: (lambda c: c[:, hi] - c[:, lo])(
            jnp.concatenate([jnp.zeros((rows, 1)),
                             jnp.cumsum(d, axis=1)], axis=1))),
        d_sorted, ids[:n].clip(0, p), ids[:n].clip(0, p))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
