"""Trustworthy timing on the axon TPU tunnel.

The tunnel's runtime is lazy: `block_until_ready` does NOT force remote
execution, so timing loops of independent calls can measure dispatch only
(elided work), and a single host transfer costs a ~30 ms round trip.

`chain_bench` times a stage by running it `iters` times INSIDE one jitted
fori_loop with a scalar dependency threaded through a perturbation of the
first argument — XLA cannot hoist or elide any iteration, and the final
scalar is fetched once. The loop-carried perturbation adds one broadcast
add over the first argument per iteration; pass a small `probe_arg` (or
accept the ~0.1-0.3 ms bias for big ones and compare variants, not
absolutes).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _perturb(tree, s):
    """Add a runtime-zero derived from scalar s to every array leaf: creates
    a data dependency the lazy runtime cannot elide, without changing
    values (float: +1e-38-scaled, rounds away; int: +0)."""
    def one(x):
        if not hasattr(x, "dtype"):
            return x
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + (s * 1e-38).astype(x.dtype)
        if jnp.issubdtype(x.dtype, jnp.integer):
            return x + (s * 1e-38).astype(x.dtype)
        return x
    return jax.tree.map(one, tree)


def chain_bench(name, fn, *args, iters: int = 10, quiet: bool = False):
    """Seconds per call of fn(*args), forced via a scalar dependency chain.

    Each dispatch's inputs depend on the previous dispatch's output scalar,
    so the lazy runtime must execute every call; the host round trip and
    dispatch overheads cancel in the two-point difference."""

    def step(s, *a):
        out = fn(*_perturb(a, s))
        leaves = [x for x in jax.tree.leaves(out) if hasattr(x, "dtype")]
        acc = jnp.float32(0.0)
        # Consume EVERY leaf: XLA deletes unused sort payloads / outputs,
        # silently turning the measurement into a different program.
        for x in leaves:
            acc = acc + x.ravel()[-1].astype(jnp.float32)
        return acc

    f = jax.jit(step)

    def run(n):
        s = jnp.float32(0.0)
        t0 = time.perf_counter()
        for _ in range(n):
            s = f(s, *args)
        float(s)
        return time.perf_counter() - t0

    run(1)  # warmup / compile
    lo = run(2)
    hi = run(iters + 2)
    dt = max(hi - lo, 1e-9) / iters
    if not quiet:
        print(f"{name:<44} {dt * 1000:8.2f} ms", flush=True)
    return dt
