"""Mean squared distance to the 3 nearest neighbours — scale seeding at init.

TPU-native replacement for the reference's `simple_knn._C.distCUDA2` CUDA
extension (SURVEY.md §2.9.2, used at `scene/gaussian_model.py:160`). Instead of
the CUDA Morton-sort + box-pruned search, we run a chunked brute-force distance
computation: ‖a−b‖² = ‖a‖² + ‖b‖² − 2a·b, whose dominant term is an (chunk, N)
matmul that lands on the MXU. For init-time point counts (≤ a few million,
called once) this is bandwidth-trivial and needs no spatial structure.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def mean_knn_sq_dist(points: jnp.ndarray, k: int = 3,
                     chunk: int = 1024) -> jnp.ndarray:
    """(N, 3) points -> (N,) mean squared distance to the k nearest neighbours.

    Matches distCUDA2 semantics: self is excluded; result clamped by the
    caller (the model clamps at 1e-7 like `gaussian_model.py:160`).
    """
    n = points.shape[0]
    sq = jnp.sum(points * points, axis=-1)  # (N,)
    nchunk = -(-n // chunk)
    pad = nchunk * chunk - n
    pts_pad = jnp.pad(points, ((0, pad), (0, 0)))
    idx_pad = jnp.pad(jnp.arange(n), (0, pad), constant_values=-1)

    def body(args):
        p, row_idx = args  # (chunk, 3), (chunk,)
        d2 = (jnp.sum(p * p, axis=-1)[:, None] + sq[None, :]
              - 2.0 * p @ points.T)  # (chunk, N)
        # Exclude self-distance.
        cols = jnp.arange(n)[None, :]
        d2 = jnp.where(cols == row_idx[:, None], jnp.inf, d2)
        neg_top, _ = jax.lax.top_k(-d2, k)
        return jnp.mean(jnp.maximum(-neg_top, 0.0), axis=-1)

    out = jax.lax.map(
        body, (pts_pad.reshape(nchunk, chunk, 3),
               idx_pad.reshape(nchunk, chunk)))
    return out.reshape(-1)[:n]
