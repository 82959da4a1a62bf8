"""Metric-bins building blocks (reference `zoedepth/models/layers/`):
seed bin regressors, projectors, attractor refinement, conditional
log-binomial distribution head, and the patch-transformer domain router —
re-designed as flax modules (NHWC, bfloat16-friendly, MXU-shaped convs).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def resize_align_corners(x, hw):
    """Bilinear resize with torch `align_corners=True` semantics.

    jax.image.resize only offers half-pixel-centre sampling; the ZoeDepth
    head interpolates bin centres and embeddings with align_corners=True
    (`zoedepth_v1.py` F.interpolate calls), and imported torch weights are
    only activation-exact if the resampling grid matches."""
    th, tw = int(hw[0]), int(hw[1])
    h, w = x.shape[1:3]
    if (h, w) == (th, tw):
        return x
    ys = (jnp.linspace(0.0, h - 1.0, th) if th > 1
          else jnp.zeros((1,), x.dtype))
    xs = (jnp.linspace(0.0, w - 1.0, tw) if tw > 1
          else jnp.zeros((1,), x.dtype))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class SeedBinRegressor(nn.Module):
    """Initial bin widths over [min_depth, max_depth]
    (`localbins_layers.py:29-69` SeedBinRegressor — ReLU widths + 1e-3
    floor, range-normalised, cumsum edges)."""

    n_bins: int = 16
    mlp_dim: int = 256
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) bottleneck features.
        h = nn.Conv(self.mlp_dim, (1, 1))(x)
        h = nn.relu(h)
        w = nn.relu(nn.Conv(self.n_bins, (1, 1))(h)) + 1e-3
        widths_norm = w / jnp.sum(w, axis=-1, keepdims=True)
        widths = (self.max_depth - self.min_depth) * widths_norm
        widths = jnp.concatenate(
            [jnp.full_like(widths[..., :1], self.min_depth), widths],
            axis=-1)
        edges = jnp.cumsum(widths, axis=-1)
        centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
        return widths_norm, centers


class SeedBinRegressorUnnormed(nn.Module):
    """Softplus bin centres without range normalisation (the `*_unnormed`
    variant used by ZoeDepth-N/K single-head configs). min/max_depth are
    accepted-but-unused, mirroring the torch API
    (`localbins_layers.py:72-96`)."""

    n_bins: int = 16
    mlp_dim: int = 256
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mlp_dim, (1, 1))(x)
        h = nn.relu(h)
        centers = nn.softplus(nn.Conv(self.n_bins, (1, 1))(h))
        return centers, centers


class Projector(nn.Module):
    """1×1 conv feature projector (`localbins_layers.py` Projector)."""

    out_features: int = 128
    mlp_dim: int = 128

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.mlp_dim, (1, 1))(x)
        h = nn.relu(h)
        return nn.Conv(self.out_features, (1, 1))(h)


def _attract(dx, alpha, gamma, attractor_type):
    """exp/inv attractor delta (`attractor.py:30-58`)."""
    if attractor_type == "exp":
        return jnp.exp(-alpha * jnp.abs(dx) ** gamma) * dx
    return dx / (1.0 + alpha * dx ** gamma)


def _attractor_delta(a, b_centers, alpha, gamma, kind, attractor_type):
    # a: (B, H, W, A); b_centers: (B, H, W, n_bins)
    dist = _attract(a[..., :, None] - b_centers[..., None, :],
                    alpha, gamma, attractor_type)
    return (jnp.mean(dist, axis=-2) if kind == "mean"
            else jnp.sum(dist, axis=-2))


class AttractorLayer(nn.Module):
    """Bin-centre refinement in NORMALISED bin space (`attractor.py:61-137`
    AttractorLayer): the net emits 2·A channels, the used attractor points
    are the raw first half plus 1e-3 (the reference computes a pairwise
    normalisation and then overwrites it — reproduced faithfully), deltas
    apply to normalised centres, and the scaled output is sorted+clipped."""

    n_bins: int = 16
    n_attractors: int = 16
    mlp_dim: int = 128
    alpha: float = 300.0
    gamma: int = 2
    kind: str = "sum"  # contribution aggregation
    attractor_type: str = "exp"
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, x, b_prev, prev_b_embedding=None):
        # x: (B, H, W, C) embedding; b_prev: (B, h, w, n_bins) NORMALISED
        if prev_b_embedding is not None:
            prev_b_embedding = resize_align_corners(
                prev_b_embedding, x.shape[1:3])
            x = x + prev_b_embedding
        h = nn.relu(nn.Conv(self.mlp_dim, (1, 1))(x))
        a = nn.relu(nn.Conv(self.n_attractors * 2, (1, 1))(h)) + 1e-3
        a = a.reshape(a.shape[:3] + (self.n_attractors, 2))[..., 0]
        b_centers = resize_align_corners(b_prev, x.shape[1:3])
        delta = _attractor_delta(a, b_centers, self.alpha, self.gamma,
                                 self.kind, self.attractor_type)
        b_new = b_centers + delta
        scaled = (self.max_depth - self.min_depth) * b_new + self.min_depth
        scaled = jnp.clip(jnp.sort(scaled, axis=-1), self.min_depth,
                          self.max_depth)
        return b_new, scaled


class AttractorLayerUnnormed(nn.Module):
    """Unbounded bin-centre refinement (`attractor.py:139-214`
    AttractorLayerUnnormed — the `softplus` bin_centers_type both ZoeDepth
    configs ship with): softplus attractor points, deltas applied directly
    in metric space, no clipping."""

    n_bins: int = 16
    n_attractors: int = 16
    mlp_dim: int = 128
    alpha: float = 300.0
    gamma: int = 2
    kind: str = "sum"
    attractor_type: str = "exp"
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, x, b_prev, prev_b_embedding=None):
        if prev_b_embedding is not None:
            prev_b_embedding = resize_align_corners(
                prev_b_embedding, x.shape[1:3])
            x = x + prev_b_embedding
        h = nn.relu(nn.Conv(self.mlp_dim, (1, 1))(x))
        a = nn.softplus(nn.Conv(self.n_attractors, (1, 1))(h))
        b_centers = resize_align_corners(b_prev, x.shape[1:3])
        delta = _attractor_delta(a, b_centers, self.alpha, self.gamma,
                                 self.kind, self.attractor_type)
        b_new = b_centers + delta
        return b_new, b_new


class ConditionalLogBinomial(nn.Module):
    """Per-pixel log-binomial mixture over bins conditioned on features
    (`dist_layers.py:73-120` + the Stirling `log_binom` of `:29-33`)."""

    n_bins: int = 16
    bottleneck_factor: int = 2
    p_eps: float = 1e-4
    min_temp: float = 1e-7
    max_temp: float = 50.0

    @nn.compact
    def __call__(self, feat, cond):
        x = jnp.concatenate([feat, cond], axis=-1)
        bottleneck = x.shape[-1] // self.bottleneck_factor
        h = nn.Conv(bottleneck, (1, 1))(x)
        h = nn.gelu(h, approximate=False)
        pt = nn.softplus(nn.Conv(4, (1, 1))(h))
        p = pt[..., 0:2] + self.p_eps
        p = p[..., 0:1] / (p[..., 0:1] + p[..., 1:2])  # binomial p
        t = pt[..., 2:4] + self.p_eps
        t = t[..., 0:1] / (t[..., 0:1] + t[..., 1:2])
        t = (self.max_temp - self.min_temp) * t + self.min_temp
        # Stirling log-binomial (`dist_layers.py:29-33`): n log n − k log k
        # − (n−k) log(n−k), all eps-shifted.
        eps = 1e-7
        ki = jnp.arange(self.n_bins, dtype=x.dtype)
        k = ki + eps
        n = jnp.asarray(self.n_bins - 1, x.dtype) + eps
        # jnp.maximum guards the n == k endpoint: XLA's algebraic
        # simplifier cancels the two epsilons in `n - k + eps`, turning the
        # torch-faithful `log(n - k + eps)` into log(0) = -inf and the
        # 0·(-inf) product into NaN under jit (values match torch either
        # way: the last term is exactly zero).
        log_binom = (n * jnp.log(n) - k * jnp.log(k)
                     - (n - k) * jnp.log(jnp.maximum(n - k + eps, eps)))
        pc = jnp.clip(p, 1e-4, 1.0)
        one_minus = jnp.clip(1 - p, 1e-4, 1.0)
        logits = (log_binom + ki * jnp.log(pc)
                  + (self.n_bins - 1 - ki) * jnp.log(one_minus))
        return jax.nn.softmax(logits / t, axis=-1)  # (B, H, W, n_bins)


class PatchTransformerEncoder(nn.Module):
    """Patch transformer with a learnable class token — the ZoeDepth-NK
    domain router (`patch_transformer.py:30-91`)."""

    embed_dim: int = 128
    num_heads: int = 4
    num_layers: int = 4
    patch_size: int = 10

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) -> patches (B, N, E)
        p = self.patch_size
        tokens = nn.Conv(self.embed_dim, (p, p), strides=(p, p))(x)
        b, h, w, e = tokens.shape
        tokens = tokens.reshape(b, h * w, e)
        cls = self.param("cls_token", nn.initializers.normal(0.02),
                         (1, 1, e))
        tokens = jnp.concatenate(
            [jnp.tile(cls, (b, 1, 1)), tokens], axis=1)
        n = tokens.shape[1]
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 512, e))
        tokens = tokens + pos[:, :n]
        for _ in range(self.num_layers):
            y = nn.LayerNorm()(tokens)
            y = nn.SelfAttention(num_heads=self.num_heads)(y)
            tokens = tokens + y
            y = nn.LayerNorm()(tokens)
            y = nn.Dense(4 * e)(y)
            y = nn.gelu(y)
            y = nn.Dense(e)(y)
            tokens = tokens + y
        return tokens  # [:, 0] is the class/router token
