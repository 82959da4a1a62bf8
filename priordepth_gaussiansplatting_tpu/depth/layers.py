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


class SeedBinRegressor(nn.Module):
    """Initial bin widths over [min_depth, max_depth]
    (`localbins_layers.py` SeedBinRegressor — normalised softplus widths)."""

    n_bins: int = 16
    mlp_dim: int = 256
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C) bottleneck features.
        h = nn.Conv(self.mlp_dim, (1, 1))(x)
        h = nn.relu(h)
        w = nn.Conv(self.n_bins, (1, 1))(h)
        w = nn.softplus(w)
        widths_norm = w / jnp.sum(w, axis=-1, keepdims=True)
        widths = (self.max_depth - self.min_depth) * widths_norm
        edges = self.min_depth + jnp.cumsum(widths, axis=-1)
        edges = jnp.concatenate(
            [jnp.full_like(edges[..., :1], self.min_depth), edges], axis=-1)
        centers = 0.5 * (edges[..., :-1] + edges[..., 1:])
        return widths_norm, centers


class SeedBinRegressorUnnormed(nn.Module):
    """Softplus bin centres without range normalisation (the `*_unnormed`
    variant used by ZoeDepth-N/K single-head configs)."""

    n_bins: int = 16
    mlp_dim: int = 256

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


class AttractorLayer(nn.Module):
    """Bin-centre refinement: each attractor pulls nearby bin centres
    (`attractor.py:30-59`, inverse attractor variant with alpha/gamma)."""

    n_bins: int = 16
    n_attractors: int = 16
    mlp_dim: int = 128
    alpha: float = 300.0
    gamma: int = 2
    kind: str = "mean"  # contribution aggregation
    min_depth: float = 1e-3
    max_depth: float = 10.0

    @nn.compact
    def __call__(self, feat, bin_centers):
        # feat: (B, H, W, C); bin_centers: (B, h, w, n_bins)
        h = nn.Conv(self.mlp_dim, (1, 1))(feat)
        h = nn.relu(h)
        attractors = nn.softplus(
            nn.Conv(self.n_attractors, (1, 1))(h))  # (B, H, W, A)
        bh, bw = bin_centers.shape[1:3]
        if attractors.shape[1:3] != (bh, bw):
            attractors = jax.image.resize(
                attractors,
                attractors.shape[:1] + (bh, bw) + attractors.shape[-1:],
                method="bilinear")
        # Inverse attractor: dc = Σ_a dist / (1 + alpha·|dist|^gamma)
        dist = attractors[..., None, :] - bin_centers[..., :, None]
        force = dist / (1.0 + self.alpha * jnp.abs(dist) ** self.gamma)
        delta = (jnp.mean(force, axis=-1) if self.kind == "mean"
                 else jnp.sum(force, axis=-1))
        centers = jnp.clip(bin_centers + delta, self.min_depth,
                           self.max_depth)
        return centers


class ConditionalLogBinomial(nn.Module):
    """Per-pixel log-binomial mixture over bins conditioned on features
    (`dist_layers.py:73-121`)."""

    n_bins: int = 16
    cond_dim: int = 128
    bottleneck: int = 64
    p_eps: float = 1e-4

    @nn.compact
    def __call__(self, feat, cond):
        x = jnp.concatenate([feat, cond], axis=-1)
        h = nn.Conv(self.bottleneck, (1, 1))(x)
        h = nn.gelu(h)
        pt = nn.softplus(nn.Conv(4, (1, 1))(h)) + self.p_eps
        p = pt[..., 0:1] / (pt[..., 0:1] + pt[..., 1:2])  # binomial p
        t = pt[..., 2:3] / (pt[..., 2:3] + pt[..., 3:4])  # temperature
        k = jnp.arange(self.n_bins, dtype=x.dtype)
        n = self.n_bins - 1
        log_binom = (jax.scipy.special.gammaln(n + 1)
                     - jax.scipy.special.gammaln(k + 1)
                     - jax.scipy.special.gammaln(n - k + 1)
                     + k * jnp.log(jnp.clip(p, 1e-6, 1 - 1e-6))
                     + (n - k) * jnp.log(jnp.clip(1 - p, 1e-6, 1 - 1e-6)))
        logits = log_binom / jnp.maximum(t, 1e-4)
        return jax.nn.softmax(logits, axis=-1)  # (B, H, W, n_bins)


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
