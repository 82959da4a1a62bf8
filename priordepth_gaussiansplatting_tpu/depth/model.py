"""Metric monodepth models: ViT encoder + DPT-style decoder + metric-bins
head, with a two-expert router variant.

TPU-native counterpart of the reference model zoo
(`zoedepth/models/{base_models/midas.py, zoedepth/zoedepth_v1.py,
zoedepth_nk/zoedepth_nk_v1.py}`): the frozen torch-hub MiDaS BEiT backbone
becomes a flax ViT trained/loaded natively; the relative-depth core exposes
multi-scale feature taps exactly like MidasCore's forward hooks
(out_conv, l4_rn, r4, r3, r2, r1), which feed the metric-bins head
(seed bins → projector+attractor refinement per level → conditional
log-binomial → depth = Σ p·c). `DepthModelNK` adds the patch-transformer
router with two (nyu/kitti-style) bin configurations
(`zoedepth_nk_v1.py:100-112`).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import (AttractorLayer, AttractorLayerUnnormed,
                     ConditionalLogBinomial, PatchTransformerEncoder,
                     Projector, SeedBinRegressor, SeedBinRegressorUnnormed,
                     resize_align_corners)


class ViTEncoder(nn.Module):
    """Plain ViT encoder with patch tokens reassembled to a feature grid."""

    embed_dim: int = 384
    depth: int = 6
    num_heads: int = 0  # 0 = auto (embed_dim // 64)
    patch_size: int = 16
    taps: Sequence[int] = (1, 3, 5)
    # torch checkpoints (MiDaS/DepthAnything ViTs) use the exact erf GELU;
    # flax's default is the tanh approximation. Imported weights set True
    # (depth/import_torch.py) so activations match bit-for-bit-ish.
    exact_gelu: bool = False
    pos_rows: int = 4096  # positional-table capacity (max patches)
    # DINOv2/DepthAnythingV2 geometry (`dinov2/models/vision_transformer.py`
    # via the reference's DAv2 recipe, README.md:56-75): a class token with
    # its own positional embedding, optional register tokens (appended
    # AFTER the positional add, exactly as DINOv2 does), per-block
    # LayerScale multipliers, and the final LayerNorm applied to every
    # feature tap (get_intermediate_layers(norm=True) semantics).
    use_cls_token: bool = False
    num_register_tokens: int = 0
    layerscale: bool = False
    final_norm: bool = False
    # torch nn.LayerNorm eps (flax default is 1e-6); imported torch
    # weights are only activation-exact with the torch epsilon.
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3); H, W divisible by patch_size.
        p = self.patch_size
        b, h, w, _ = x.shape
        gh, gw = h // p, w // p
        tok = nn.Conv(self.embed_dim, (p, p), strides=(p, p))(x)
        tok = tok.reshape(b, gh * gw, self.embed_dim)
        # Resolution-agnostic positional table (sliced per input size) so
        # the same params serve padded/TTA resolutions.
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, self.pos_rows, self.embed_dim))
        tok = tok + pos[:, :gh * gw]
        n_extra = 0
        if self.use_cls_token:
            cls = self.param("cls_token", nn.initializers.normal(0.02),
                             (1, 1, self.embed_dim))
            cls_pos = self.param("cls_pos_embed", nn.initializers.zeros,
                                 (1, 1, self.embed_dim))
            tok = jnp.concatenate(
                [jnp.tile(cls + cls_pos, (b, 1, 1)), tok], axis=1)
            n_extra += 1
        if self.num_register_tokens:
            reg = self.param("register_tokens",
                             nn.initializers.normal(0.02),
                             (1, self.num_register_tokens, self.embed_dim))
            # registers sit between cls and patches, positional-free
            tok = jnp.concatenate(
                [tok[:, :n_extra], jnp.tile(reg, (b, 1, 1)),
                 tok[:, n_extra:]], axis=1)
            n_extra += self.num_register_tokens
        heads = self.num_heads or max(self.embed_dim // 64, 1)
        norm_out = (nn.LayerNorm(epsilon=self.ln_eps, name="final_norm")
                    if self.final_norm else (lambda z: z))

        def spatial(z):
            return norm_out(z[:, n_extra:]).reshape(b, gh, gw,
                                                    self.embed_dim)

        feats = []
        for i in range(self.depth):
            y = nn.LayerNorm(epsilon=self.ln_eps)(tok)
            y = nn.SelfAttention(num_heads=heads)(y)
            if self.layerscale:
                y = y * self.param(f"ls1_{i}", nn.initializers.ones,
                                   (self.embed_dim,))
            tok = tok + y
            y = nn.LayerNorm(epsilon=self.ln_eps)(tok)
            y = nn.Dense(4 * self.embed_dim)(y)
            y = nn.gelu(y, approximate=not self.exact_gelu)
            y = nn.Dense(self.embed_dim)(y)
            if self.layerscale:
                y = y * self.param(f"ls2_{i}", nn.initializers.ones,
                                   (self.embed_dim,))
            tok = tok + y
            if i in self.taps:
                feats.append(spatial(tok))
        feats.append(spatial(tok))
        return feats  # low→high depth


class DPTDecoder(nn.Module):
    """Fusion decoder producing the MidasCore-style multi-scale taps."""

    features: int = 128

    @nn.compact
    def __call__(self, enc_feats, out_hw):
        # enc_feats: list of (B, gh, gw, E); refine coarsest→finest.
        x = None
        taps = []
        for feat in reversed(enc_feats):
            f = nn.Conv(self.features, (3, 3))(feat)
            if x is None:
                x = f
            else:
                x = jax.image.resize(x, f.shape, method="bilinear") + f
            x = nn.relu(nn.Conv(self.features, (3, 3))(x))
            taps.append(x)
        # Upsample head to half input resolution (the rel-depth feature map).
        out = jax.image.resize(
            x, (x.shape[0], out_hw[0] // 2, out_hw[1] // 2, self.features),
            method="bilinear")
        out = nn.relu(nn.Conv(self.features, (3, 3))(out))
        rel_depth = nn.Conv(1, (1, 1))(out)[..., 0]
        # taps: [l4_rn(coarsest), r4, r3, r2]; out = r1-equivalent
        return rel_depth, [*taps, out]


class MetricBinsHead(nn.Module):
    """Seed bins → per-level attractor refinement → log-binomial → depth,
    mirroring the torch ZoeDepth head dataflow exactly
    (`zoedepth_v1.py:124-202`): a bottleneck 1×1 conv, a seed projector
    feeding a `prev_b_embedding` chain through the attractors, and the
    relative-depth map concatenated onto the finest features before the
    conditional log-binomial. Submodules carry the torch module names so
    `depth/import_torch.convert_zoedepth_head_state_dict` maps onto them."""

    n_bins: int = 16
    bin_embedding_dim: int = 128
    min_depth: float = 1e-3
    max_depth: float = 10.0
    attractors: Sequence[int] = (16, 8, 4, 1)
    # reference config_zoedepth.json:5-15 defaults
    bin_centers_type: str = "softplus"
    attractor_alpha: float = 1000.0
    attractor_gamma: int = 2
    attractor_kind: str = "mean"
    attractor_type: str = "inv"
    min_temp: float = 0.0212
    max_temp: float = 50.0
    btlnck_features: int = 0  # 0 = same as the bottleneck tap's channels

    @nn.compact
    def __call__(self, taps, rel_depth=None):
        # taps: [bottleneck(coarsest), level blocks..., last(finest)],
        # each (B, h, w, C); rel_depth: (B, H, W) relative-depth map.
        btlnck = taps[0]
        c = self.btlnck_features or btlnck.shape[-1]
        x = nn.Conv(c, (1, 1), name="conv2")(btlnck)
        normed = self.bin_centers_type == "normed"
        seed_cls = SeedBinRegressor if normed else SeedBinRegressorUnnormed
        _, seed_centers = seed_cls(
            n_bins=self.n_bins, min_depth=self.min_depth,
            max_depth=self.max_depth, name="seed_bin_regressor")(x)
        b_prev = ((seed_centers - self.min_depth)
                  / (self.max_depth - self.min_depth)
                  if normed else seed_centers)
        prev_emb = Projector(out_features=self.bin_embedding_dim,
                             name="seed_projector")(x)
        att_cls = AttractorLayer if normed else AttractorLayerUnnormed
        centers = seed_centers
        for level, feat in enumerate(taps[1:len(self.attractors) + 1]):
            emb = Projector(out_features=self.bin_embedding_dim,
                            name=f"projector_{level}")(feat)
            b_prev, centers = att_cls(
                n_bins=self.n_bins,
                n_attractors=self.attractors[level],
                alpha=self.attractor_alpha, gamma=self.attractor_gamma,
                kind=self.attractor_kind,
                attractor_type=self.attractor_type,
                min_depth=self.min_depth, max_depth=self.max_depth,
                name=f"attractor_{level}")(emb, b_prev, prev_emb)
            prev_emb = emb
        last = taps[-1]
        if rel_depth is not None:
            rel = resize_align_corners(rel_depth[..., None],
                                       last.shape[1:3])
            last = jnp.concatenate([last, rel], axis=-1)
        cond = resize_align_corners(prev_emb, last.shape[1:3])
        probs = ConditionalLogBinomial(
            n_bins=self.n_bins, min_temp=self.min_temp,
            max_temp=self.max_temp,
            name="conditional_log_binomial")(last, cond)
        centers = resize_align_corners(centers, probs.shape[1:3])
        depth = jnp.sum(probs * centers, axis=-1)  # (B, h, w)
        return depth, probs, centers


class DepthModel(nn.Module):
    """Single-head metric depth model (ZoeDepth-style)."""

    min_depth: float = 1e-3
    max_depth: float = 10.0
    n_bins: int = 16
    embed_dim: int = 384
    encoder_depth: int = 6
    # reference `bin_centers_type` knob (config_zoedepth.json:7): "softplus"
    # (unbounded, the shipped default) or "normed" (range-bounded — much
    # faster to converge on short runs, centers span [min,max] from init)
    bin_centers_type: str = "softplus"

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3) in [0, 1].
        feats = ViTEncoder(embed_dim=self.embed_dim,
                           depth=self.encoder_depth)(x)
        rel_depth, taps = DPTDecoder()(feats, x.shape[1:3])
        depth, probs, centers = MetricBinsHead(
            n_bins=self.n_bins, min_depth=self.min_depth,
            max_depth=self.max_depth,
            bin_centers_type=self.bin_centers_type)(taps, rel_depth)
        depth = jax.image.resize(depth, x.shape[:3], method="bilinear")
        return {"metric_depth": depth, "rel_depth": rel_depth,
                "probs": probs, "bin_centers": centers}


class DepthModelNK(nn.Module):
    """Two-expert variant with a learned patch-transformer router
    (`zoedepth_nk_v1.py`): one head per depth-range config, routed by the
    class token (hard route at inference, soft mix while training)."""

    configs: Sequence[dict] = (
        dict(name="nyu", min_depth=1e-3, max_depth=10.0),
        dict(name="kitti", min_depth=1e-3, max_depth=80.0),
    )
    n_bins: int = 16
    embed_dim: int = 384
    encoder_depth: int = 6
    bin_centers_type: str = "softplus"

    @nn.compact
    def __call__(self, x, hard_route: bool = False):
        feats = ViTEncoder(embed_dim=self.embed_dim,
                           depth=self.encoder_depth)(x)
        rel_depth, taps = DPTDecoder()(feats, x.shape[1:3])
        tokens = PatchTransformerEncoder()(taps[0])
        logits = nn.Dense(len(self.configs))(tokens[:, 0])  # (B, 2)
        route = jax.nn.softmax(logits, axis=-1)
        depths = []
        for cfg in self.configs:
            d, _, _ = MetricBinsHead(
                n_bins=self.n_bins, min_depth=cfg["min_depth"],
                max_depth=cfg["max_depth"],
                bin_centers_type=self.bin_centers_type,
                name=f"head_{cfg['name']}")(taps, rel_depth)
            depths.append(jax.image.resize(d, x.shape[:3],
                                           method="bilinear"))
        stacked = jnp.stack(depths, axis=-1)  # (B, H, W, 2)
        if hard_route:
            sel = jnp.argmax(route, axis=-1)
            depth = jnp.take_along_axis(
                stacked, sel[:, None, None, None], axis=-1)[..., 0]
        else:
            depth = jnp.sum(stacked * route[:, None, None, :], axis=-1)
        return {"metric_depth": depth, "rel_depth": rel_depth,
                "domain_logits": logits}
