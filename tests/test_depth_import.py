"""torch-checkpoint → flax importer golden test (pattern of
tests/test_lpips.py): build a tiny timm-style torch ViT, convert its state
dict, and check the flax ViTEncoder reproduces the torch forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from priordepth_gaussiansplatting_tpu.depth import import_torch as it  # noqa: E402
from priordepth_gaussiansplatting_tpu.depth.model import ViTEncoder  # noqa: E402


class TinyTorchViT(tnn.Module):
    """Minimal timm-style ViT (pre-LN, fused qkv, erf GELU, no cls token)."""

    def __init__(self, e=32, depth=2, heads=2, patch=8, grid=4):
        super().__init__()
        self.e, self.heads, self.patch = e, heads, patch
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, e, patch, stride=patch)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, grid * grid, e) * 0.02)
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            b = tnn.Module()
            b.norm1 = tnn.LayerNorm(e)
            b.attn = tnn.Module()
            b.attn.qkv = tnn.Linear(e, 3 * e)
            b.attn.proj = tnn.Linear(e, e)
            b.norm2 = tnn.LayerNorm(e)
            b.mlp = tnn.Module()
            b.mlp.fc1 = tnn.Linear(e, 4 * e)
            b.mlp.fc2 = tnn.Linear(4 * e, e)
            self.blocks.append(b)

    def forward(self, x):  # x: (B, 3, H, W)
        b = x.shape[0]
        tok = self.patch_embed.proj(x)              # (B, E, gh, gw)
        gh, gw = tok.shape[2], tok.shape[3]
        tok = tok.flatten(2).transpose(1, 2)        # (B, N, E)
        tok = tok + self.pos_embed[:, :gh * gw]
        hd = self.e // self.heads
        for blk in self.blocks:
            y = blk.norm1(tok)
            qkv = blk.attn.qkv(y).reshape(b, -1, 3, self.heads, hd)
            q, k, v = qkv.unbind(2)                 # (B, N, H, hd)
            att = torch.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
            att = att.softmax(-1)
            y = torch.einsum("bhnm,bmhd->bnhd", att, v).reshape(
                b, -1, self.e)
            tok = tok + blk.attn.proj(y)
            y = blk.norm2(tok)
            y = blk.mlp.fc2(tnn.functional.gelu(blk.mlp.fc1(y)))
            tok = tok + y
        return tok


def test_torch_vit_roundtrip_matches():
    torch.manual_seed(0)
    model = TinyTorchViT().eval()
    sd = model.state_dict()

    params, geo = it.convert_vit_state_dict(sd, target_grid=(4, 4),
                                            pos_table_rows=64, num_heads=2)
    assert (geo["embed_dim"], geo["depth"], geo["patch_size"],
            geo["mlp_ratio"], geo["num_heads"]) == (32, 2, 8, 4, 2)
    enc = ViTEncoder(embed_dim=32, depth=2, num_heads=2, patch_size=8,
                     taps=(), exact_gelu=True, pos_rows=64)

    x = np.random.RandomState(1).rand(1, 32, 32, 3).astype(np.float32)
    import jax.numpy as jnp
    feats = enc.apply({"params": params}, jnp.asarray(x))
    got = np.asarray(feats[-1]).reshape(1, -1, 32)  # final tokens

    with torch.no_grad():
        want = model(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()

    np.testing.assert_allclose(got, want, atol=1e-4, rtol=2e-4)


def test_pos_embed_resample_identity_and_resize():
    pos = np.random.RandomState(0).rand(1, 16, 8).astype(np.float32)
    same = it.resample_pos_embed(pos, (4, 4))
    np.testing.assert_allclose(same, pos[0], atol=1e-6)
    up = it.resample_pos_embed(pos, (8, 8))
    assert up.shape == (64, 8)
    # with a cls token prepended, it is dropped before resampling
    pos_cls = np.concatenate([np.zeros((1, 1, 8), np.float32), pos], axis=1)
    same2 = it.resample_pos_embed(pos_cls, (4, 4))
    np.testing.assert_allclose(same2, pos[0], atol=1e-6)


def test_graft_validates_shapes():
    import jax

    enc = ViTEncoder(embed_dim=32, depth=2, num_heads=2, patch_size=8)
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)
    torch.manual_seed(0)
    sd = TinyTorchViT().state_dict()
    params, _ = it.convert_vit_state_dict(sd, target_grid=(4, 4),
                                          pos_table_rows=4096, num_heads=2)
    tree = {"params": {"ViTEncoder_0": variables["params"]}}
    out = it.graft_encoder_params(tree, params)
    leaf = out["params"]["ViTEncoder_0"]["Conv_0"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(leaf),
        np.asarray(sd["patch_embed.proj.weight"]).transpose(2, 3, 1, 0))
    # geometry mismatch fails loudly
    bad = {k: v for k, v in params.items()}
    bad["Conv_0"] = {"kernel": np.zeros((2, 2, 3, 32), np.float32),
                     "bias": np.zeros((32,), np.float32)}
    with pytest.raises(ValueError):
        it.graft_encoder_params(tree, bad)


class TinyTorchDinoV2(tnn.Module):
    """Minimal DINOv2-style ViT in the DepthAnythingV2 naming scheme:
    cls token (own positional row), register tokens (inserted after the
    positional add), per-block LayerScale (ls1/ls2.gamma), final norm
    applied to every tap (get_intermediate_layers(norm=True))."""

    def __init__(self, e=32, depth=2, heads=2, patch=8, grid=4, regs=2):
        super().__init__()
        self.e, self.heads, self.patch, self.regs = e, heads, patch, regs
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, e, patch, stride=patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, e) * 0.02)
        self.register_tokens = tnn.Parameter(torch.randn(1, regs, e) * 0.02)
        self.pos_embed = tnn.Parameter(
            torch.randn(1, 1 + grid * grid, e) * 0.02)
        self.blocks = tnn.ModuleList()
        for _ in range(depth):
            b = tnn.Module()
            b.norm1 = tnn.LayerNorm(e)
            b.attn = tnn.Module()
            b.attn.qkv = tnn.Linear(e, 3 * e)
            b.attn.proj = tnn.Linear(e, e)
            b.ls1 = tnn.Module()
            b.ls1.gamma = tnn.Parameter(torch.rand(e) * 0.5 + 0.5)
            b.norm2 = tnn.LayerNorm(e)
            b.mlp = tnn.Module()
            b.mlp.fc1 = tnn.Linear(e, 4 * e)
            b.mlp.fc2 = tnn.Linear(4 * e, e)
            b.ls2 = tnn.Module()
            b.ls2.gamma = tnn.Parameter(torch.rand(e) * 0.5 + 0.5)
            self.blocks.append(b)
        self.norm = tnn.LayerNorm(e)

    def forward(self, x):  # returns per-tap NORMED spatial tokens
        b = x.shape[0]
        tok = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        tok = torch.cat([self.cls_token.expand(b, -1, -1), tok], dim=1)
        tok = tok + self.pos_embed
        tok = torch.cat([tok[:, :1], self.register_tokens.expand(b, -1, -1),
                         tok[:, 1:]], dim=1)
        hd = self.e // self.heads
        taps = []
        for blk in self.blocks:
            y = blk.norm1(tok)
            qkv = blk.attn.qkv(y).reshape(b, -1, 3, self.heads, hd)
            q, k, v = qkv.unbind(2)
            att = torch.einsum("bnhd,bmhd->bhnm", q, k) / np.sqrt(hd)
            y = torch.einsum("bhnm,bmhd->bnhd", att.softmax(-1), v)
            tok = tok + blk.attn.proj(y.reshape(b, -1, self.e)) \
                * blk.ls1.gamma
            y = blk.norm2(tok)
            y = blk.mlp.fc2(tnn.functional.gelu(blk.mlp.fc1(y)))
            tok = tok + y * blk.ls2.gamma
            taps.append(self.norm(tok)[:, 1 + self.regs:])
        return taps


@pytest.mark.parametrize("prefix", ["", "pretrained."])
def test_dinov2_dav2_roundtrip_matches(prefix):
    """A DAv2-vitl-SHAPED state dict (DINOv2 naming, optional `pretrained.`
    backbone prefix as in full DepthAnythingV2 checkpoints) imports into
    the flax encoder with matching activations (VERDICT r03 #4)."""
    torch.manual_seed(3)
    model = TinyTorchDinoV2().eval()
    sd = {prefix + k: v for k, v in model.state_dict().items()}

    params, geo = it.convert_vit_state_dict(sd, target_grid=(4, 4),
                                            pos_table_rows=64, num_heads=2)
    assert geo["use_cls_token"] and geo["layerscale"] and geo["final_norm"]
    assert geo["num_register_tokens"] == 2
    enc = ViTEncoder(embed_dim=32, depth=2, num_heads=2, patch_size=8,
                     taps=(0,), exact_gelu=True, pos_rows=64,
                     use_cls_token=True, num_register_tokens=2,
                     layerscale=True, final_norm=True)

    x = np.random.RandomState(5).rand(1, 32, 32, 3).astype(np.float32)
    import jax.numpy as jnp
    feats = enc.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        want = model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    assert len(feats) == len(want)
    for got_f, want_f in zip(feats, want):
        np.testing.assert_allclose(
            np.asarray(got_f).reshape(1, -1, 32), want_f.numpy(),
            atol=1e-4, rtol=2e-4)


class TinyTorchZoeHead(tnn.Module):
    """Minimal torch ZoeDepth metric head in the reference naming scheme
    (`zoedepth_v1.py:105-202`): conv2 bottleneck, unnormed seed bins
    (softplus config), seed projector + prev_b_embedding chain, inverse
    mean attractors (alpha=1000), rel-depth-conditioned log-binomial."""

    def __init__(self, btlnck=16, emb=16, n_bins=8, attractors=(4, 2),
                 level_ch=(12, 10), last_ch=6,
                 min_temp=0.0212, max_temp=50.0):
        super().__init__()
        self.n_bins, self.min_temp, self.max_temp = n_bins, min_temp, max_temp
        seq = lambda i, m, o, act: tnn.Sequential(
            tnn.Conv2d(i, m, 1), tnn.ReLU(), tnn.Conv2d(m, o, 1), act)
        self.conv2 = tnn.Conv2d(btlnck, btlnck, 1)
        self.seed_bin_regressor = tnn.Module()
        self.seed_bin_regressor._net = seq(btlnck, 256, n_bins,
                                           tnn.Softplus())
        self.seed_projector = tnn.Module()
        self.seed_projector._net = tnn.Sequential(
            tnn.Conv2d(btlnck, 128, 1), tnn.ReLU(), tnn.Conv2d(128, emb, 1))
        self.projectors = tnn.ModuleList()
        self.attractors = tnn.ModuleList()
        for c, a in zip(level_ch, attractors):
            p = tnn.Module()
            p._net = tnn.Sequential(tnn.Conv2d(c, 128, 1), tnn.ReLU(),
                                    tnn.Conv2d(128, emb, 1))
            self.projectors.append(p)
            m = tnn.Module()
            m._net = seq(emb, 128, a, tnn.Softplus())
            self.attractors.append(m)
        self.conditional_log_binomial = tnn.Module()
        clb_in = last_ch + 1 + emb
        self.conditional_log_binomial.mlp = tnn.Sequential(
            tnn.Conv2d(clb_in, clb_in // 2, 1), tnn.GELU(),
            tnn.Conv2d(clb_in // 2, 4, 1), tnn.Softplus())

    def forward(self, taps, rel_depth):
        # taps: [btlnck, level blocks..., last] NCHW; rel_depth (B, H, W)
        F = tnn.functional
        up = lambda z, hw: F.interpolate(z, hw, mode="bilinear",
                                         align_corners=True)
        x = self.conv2(taps[0])
        b_prev = self.seed_bin_regressor._net(x)
        prev_emb = self.seed_projector._net(x)
        for proj, att, blk in zip(self.projectors, self.attractors,
                                  taps[1:-1]):
            emb = proj._net(blk)
            a = att._net(emb + up(prev_emb, emb.shape[-2:]))
            b_centers = up(b_prev, emb.shape[-2:])
            dx = a.unsqueeze(2) - b_centers.unsqueeze(1)
            delta = (dx / (1 + 1000.0 * dx.pow(2))).mean(dim=1)
            b_prev = b_centers + delta
            prev_emb = emb
        last = taps[-1]
        rel = up(rel_depth.unsqueeze(1), last.shape[-2:])
        last = torch.cat([last, rel], dim=1)
        pt = self.conditional_log_binomial.mlp(
            torch.cat([last, up(prev_emb, last.shape[-2:])], dim=1))
        p, t = pt[:, :2] + 1e-4, pt[:, 2:] + 1e-4
        p = p[:, 0] / (p[:, 0] + p[:, 1])
        t = t[:, 0] / (t[:, 0] + t[:, 1])
        t = ((self.max_temp - self.min_temp) * t + self.min_temp).unsqueeze(1)
        K = self.n_bins
        k_idx = torch.arange(K).view(1, -1, 1, 1).float()
        n = torch.tensor(K - 1.0)
        eps = 1e-7
        lb = ((n + eps) * torch.log(n + eps)
              - (k_idx + eps) * torch.log(k_idx + eps)
              - (n - k_idx) * torch.log(n - k_idx + eps))
        xp = p.unsqueeze(1)
        y = (lb + k_idx * torch.log(xp.clamp(1e-4, 1))
             + (K - 1 - k_idx) * torch.log((1 - xp).clamp(1e-4, 1)))
        probs = torch.softmax(y / t, dim=1)
        centers = up(b_prev, probs.shape[-2:])
        return (probs * centers).sum(dim=1), probs, centers


def test_zoedepth_head_roundtrip_matches():
    """A fabricated torch ZoeDepth head state dict imports into the flax
    MetricBinsHead with matching depth/probs/centers (VERDICT r03 #4;
    reference `zoedepth/models/model_io.py:27-91` is the torch-side
    loader this replaces)."""
    import jax
    import jax.numpy as jnp
    from priordepth_gaussiansplatting_tpu.depth.model import MetricBinsHead

    torch.manual_seed(7)
    head = TinyTorchZoeHead().eval()
    params, geo = it.convert_zoedepth_head_state_dict(head.state_dict())
    assert geo == {"n_bins": 8, "bin_embedding_dim": 16,
                   "btlnck_features": 16, "attractors": (4, 2)}

    rng = np.random.RandomState(11)
    taps_t = [torch.from_numpy(rng.rand(1, c, s, s).astype(np.float32))
              for c, s in ((16, 4), (12, 4), (10, 8), (6, 16))]
    rel_t = torch.from_numpy(rng.rand(1, 32, 32).astype(np.float32))
    with torch.no_grad():
        want_d, want_p, want_c = head(taps_t, rel_t)

    flax_head = MetricBinsHead(n_bins=8, bin_embedding_dim=16,
                               attractors=(4, 2), btlnck_features=16)
    taps_f = [jnp.asarray(t.numpy().transpose(0, 2, 3, 1)) for t in taps_t]
    with jax.default_matmul_precision("highest"):
        depth, probs, centers = flax_head.apply(
            {"params": params}, taps_f, jnp.asarray(rel_t.numpy()))
    np.testing.assert_allclose(np.asarray(depth), want_d.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(probs), want_p.numpy().transpose(0, 2, 3, 1),
        atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(centers), want_c.numpy().transpose(0, 2, 3, 1),
        atol=2e-5, rtol=1e-4)
