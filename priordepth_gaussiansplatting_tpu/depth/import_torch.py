"""torch ViT checkpoint → flax ViTEncoder parameter importer.

The reference's depth-prior pipeline draws its value from a PRETRAINED
backbone (`zoedepth/models/base_models/midas.py:341` torch-hub MiDaS;
DepthAnythingV2 per the reference README). This module makes such
checkpoints usable by the native flax stack the day they are available
offline: it shape-maps a standard timm/DINOv2-style ViT state dict
(patch_embed / pos_embed / blocks.N.{norm1,attn.qkv,attn.proj,norm2,
mlp.fc1,mlp.fc2}) onto `depth.model.ViTEncoder`'s parameter tree, inferring
the geometry (embed dim, depth, heads, patch size) from the tensor shapes
(`zoedepth/models/model_io.py:27-91` is the torch-side analog).

Notes:
  * works on a plain dict of numpy/torch tensors — no torch import needed
    unless you pass a file path saved by torch.
  * the class token is dropped (our encoder is cls-free; MidasCore taps
    spatial tokens only) and the positional table is bilinearly resampled
    to a caller-specified inference grid, stored row-major in the
    encoder's `pos_embed` table (exact when inference runs at that grid).
  * torch ViTs use the exact erf GELU — build the flax model with
    `exact_gelu=True` for faithful activations.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _np(t):
    if isinstance(t, np.ndarray):
        return t
    try:  # torch tensor without importing torch at module scope
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def load_state_dict(path_or_dict) -> dict:
    """A state dict from a torch .pt/.pth file (or pass a dict through).

    Accepts the common wrappers (`{"model": sd}`, `{"state_dict": sd}`)
    and strips `module.` DDP prefixes, like the reference
    `model_io.load_state_dict` (`zoedepth/models/model_io.py:27-52`)."""
    if isinstance(path_or_dict, Mapping):
        sd = dict(path_or_dict)
    else:
        import torch  # noqa: PLC0415
        sd = torch.load(path_or_dict, map_location="cpu",
                        weights_only=False)
    for key in ("model", "state_dict", "params"):
        if key in sd and isinstance(sd[key], Mapping):
            sd = dict(sd[key])
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in sd.items()}


def strip_prefix(sd: Mapping, prefix: str) -> dict:
    """Keep only keys under `prefix`, with the prefix removed.

    DepthAnythingV2 checkpoints store the DINOv2 backbone under
    `pretrained.` and the DPT head under `depth_head.`
    (`/root/reference/README.md:61-75` invocation); ZoeDepth stores the
    MiDaS backbone under `core.core.` (`zoedepth/models/model_io.py`)."""
    return {k[len(prefix):]: v for k, v in sd.items()
            if k.startswith(prefix)}


def detect_backbone_prefix(sd: Mapping) -> str:
    """Find the ViT-backbone key prefix inside a composite checkpoint."""
    for prefix in ("", "pretrained.", "core.core.pretrained.model.",
                   "core.core."):
        if prefix + "patch_embed.proj.weight" in sd:
            return prefix
    raise KeyError("no ViT patch_embed found under known prefixes")


def infer_vit_geometry(sd: Mapping) -> dict:
    """(embed_dim, depth, num_heads, patch_size, mlp_ratio) plus the
    DINOv2 feature flags (cls/register tokens, layerscale, final norm),
    all inferred from tensor shapes and key presence."""
    pw = _np(sd["patch_embed.proj.weight"])  # (E, 3, p, p)
    embed_dim, _, patch, _ = pw.shape
    depth = 1 + max(int(k.split(".")[1]) for k in sd
                    if k.startswith("blocks."))
    fc1 = _np(sd["blocks.0.mlp.fc1.weight"])
    mlp_ratio = fc1.shape[0] // embed_dim
    regs = (_np(sd["register_tokens"]).shape[1]
            if "register_tokens" in sd else 0)
    # heads are not recoverable from shapes; default to dim//64 (every
    # MiDaS/DAv2/DINOv2 ViT uses 64-dim heads).
    return dict(embed_dim=int(embed_dim), depth=int(depth),
                num_heads=max(int(embed_dim // 64), 1),
                patch_size=int(patch), mlp_ratio=int(mlp_ratio),
                use_cls_token="cls_token" in sd,
                num_register_tokens=int(regs),
                layerscale="blocks.0.ls1.gamma" in sd,
                final_norm="norm.weight" in sd)


def resample_pos_embed(pos: np.ndarray, target_grid, drop_cls: bool = True
                       ) -> np.ndarray:
    """(1, N(+1), E) torch pos table → (target_h*target_w, E), bilinear.

    The torch table is a flattened square grid (optionally with a leading
    class token); the target grid is the inference patch grid."""
    import jax  # noqa: PLC0415
    import jax.numpy as jnp  # noqa: PLC0415

    pos = _np(pos)[0]
    if drop_cls and int(np.sqrt(pos.shape[0])) ** 2 != pos.shape[0]:
        pos = pos[1:]
    g = int(np.sqrt(pos.shape[0]))
    assert g * g == pos.shape[0], f"pos table len {pos.shape[0]} not square"
    th, tw = target_grid
    grid = pos.reshape(g, g, -1)
    out = jax.image.resize(jnp.asarray(grid), (th, tw, grid.shape[-1]),
                           method="bilinear")
    return np.asarray(out).reshape(th * tw, -1)


def convert_vit_state_dict(sd: Mapping, target_grid=(24, 24),
                           pos_table_rows: int = 4096,
                           num_heads: int | None = None
                           ) -> tuple[dict, dict]:
    """timm-style ViT state dict → flax `ViTEncoder` params + geometry.

    Returns `(params, geometry)`; `params` is the pytree for
    `ViTEncoder(...).apply({"params": params}, x)` with the geometry's
    embed_dim/depth/num_heads/patch_size (and `exact_gelu=True`).
    `num_heads` overrides the dim//64 inference for non-standard models
    (head count is not recoverable from tensor shapes).

    Handles both timm-style ViTs (MiDaS) and DINOv2/DepthAnythingV2
    state dicts: a `pretrained.` (DAv2) backbone prefix is stripped, the
    class token keeps its own positional row, register tokens transfer
    verbatim, per-block LayerScale gammas map to the `ls{1,2}_{i}`
    multipliers, and the final `norm` maps to the shared tap LayerNorm."""
    sd = {k: _np(v) for k, v in sd.items()}
    prefix = detect_backbone_prefix(sd)
    if prefix:
        sd = strip_prefix(sd, prefix)
    geo = infer_vit_geometry(sd)
    if num_heads is not None:
        geo["num_heads"] = int(num_heads)
    e, heads = geo["embed_dim"], geo["num_heads"]
    hd = e // heads

    params: dict = {}
    # patch embed: torch conv (E, 3, p, p) -> flax (p, p, 3, E)
    params["Conv_0"] = {
        "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        "bias": sd["patch_embed.proj.bias"],
    }
    # positional table, resampled to the inference grid, zero-padded.
    pos = resample_pos_embed(sd["pos_embed"], target_grid)
    table = np.zeros((1, pos_table_rows, e), np.float32)
    table[0, :pos.shape[0]] = pos
    params["pos_embed"] = table
    if geo["use_cls_token"]:
        params["cls_token"] = sd["cls_token"].reshape(1, 1, e)
        raw_pos = _np(sd["pos_embed"])[0]
        has_cls_pos = int(np.sqrt(raw_pos.shape[0])) ** 2 != raw_pos.shape[0]
        params["cls_pos_embed"] = (
            raw_pos[:1].reshape(1, 1, e) if has_cls_pos
            else np.zeros((1, 1, e), np.float32))
    if geo["num_register_tokens"]:
        params["register_tokens"] = sd["register_tokens"].reshape(
            1, geo["num_register_tokens"], e)
    if geo["final_norm"]:
        params["final_norm"] = {"scale": sd["norm.weight"],
                                "bias": sd["norm.bias"]}

    def lin(w, b):  # torch (out, in) -> flax kernel (in, out)
        return {"kernel": w.T.astype(np.float32),
                "bias": b.astype(np.float32)}

    for i in range(geo["depth"]):
        pre = f"blocks.{i}."
        if geo["layerscale"]:
            params[f"ls1_{i}"] = sd[pre + "ls1.gamma"]
            params[f"ls2_{i}"] = sd[pre + "ls2.gamma"]
        params[f"LayerNorm_{2 * i}"] = {
            "scale": sd[pre + "norm1.weight"],
            "bias": sd[pre + "norm1.bias"]}
        qkv_w = sd[pre + "attn.qkv.weight"]          # (3E, E)
        qkv_b = sd[pre + "attn.qkv.bias"]            # (3E,)
        qw, kw, vw = np.split(qkv_w, 3, axis=0)      # each (E, E)
        qb, kb, vb = np.split(qkv_b, 3, axis=0)
        attn = {}
        for name, w, b in (("query", qw, qb), ("key", kw, kb),
                           ("value", vw, vb)):
            attn[name] = {"kernel": w.T.reshape(e, heads, hd),
                         "bias": b.reshape(heads, hd)}
        attn["out"] = {
            "kernel": sd[pre + "attn.proj.weight"].T.reshape(heads, hd, e),
            "bias": sd[pre + "attn.proj.bias"]}
        params[f"SelfAttention_{i}"] = attn
        params[f"LayerNorm_{2 * i + 1}"] = {
            "scale": sd[pre + "norm2.weight"],
            "bias": sd[pre + "norm2.bias"]}
        params[f"Dense_{2 * i}"] = lin(sd[pre + "mlp.fc1.weight"],
                                       sd[pre + "mlp.fc1.bias"])
        params[f"Dense_{2 * i + 1}"] = lin(sd[pre + "mlp.fc2.weight"],
                                           sd[pre + "mlp.fc2.bias"])
    import jax  # noqa: PLC0415
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    return params, geo


def convert_zoedepth_head_state_dict(sd: Mapping) -> tuple[dict, dict]:
    """torch ZoeDepth metric-head state dict → flax `MetricBinsHead` params.

    Maps the reference head modules (`zoedepth_v1.py:105-122`: `conv2`,
    `seed_bin_regressor`, `seed_projector`, `projectors.{i}`,
    `attractors.{i}`, `conditional_log_binomial` — each a Conv/act/Conv
    `_net`/`mlp` Sequential) onto the identically-named flax submodules of
    `depth.model.MetricBinsHead`. Accepts a full-model state dict (head
    keys at the top level, like `model_io.load_state_dict` output) or a
    pre-filtered head dict. Returns `(params, geometry)` where geometry
    carries n_bins / bin_embedding_dim / attractors recovered from shapes.
    """
    sd = {k: _np(v) for k, v in sd.items()}

    def conv(prefix: str) -> dict:
        return {"kernel": sd[prefix + ".weight"].transpose(2, 3, 1, 0)
                .astype(np.float32),
                "bias": sd[prefix + ".bias"].astype(np.float32)}

    def net(prefix: str) -> dict:
        return {"Conv_0": conv(prefix + ".0"), "Conv_1": conv(prefix + ".2")}

    params = {
        "conv2": conv("conv2"),
        "seed_bin_regressor": net("seed_bin_regressor._net"),
        "seed_projector": net("seed_projector._net"),
        "conditional_log_binomial": net("conditional_log_binomial.mlp"),
    }
    n_levels = 1 + max(int(k.split(".")[1]) for k in sd
                       if k.startswith("projectors."))
    attractors = []
    for i in range(n_levels):
        params[f"projector_{i}"] = net(f"projectors.{i}._net")
        params[f"attractor_{i}"] = net(f"attractors.{i}._net")
        attractors.append(int(sd[f"attractors.{i}._net.2.weight"].shape[0]))
    geo = dict(
        n_bins=int(sd["seed_bin_regressor._net.2.weight"].shape[0]),
        bin_embedding_dim=int(sd["seed_projector._net.2.weight"].shape[0]),
        btlnck_features=int(sd["conv2.weight"].shape[0]),
        attractors=tuple(attractors),
    )
    import jax  # noqa: PLC0415
    return jax.tree.map(lambda x: np.asarray(x, np.float32), params), geo


def graft_encoder_params(model_params: dict, vit_params: dict,
                         scope: str = "ViTEncoder_0") -> dict:
    """Replace the encoder subtree of a full DepthModel(NK) param tree.

    Shapes are validated leaf-by-leaf so a geometry mismatch fails loudly
    instead of silently training from a half-loaded state."""
    import jax  # noqa: PLC0415

    tree = jax.tree.map(lambda x: x, model_params)  # shallow-ish copy
    root = tree["params"] if "params" in tree else tree
    if scope not in root:
        raise KeyError(f"{scope} not in model params "
                       f"(have {sorted(root.keys())})")
    old = root[scope]
    old_shapes = jax.tree.map(np.shape, old)
    new_shapes = jax.tree.map(np.shape, vit_params)
    if old_shapes != new_shapes:
        raise ValueError(
            "encoder geometry mismatch:\n"
            f"  model: {old_shapes}\n  checkpoint: {new_shapes}")
    root[scope] = jax.tree.map(lambda x: x, vit_params)
    return tree
