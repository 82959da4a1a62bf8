#!/usr/bin/env python
"""Convert torchvision VGG16 + LPIPS linear-head weights to the .npz format
consumed by priordepth_gaussiansplatting_tpu/eval/metrics.py.

Run on any machine with torchvision (and optionally the `lpips` package);
copy the resulting .npz next to the repo and set PDGS_LPIPS_WEIGHTS to its
path. This indirection exists because the evaluation image is zero-egress —
the reference downloads these weights at runtime (`lpipsPyTorch/modules/
utils.py`).

Modes:
  export_lpips_weights.py [out.npz]                    torchvision download
  export_lpips_weights.py out.npz vgg.pth [lpips.pth]  from saved torch
                                                       state-dict files
"""

from __future__ import annotations

import sys

import numpy as np

# torchvision vgg16.features Conv2d layer indices and their channel counts
VGG16_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
LPIPS_HEAD_CHANNELS = (64, 128, 256, 512, 512)


def _np(t):
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def export_from_state_dicts(vgg_features_sd, lpips_sd=None,
                            out_path: str = "lpips_vgg.npz") -> dict:
    """Map torch state dicts → the metrics-module .npz.

    `vgg_features_sd`: a `vgg16.features` state dict (`<i>.weight/bias`,
    torchvision numbering) or a full-model one (`features.<i>.weight`).
    `lpips_sd`: an `lpips.LPIPS(net="vgg")` state dict with
    `lin<k>.model.1.weight` (or `lins.<k>...`) heads; None → uniform heads
    (still a valid perceptual distance, not calibrated LPIPS)."""
    arrays = {}
    for i in VGG16_CONV_IDX:
        for leaf in ("weight", "bias"):
            for cand in (f"features.{i}.{leaf}", f"{i}.{leaf}"):
                if cand in vgg_features_sd:
                    arrays[f"features.{i}.{leaf}"] = _np(
                        vgg_features_sd[cand]).astype(np.float32)
                    break
            else:
                raise KeyError(f"VGG16 conv {i}.{leaf} not found")
    if lpips_sd is not None:
        for k in range(len(LPIPS_HEAD_CHANNELS)):
            for cand in (f"lin{k}.model.1.weight",
                         f"lins.{k}.model.1.weight"):
                if cand in lpips_sd:
                    arrays[f"lin{k}.model.1.weight"] = _np(
                        lpips_sd[cand]).reshape(-1).astype(np.float32)
                    break
            else:
                raise KeyError(f"LPIPS head lin{k} not found")
    else:
        for k, c in enumerate(LPIPS_HEAD_CHANNELS):
            arrays[f"lin{k}.model.1.weight"] = np.full(c, 1.0 / c,
                                                       np.float32)
        print("warning: no LPIPS heads — writing uniform heads")
    np.savez(out_path, **arrays)
    print(f"wrote {out_path} ({len(arrays)} arrays)")
    return arrays


def main(out_path: str = "lpips_vgg.npz", vgg_path: str | None = None,
         lpips_path: str | None = None):
    if vgg_path is not None:
        import torch
        vgg_sd = torch.load(vgg_path, map_location="cpu",
                            weights_only=False)
        lp_sd = (torch.load(lpips_path, map_location="cpu",
                            weights_only=False)
                 if lpips_path else None)
        export_from_state_dicts(vgg_sd, lp_sd, out_path)
        return 0
    try:
        import torchvision
    except ImportError:
        print("torchvision required for the download path; on an offline "
              "machine pass saved state-dict files instead: "
              "export_lpips_weights.py out.npz vgg.pth [lpips.pth]")
        return 1
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1")
    vgg_sd = vgg.features.state_dict()
    lp_sd = None
    try:
        import lpips
        lp_sd = lpips.LPIPS(net="vgg").state_dict()
    except ImportError:
        print("warning: lpips package missing — writing uniform heads")
    export_from_state_dicts(vgg_sd, lp_sd, out_path)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
