#!/usr/bin/env python
"""Convert torchvision VGG16 + LPIPS linear-head weights to the .npz format
consumed by priordepth_gaussiansplatting_tpu/eval/metrics.py.

Run on any machine with torchvision (and optionally the `lpips` package);
copy the resulting .npz next to the repo and set PDGS_LPIPS_WEIGHTS to its
path. This indirection exists because the evaluation image is zero-egress —
the reference downloads these weights at runtime (`lpipsPyTorch/`)."""

from __future__ import annotations

import sys

import numpy as np


def main(out_path: str = "lpips_vgg.npz"):
    try:
        import torch
        import torchvision
    except ImportError:
        print("torchvision required; run this on a machine that has it")
        return 1
    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1")
    arrays = {}
    for i, layer in enumerate(vgg.features):
        if hasattr(layer, "weight"):
            arrays[f"features.{i}.weight"] = layer.weight.detach().numpy()
            arrays[f"features.{i}.bias"] = layer.bias.detach().numpy()
    try:
        import lpips
        net = lpips.LPIPS(net="vgg")
        for k, lin in enumerate(net.lins):
            arrays[f"lin{k}.model.1.weight"] = \
                lin.model[1].weight.detach().numpy().reshape(-1)
    except ImportError:
        # Uniform heads as a fallback: still a valid perceptual distance,
        # though not the calibrated LPIPS values.
        chans = [64, 128, 256, 512, 512]
        for k, c in enumerate(chans):
            arrays[f"lin{k}.model.1.weight"] = np.full(c, 1.0 / c,
                                                       np.float32)
        print("warning: lpips package missing — writing uniform heads")
    np.savez(out_path, **arrays)
    print(f"wrote {out_path} ({len(arrays)} arrays)")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
