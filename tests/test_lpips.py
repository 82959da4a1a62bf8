"""Golden-value validation of the jnp LPIPS(VGG16) graph.

Pretrained weights are unobtainable in this image (zero egress, no
torchvision), so correctness of the GRAPH is proven against a from-scratch
torch implementation of the reference architecture
(`lpipsPyTorch/modules/{lpips,networks}.py`: torchvision VGG16 features,
relu{1_2,2_2,3_3,4_3,5_3} taps, ScalingLayer normalisation, unit-normalised
channel differences, 1x1 linear heads, spatial mean) using IDENTICAL random
weights. With real weights supplied via PDGS_LPIPS_WEIGHTS the same code
path computes calibrated LPIPS."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from priordepth_gaussiansplatting_tpu.eval import metrics as M  # noqa: E402

_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
        512, 512, 512, "M", 512, 512, 512, "M"]
_TAPS = {3, 8, 15, 22, 29}


def _torch_lpips(img1, img2, convs, lins):
    import torch.nn.functional as F

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def feats(x):
        h = ((2.0 * x - 1.0).unsqueeze(0) - shift) / scale
        taps = []
        ci = 0
        li = 0
        for item in _CFG:
            if item == "M":
                h = F.max_pool2d(h, 2, 2)
                li += 1
            else:
                w, b = convs[ci]
                ci += 1
                h = F.conv2d(h, torch.tensor(w), torch.tensor(b), padding=1)
                li += 1
                h = F.relu(h)
                if li in _TAPS:
                    taps.append(h)
                li += 1
        return taps

    t1, t2 = feats(torch.tensor(img1)), feats(torch.tensor(img2))
    total = 0.0
    for f1, f2, lin in zip(t1, t2, lins):
        n1 = f1 / torch.sqrt((f1 ** 2).sum(1, keepdim=True) + 1e-10)
        n2 = f2 / torch.sqrt((f2 ** 2).sum(1, keepdim=True) + 1e-10)
        d = (n1 - n2) ** 2
        w = torch.tensor(lin).view(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean()
    return float(total)


def test_lpips_graph_matches_torch(tmp_path):
    rng = np.random.default_rng(7)
    convs = []
    cin = 3
    for item in _CFG:
        if item == "M":
            continue
        w = (rng.standard_normal((item, cin, 3, 3)) / np.sqrt(9 * cin)
             ).astype(np.float32)
        b = (0.1 * rng.standard_normal(item)).astype(np.float32)
        convs.append((w, b))
        cin = item
    lins = [np.abs(rng.standard_normal(c)).astype(np.float32) / c
            for c in (64, 128, 256, 512, 512)]

    # Persist in the .npz convention the loader consumes.
    arrays = {}
    idx = 0
    li = 0
    for item in _CFG:
        if item == "M":
            li += 1
            continue
        arrays[f"features.{li}.weight"] = convs[idx][0]
        arrays[f"features.{li}.bias"] = convs[idx][1]
        idx += 1
        li += 2
    for k, lin in enumerate(lins):
        arrays[f"lin{k}.model.1.weight"] = lin
    path = str(tmp_path / "lpips_rand.npz")
    np.savez(path, **arrays)

    img1 = rng.random((3, 64, 64)).astype(np.float32)
    img2 = np.clip(img1 + 0.1 * rng.standard_normal((3, 64, 64)),
                   0, 1).astype(np.float32)

    old = os.environ.get("PDGS_LPIPS_WEIGHTS")
    os.environ["PDGS_LPIPS_WEIGHTS"] = path
    M._load_weights.cache_clear()
    try:
        assert M.have_lpips()
        got = M.compute_lpips(img1, img2)
        want = _torch_lpips(img1, img2, convs, lins)
        assert got == pytest.approx(want, rel=2e-4), (got, want)
        # identical images -> 0
        assert M.compute_lpips(img1, img1) == pytest.approx(0.0, abs=1e-6)
    finally:
        if old is None:
            os.environ.pop("PDGS_LPIPS_WEIGHTS", None)
        else:
            os.environ["PDGS_LPIPS_WEIGHTS"] = old
        M._load_weights.cache_clear()


def test_metrics_omits_lpips_without_weights(tmp_path):
    """results.json must not contain a -1 LPIPS masquerading as data."""
    import json

    from PIL import Image

    M._load_weights.cache_clear()
    os.environ.pop("PDGS_LPIPS_WEIGHTS", None)
    mdir = tmp_path / "test" / "ours_10"
    for sub in ("renders", "gt"):
        os.makedirs(mdir / sub)
        arr = (np.random.default_rng(0).random((16, 16, 3)) * 255
               ).astype(np.uint8)
        Image.fromarray(arr).save(mdir / sub / "0.png")
    import metrics as metrics_cli
    out = metrics_cli.evaluate([str(tmp_path)])
    res = json.load(open(tmp_path / "results.json"))
    method = res["%s" % tmp_path] if str(tmp_path) in res else res
    vals = list(out[str(tmp_path)].values())[0]
    assert "LPIPS" not in vals
    assert "PSNR" in vals and "SSIM" in vals
