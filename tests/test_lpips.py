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


def test_export_script_to_metrics_e2e(tmp_path, monkeypatch):
    """The full weight-delivery path (VERDICT r03 #6): a torch-style LPIPS
    checkpoint → scripts/export_lpips_weights.py → PDGS_LPIPS_WEIGHTS →
    metrics.py emits the LPIPS key in results.json."""
    import importlib.util
    import json
    import subprocess
    import sys

    import torch
    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "export_lpips_weights",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "export_lpips_weights.py"))
    exp = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(exp)

    # Fabricated torch state dicts in the torchvision/lpips naming schemes.
    rng = np.random.RandomState(0)
    vgg_sd, cin = {}, 3
    chans = {0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256,
             17: 512, 19: 512, 21: 512, 24: 512, 26: 512, 28: 512}
    for i in exp.VGG16_CONV_IDX:
        cout = chans[i]
        vgg_sd[f"{i}.weight"] = torch.from_numpy(
            (rng.randn(cout, cin, 3, 3) * 0.05).astype(np.float32))
        vgg_sd[f"{i}.bias"] = torch.zeros(cout)
        cin = cout
    lp_sd = {f"lin{k}.model.1.weight": torch.from_numpy(
        np.abs(rng.randn(1, c, 1, 1)).astype(np.float32))
        for k, c in enumerate(exp.LPIPS_HEAD_CHANNELS)}

    npz = str(tmp_path / "lpips_vgg.npz")
    torch.save(vgg_sd, str(tmp_path / "vgg.pth"))
    torch.save(lp_sd, str(tmp_path / "lpips.pth"))
    assert exp.main(npz, str(tmp_path / "vgg.pth"),
                    str(tmp_path / "lpips.pth")) == 0

    # Minimal rendered-model layout for metrics.py.
    mdir = tmp_path / "model"
    for sub in ("renders", "gt"):
        d = mdir / "test" / "ours_1" / sub
        d.mkdir(parents=True)
        for n in range(2):
            arr = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{n:05d}.png")

    env = dict(os.environ, PDGS_LPIPS_WEIGHTS=npz, JAX_PLATFORMS="cpu")
    repo = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run([sys.executable, "metrics.py", "-m", str(mdir)],
                       cwd=repo, env=env, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    results = json.loads((mdir / "results.json").read_text())
    method = results["ours_1"]
    assert "LPIPS" in method and np.isfinite(method["LPIPS"])
    assert "WARNING" not in r.stdout

    # Without weights, the omission warning is prominent and LPIPS absent.
    env.pop("PDGS_LPIPS_WEIGHTS")
    r2 = subprocess.run([sys.executable, "metrics.py", "-m", str(mdir)],
                        cwd=repo, env=env, capture_output=True, text=True,
                        timeout=600)
    assert r2.returncode == 0
    assert "LPIPS omitted" in r2.stdout
    results2 = json.loads((mdir / "results.json").read_text())
    assert "LPIPS" not in results2["ours_1"]
