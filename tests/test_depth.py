"""Depth subsystem: losses (golden values), metrics + crops, model forward
shapes, NK routing, TTA inference, one sharded train step, config merge."""

import jax
import os
import jax.numpy as jnp
import numpy as np
import pytest

from priordepth_gaussiansplatting_tpu.depth import config as dcfg
from priordepth_gaussiansplatting_tpu.depth import infer as dinfer
from priordepth_gaussiansplatting_tpu.depth import losses as dl
from priordepth_gaussiansplatting_tpu.depth import metrics as dm
from priordepth_gaussiansplatting_tpu.depth.trainer import (DepthTrainer,
                                                            DepthTrainerConfig,
                                                            onecycle_lr)


def test_silog_zero_for_perfect_and_scale_component():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16) + 0.5)
    assert float(dl.silog_loss(x, x)) == pytest.approx(0.0, abs=1e-4)
    # Pure scaling: var(g)=0, mean(g)=log2 -> 10*sqrt(0.15)*log2.
    want = 10.0 * np.sqrt(0.15) * np.log(2.0)
    assert float(dl.silog_loss(2.0 * x, x)) == pytest.approx(want, rel=1e-3)


def test_grad_l1_zero_for_shifted():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 16, 16))
    assert float(dl.grad_l1_loss(x + 5.0, x)) == pytest.approx(0.0, abs=1e-5)
    assert float(dl.grad_l1_loss(2 * x, x)) > 0


def test_scale_shift_closed_form():
    rng = np.random.RandomState(2)
    pred = jnp.asarray(rng.rand(2, 16, 16).astype(np.float32))
    target = 3.0 * pred + 0.7
    s, t = dl.compute_scale_and_shift(pred, target,
                                      jnp.ones_like(pred, bool))
    np.testing.assert_allclose(np.asarray(s), 3.0, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(t), 0.7, rtol=1e-3)
    assert float(dl.scale_and_shift_invariant_loss(pred, target)) \
        == pytest.approx(0.0, abs=1e-6)


def test_depth_metrics_and_crops():
    gt = np.full((100, 100), 2.0)
    pred = np.full((100, 100), 2.2)
    m = dm.compute_metrics(gt, pred, max_depth_eval=10.0)
    assert m["a1"] == 1.0
    assert m["abs_rel"] == pytest.approx(0.1, rel=1e-6)
    # eigen crop reduces the evaluated region but not the (constant) errors
    m2 = dm.compute_metrics(gt, pred, max_depth_eval=10.0, eigen_crop=True)
    assert m2["abs_rel"] == pytest.approx(0.1, rel=1e-6)
    ra = dm.RunningAverageDict()
    ra.update({"a1": 1.0})
    ra.update({"a1": 0.0})
    assert ra.get_value()["a1"] == 0.5


def test_onecycle_lr_shape():
    lrs = [float(onecycle_lr(s, 100, 1.0)) for s in (0, 30, 100)]
    assert lrs[0] == pytest.approx(1.0 / 25.0, rel=1e-3)  # init = max/25
    assert lrs[1] == pytest.approx(1.0, rel=1e-3)         # peak at pct_start
    assert lrs[2] < 0.01                                  # annealed


@pytest.fixture(scope="module")
def depth_model_and_params():
    cfg = dcfg.get_config("depth", "train", "nyu", embed_dim=64,
                          encoder_depth=2, n_bins=8)
    model = dcfg.build_model(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    return model, params


def test_depth_model_forward_shapes(depth_model_and_params):
    model, params = depth_model_and_params
    x = jnp.ones((2, 64, 64, 3)) * 0.5
    out = model.apply(params, x)
    assert out["metric_depth"].shape == (2, 64, 64)
    assert np.isfinite(np.asarray(out["metric_depth"])).all()
    d = np.asarray(out["metric_depth"])
    assert (d >= 0).all() and (d <= 10.0 + 1e-3).all()  # within bin range


def test_depth_nk_router():
    cfg = dcfg.get_config("depth_nk", "infer", "mix", embed_dim=64,
                          encoder_depth=2, n_bins=8)
    model = dcfg.build_model(cfg)
    x = jnp.ones((1, 64, 64, 3)) * 0.3
    params = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(params, x)
    assert out["domain_logits"].shape == (1, 2)
    hard = model.apply(params, x, hard_route=True)
    assert hard["metric_depth"].shape == (1, 64, 64)


def test_tta_inference_and_png_roundtrip(depth_model_and_params, tmp_path):
    model, params = depth_model_and_params
    depth = dinfer.infer_with_tta(model.apply, params,
                                  jnp.ones((1, 48, 56, 3)) * 0.5)
    assert depth.shape == (1, 48, 56)
    path = str(tmp_path / "d.png")
    dinfer.save_invdepth_png(path, np.asarray(depth[0]))
    from PIL import Image
    arr = np.asarray(Image.open(path))
    assert arr.dtype == np.uint16 and arr.shape == (48, 56)


def test_depth_trainer_step_decreases_loss(depth_model_and_params):
    model, _ = depth_model_and_params
    cfg = DepthTrainerConfig(steps_per_epoch=10, epochs=1, lr=1e-3)
    tr = DepthTrainer(model, cfg)
    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(8, 64, 64, 3).astype(np.float32))
    gt = jnp.asarray(2.0 + rng.rand(8, 64, 64).astype(np.float32))
    mask = jnp.ones((8, 64, 64), bool)
    tr.init(img[:1])
    losses = [tr.train_step(img, gt, mask) for _ in range(6)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_config_merge_layers():
    c = dcfg.get_config("depth_nk", "train", "kitti", lr=5e-4)
    assert c.model == "depth_nk"
    assert c.max_depth == 80.0       # dataset layer
    assert c.lr == 5e-4              # override wins
    assert c.garg_crop is True
    assert c.mode == "train"


def test_depth_data_pipeline(tmp_path):
    """Folder dataset + augmentations + host-sharded batches."""
    import random as pyrandom
    from PIL import Image
    from priordepth_gaussiansplatting_tpu.depth import data as ddata
    rng = np.random.RandomState(0)
    os.makedirs(tmp_path / "images")
    os.makedirs(tmp_path / "depths")
    for i in range(6):
        Image.fromarray((rng.rand(40, 48, 3) * 255).astype(np.uint8)).save(
            tmp_path / "images" / f"im{i}.png")
        Image.fromarray((rng.rand(40, 48) * 5000).astype(np.uint16)).save(
            tmp_path / "depths" / f"im{i}.png")
    ds = ddata.FolderDepthDataset(str(tmp_path), depth_scale=1000.0)
    assert len(ds) == 6
    s = ds[0]
    assert s.image.shape == (40, 48, 3) and s.depth.shape == (40, 48)
    assert s.mask.dtype == bool

    cfg = ddata.AugmentConfig(crop_h=32, crop_w=32)
    aug = ddata.augment(s, cfg, pyrandom.Random(0))
    assert aug.image.shape == (32, 32, 3)
    assert np.isfinite(aug.image).all()

    got = list(ddata.batches(ds, batch_size=2, cfg=cfg, epochs=1))
    assert len(got) == 3
    assert got[0]["image"].shape == (2, 32, 32, 3)
    # host sharding partitions the permutation
    h0 = list(ddata.batches(ds, 1, host_count=2, host_index=0))
    h1 = list(ddata.batches(ds, 1, host_count=2, host_index=1))
    assert len(h0) == 3 and len(h1) == 3

    mixed = ddata.MixedDataset([ds, ds])
    sample, dom = mixed.sample(pyrandom.Random(0))
    assert dom in (0, 1)


def test_silog_no_nan_for_near_constant_errors():
    """Regression: E[e^2]-E[e]^2 can go fractionally negative in float for
    near-constant predictions; silog must clamp, not NaN."""
    rng = np.random.default_rng(0)
    gt = np.full(4096, 3.0) * (1 + 1e-7 * rng.standard_normal(4096))
    pred = gt * 1.37  # near-constant log error
    m = dm.compute_errors(gt, pred)
    assert np.isfinite(m["silog"]) and m["silog"] >= 0.0


def _write_png16(path, arr):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr.astype(np.uint16)).save(path)


def _write_rgb(path, h, w):
    from PIL import Image
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.full((h, w, 3), 128, np.uint8)).save(path)


def test_kitti_layout_walker_and_kb_crop(tmp_path):
    """KITTI raw + depth-annotated layouts discovered, metres*256 decoding,
    bottom-centre 352x1216 kb crop (`data_mono.py` conventions)."""
    from priordepth_gaussiansplatting_tpu.depth import data as dd
    root = tmp_path / "raw"
    gt = tmp_path / "gt"
    drive = "2011_09_26_drive_0002_sync"
    _write_rgb(str(root / "2011_09_26" / drive / "image_02" / "data"
                   / "0000000069.png"), 375, 1242)
    depth = np.zeros((375, 1242), np.float32)
    depth[200, 600] = 5.0
    _write_png16(str(gt / drive / "proj_depth" / "groundtruth" / "image_02"
                     / "0000000069.png"), depth * 256.0)
    # a frame without gt must be skipped
    _write_rgb(str(root / "2011_09_26" / drive / "image_02" / "data"
                   / "0000000070.png"), 375, 1242)
    ds = dd.KittiDepthDataset(str(root), str(gt))
    assert len(ds) == 1
    s = ds[0]
    assert s.image.shape == (352, 1216)[0:1] + (1216, 3)
    assert s.depth.shape == (352, 1216)
    # kb crop: top=375-352=23, left=(1242-1216)//2=13 -> (200,600)->(177,587)
    assert s.depth[177, 587] == pytest.approx(5.0, rel=1e-3)
    assert s.mask[177, 587] and s.mask.sum() == 1


def test_nyu_layout_walker(tmp_path):
    from priordepth_gaussiansplatting_tpu.depth import data as dd
    scene = tmp_path / "kitchen_0004"
    _write_rgb(str(scene / "rgb_00045.jpg"), 60, 80)
    d = np.zeros((60, 80), np.float32)
    d[30, 40] = 2.5
    _write_png16(str(scene / "sync_depth_00045.png"), d * 1000.0)
    ds = dd.NyuDepthDataset(str(tmp_path))
    assert len(ds) == 1
    s = ds[0]
    assert s.depth[30, 40] == pytest.approx(2.5, rel=1e-3)
    assert s.mask.sum() == 1


def test_txt_split_dataset(tmp_path):
    """Reference filenames-file format: `rgb_rel depth_rel focal`, 'None'
    depth -> empty mask, kb_crop honoured."""
    from priordepth_gaussiansplatting_tpu.depth import data as dd
    _write_rgb(str(tmp_path / "d" / "a.png"), 375, 1242)
    dep = np.zeros((375, 1242), np.float32)
    dep[100, 100] = 10.0
    _write_png16(str(tmp_path / "g" / "a_d.png"), dep * 256.0)
    fn = tmp_path / "files.txt"
    fn.write_text("d/a.png g/a_d.png 721.5\n"
                  "d/a.png None 721.5\n")
    ds = dd.TxtSplitDepthDataset(str(tmp_path), str(tmp_path),
                                 str(fn), do_kb_crop=True)
    assert len(ds) == 2
    s0 = ds[0]
    assert s0.depth.shape == (352, 1216)
    assert s0.mask.sum() == 1
    s1 = ds[1]
    assert s1.mask.sum() == 0


def test_eval_dataset_walkers(tmp_path):
    """Per-dataset eval layouts (reference zoedepth/data/*.py): each walker
    discovers its published on-disk structure and applies the dataset's unit
    conversion and validity conventions."""
    from priordepth_gaussiansplatting_tpu.depth import data as dd

    # ibims: imagelist + rgb/depth (uint16*50/65535) + validity masks
    ib = tmp_path / "ibims"
    (ib / "rgb").mkdir(parents=True)
    _write_rgb(str(ib / "rgb" / "i0.png"), 20, 30)
    d = np.zeros((20, 30), np.float32)
    d[5, 6] = 4.0
    _write_png16(str(ib / "depth" / "i0.png"), d * 65535.0 / 50.0)
    valid = np.ones((20, 30), np.float32)
    valid[5, 7] = 0.0  # invalid pixel
    _write_png16(str(ib / "mask_invalid" / "i0.png"), valid)
    _write_png16(str(ib / "mask_transp" / "i0.png"),
                 np.ones((20, 30), np.float32))
    (ib / "imagelist.txt").write_text("i0\n")
    s = dd.make_eval_dataset("ibims", str(ib))[0]
    assert s.depth[5, 6] == pytest.approx(4.0, rel=1e-3)
    assert s.depth[5, 7] == -1.0 and not s.mask[5, 7]

    # sunrgbd: rgb/rgb/*.jpg + gt/gt/*.png mm
    su = tmp_path / "sun"
    _write_rgb(str(su / "rgb" / "rgb" / "a.jpg"), 16, 16)
    d = np.zeros((16, 16), np.float32)
    d[3, 3] = 2.0
    d[4, 4] = 9.0  # > 8 m -> invalidated
    _write_png16(str(su / "gt" / "gt" / "a.png"), d * 1000.0)
    s = dd.make_eval_dataset("sunrgbd", str(su))[0]
    assert s.depth[3, 3] == pytest.approx(2.0, rel=1e-3)
    assert s.depth[4, 4] == -1.0 and s.mask.sum() == 1

    # diml indoor: LR/<scene>/color/*_c.png + depth_filled
    di = tmp_path / "diml"
    _write_rgb(str(di / "LR" / "sc1" / "color" / "f_c.png"), 12, 12)
    d = np.zeros((12, 12), np.float32)
    d[2, 2] = 3.0
    _write_png16(str(di / "LR" / "sc1" / "depth_filled"
                     / "f_depth_filled.png"), d * 1000.0)
    s = dd.make_eval_dataset("diml_indoor", str(di))[0]
    assert s.depth[2, 2] == pytest.approx(3.0, rel=1e-3)

    # diml outdoor: <set>/outleft + depthmap
    do = tmp_path / "dimlo"
    _write_rgb(str(do / "s1" / "outleft" / "x.png"), 12, 12)
    d = np.zeros((12, 12), np.float32)
    d[2, 2] = 30.0
    _write_png16(str(do / "s1" / "depthmap" / "x.png"), d * 1000.0)
    s = dd.make_eval_dataset("diml_outdoor", str(do))[0]
    assert s.depth[2, 2] == pytest.approx(30.0, rel=1e-3)
    assert s.mask[2, 2]  # outdoor eval floor is 2 m

    # diode: scene/scan/*.png + _depth.npy + _depth_mask.npy
    dio = tmp_path / "diode"
    _write_rgb(str(dio / "scene1" / "scan1" / "p.png"), 10, 10)
    d = np.zeros((10, 10, 1), np.float32)
    d[1, 1, 0] = 5.0
    np.save(str(dio / "scene1" / "scan1" / "p_depth.npy"), d)
    m = np.zeros((10, 10), np.float32)
    m[1, 1] = 1.0
    np.save(str(dio / "scene1" / "scan1" / "p_depth_mask.npy"), m)
    s = dd.make_eval_dataset("diode_indoor", str(dio))[0]
    assert s.depth[1, 1] == pytest.approx(5.0) and s.mask.sum() == 1

    # vkitti2: rgb/<scene>/<var>/frames/rgb/Camera_0/rgb_*.jpg, cm depth,
    # kb_crop, split files autogenerated
    vk = tmp_path / "vk2"
    base = vk / "rgb" / "Scene01" / "clone" / "frames" / "rgb" / "Camera_0"
    for i in range(3):
        _write_rgb(str(base / f"rgb_{i:05d}.jpg"), 375, 1242)
        d = np.zeros((375, 1242), np.float32)
        d[200, 600] = 12.0
        _write_png16(str(vk / "depth" / "Scene01" / "clone" / "frames"
                         / "depth" / "Camera_0" / f"depth_{i:05d}.png"),
                     d * 100.0)
    ds = dd.make_eval_dataset("vkitti2", str(vk))
    assert (vk / "train.txt").exists() and (vk / "test.txt").exists()
    assert len(ds) >= 1
    s = ds[0]
    assert s.depth.shape == (352, 1216)
    assert s.depth[177, 587] == pytest.approx(12.0, rel=1e-3)

    # ddad: flat *_rgb.png + *_depth.npy
    dd_root = tmp_path / "ddad"
    _write_rgb(str(dd_root / "000_rgb.png"), 10, 10)
    d = np.zeros((10, 10), np.float32)
    d[4, 4] = 25.0
    np.save(str(dd_root / "000_depth.npy"), d)
    s = dd.make_eval_dataset("ddad", str(dd_root))[0]
    assert s.depth[4, 4] == pytest.approx(25.0) and s.mask.sum() == 1


def test_hypersim_distance_to_depth():
    """Ray distance at the principal point equals planar depth; off-axis
    distances shrink by cos(angle) (`hypersim.py:36-48`)."""
    from priordepth_gaussiansplatting_tpu.depth import data as dd
    dist = np.full((8, 8), 10.0, np.float32)
    depth = dd.hypersim_distance_to_depth(dist, focal=100.0)
    # centre pixels (offsets +-0.5) are nearly planar
    assert depth[4, 4] == pytest.approx(10.0, rel=1e-4)
    # corner pixel: offset (3.5, 3.5) -> depth = 10*f/sqrt(f^2+24.5)
    exp = 10.0 * 100.0 / np.sqrt(100.0 ** 2 + 2 * 3.5 ** 2)
    assert depth[0, 0] == pytest.approx(exp, rel=1e-5)
