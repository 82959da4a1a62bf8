"""Data layer: COLMAP bin/txt round-trips (the reference's only inherited
test style), Gaussian/point PLY round-trips, Blender scene loading, the
resolution policy, and cfg_args persistence."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from priordepth_gaussiansplatting_tpu.data import colmap as cm
from priordepth_gaussiansplatting_tpu.data import dataset as ds
from priordepth_gaussiansplatting_tpu.data import ply as ply_io
from priordepth_gaussiansplatting_tpu.utils import config as cfg


def _toy_model():
    cameras = {
        1: cm.ColmapCamera(1, "PINHOLE", 64, 48,
                           np.array([50.0, 52.0, 32.0, 24.0])),
        2: cm.ColmapCamera(2, "SIMPLE_PINHOLE", 32, 32,
                           np.array([30.0, 16.0, 16.0])),
    }
    rng = np.random.RandomState(0)
    images = {}
    for i in range(1, 4):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        images[i] = cm.ColmapImage(
            i, q, rng.randn(3), 1 + (i % 2), f"img_{i:03d}.png",
            rng.rand(5, 2) * 64, rng.randint(-1, 9, 5).astype(np.int64))
    points = {}
    for i in range(1, 8):
        points[i] = cm.ColmapPoint3D(
            i, rng.randn(3), rng.randint(0, 255, 3), float(rng.rand()),
            np.array([1, 2], np.int32), np.array([0, 1], np.int32))
    return cameras, images, points


@pytest.mark.parametrize("fmt", ["bin", "txt"])
def test_colmap_roundtrip(tmp_path, fmt):
    cameras, images, points = _toy_model()
    d = str(tmp_path)
    if fmt == "bin":
        cm.write_cameras_binary(cameras, f"{d}/cameras.bin")
        cm.write_images_binary(images, f"{d}/images.bin")
        cm.write_points3D_binary(points, f"{d}/points3D.bin")
    else:
        cm.write_cameras_text(cameras, f"{d}/cameras.txt")
        cm.write_images_text(images, f"{d}/images.txt")
        cm.write_points3D_text(points, f"{d}/points3D.txt")
    c2, i2, p2 = cm.read_model(d)
    assert set(c2) == set(cameras)
    for k in cameras:
        assert c2[k].model == cameras[k].model
        assert (c2[k].width, c2[k].height) == (cameras[k].width,
                                               cameras[k].height)
        np.testing.assert_allclose(c2[k].params, cameras[k].params)
    for k in images:
        np.testing.assert_allclose(i2[k].qvec, images[k].qvec)
        np.testing.assert_allclose(i2[k].tvec, images[k].tvec)
        assert i2[k].name == images[k].name
        np.testing.assert_allclose(i2[k].xys, images[k].xys)
        np.testing.assert_array_equal(i2[k].point3D_ids,
                                      images[k].point3D_ids)
    for k in points:
        np.testing.assert_allclose(p2[k].xyz, points[k].xyz)
        np.testing.assert_array_equal(p2[k].rgb, points[k].rgb)
        np.testing.assert_array_equal(p2[k].image_ids, points[k].image_ids)


def test_qvec_rotmat_roundtrip():
    rng = np.random.RandomState(1)
    for _ in range(10):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = cm.qvec2rotmat(q)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(cm.rotmat2qvec(R), q, atol=1e-8)


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(2)
    n, k = 13, 16
    data = dict(
        xyz=rng.randn(n, 3).astype(np.float32),
        features_dc=rng.randn(n, 3).astype(np.float32),
        features_rest=rng.randn(n, (k - 1) * 3).astype(np.float32),
        opacity=rng.randn(n, 1).astype(np.float32),
        scaling=rng.randn(n, 3).astype(np.float32),
        rotation=rng.randn(n, 4).astype(np.float32),
    )
    path = str(tmp_path / "point_cloud.ply")
    ply_io.save_gaussian_ply(path, **data)
    back = ply_io.load_gaussian_ply(path)
    for key in data:
        np.testing.assert_allclose(back[key], data[key], rtol=1e-6,
                                   err_msg=key)
    # Header sanity: property names in reference order (SIBR contract).
    with open(path, "rb") as f:
        head = f.read(2000).decode("ascii", errors="ignore")
    assert "property float f_rest_44" in head
    assert head.index("property float x") < head.index("property float nx")
    assert head.index("property float opacity") \
        < head.index("property float scale_0") \
        < head.index("property float rot_0")


def test_point_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    xyz = rng.randn(9, 3).astype(np.float32)
    rgb = rng.randint(0, 255, (9, 3)).astype(np.uint8)
    path = str(tmp_path / "points3D.ply")
    ply_io.store_point_ply(path, xyz, rgb)
    x2, c2, n2 = ply_io.fetch_point_ply(path)
    np.testing.assert_allclose(x2, xyz, rtol=1e-6)
    np.testing.assert_allclose(c2, rgb.astype(np.float32) / 255.0, atol=1e-6)


def _make_blender_scene(root, n_frames=4, size=32):
    rng = np.random.RandomState(4)
    os.makedirs(f"{root}/train", exist_ok=True)
    frames = []
    for i in range(n_frames):
        theta = 2 * np.pi * i / n_frames
        c2w = np.eye(4)
        c2w[:3, 3] = [2 * np.sin(theta), 0.0, 2 * np.cos(theta)]
        # look at origin: -z forward in Blender convention
        fwd = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
        right = np.cross([0, 1, 0], fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2] = right, up, -fwd
        img = (rng.rand(size, size, 4) * 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(f"{root}/train/r_{i}.png")
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(f"{root}/transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.7, "frames": frames}, f)


def test_blender_scene_loads(tmp_path):
    root = str(tmp_path / "lego")
    _make_blender_scene(root)
    scene = ds.Scene(root, model_path=str(tmp_path / "out"),
                     white_background=True, shuffle=False)
    assert len(scene.train_cameras) == 4
    cam = scene.train_cameras[0]
    assert cam.image.shape == (3, 32, 32)
    assert cam.width == 32
    xyz, colors, _ = scene.point_cloud()
    assert xyz.shape[0] == 100_000  # random init
    assert scene.cameras_extent > 0
    # model dir artifacts (scene/__init__.py:51-63)
    assert os.path.exists(str(tmp_path / "out" / "input.ply"))
    assert os.path.exists(str(tmp_path / "out" / "cameras.json"))


def test_resolution_policy():
    # -1: cap at 1600 (`utils/camera_utils.py:46-57`)
    assert ds._resolve_resolution(3200, 2000, -1) == (1600, 1000)
    assert ds._resolve_resolution(800, 600, -1) == (800, 600)
    # divisors
    assert ds._resolve_resolution(800, 600, 2) == (400, 300)
    assert ds._resolve_resolution(800, 600, 8) == (100, 75)
    # explicit width
    assert ds._resolve_resolution(800, 600, 400) == (400, 300)


def test_cfg_args_roundtrip(tmp_path):
    mc = cfg.ModelConfig(source_path="/data/x", model_path=str(tmp_path),
                         sh_degree=2, eval=True)
    cfg.save_cfg_args(str(tmp_path), mc)
    ns = cfg.load_cfg_args(str(tmp_path))
    assert ns.sh_degree == 2
    assert ns.source_path == "/data/x"
    assert ns.eval is True
    # reference format: a repr'd Namespace eval()able by old eval scripts
    with open(tmp_path / "cfg_args") as f:
        assert f.read().startswith("Namespace(")


def test_llff_holdout_split(tmp_path):
    """COLMAP scene with eval: every 8th sorted image becomes test."""
    cameras, images, points = _toy_model()
    # 16 images, one camera
    rng = np.random.RandomState(5)
    cameras = {1: cm.ColmapCamera(1, "PINHOLE", 16, 16,
                                  np.array([12.0, 12.0, 8.0, 8.0]))}
    images = {}
    for i in range(16):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        images[i + 1] = cm.ColmapImage(i + 1, q, rng.randn(3), 1,
                                       f"im_{i:02d}.png", np.zeros((0, 2)),
                                       np.zeros(0, np.int64))
    root = tmp_path / "scene"
    sparse = root / "sparse" / "0"
    os.makedirs(sparse)
    os.makedirs(root / "images")
    cm.write_cameras_binary(cameras, str(sparse / "cameras.bin"))
    cm.write_images_binary(images, str(sparse / "images.bin"))
    cm.write_points3D_binary(points, str(sparse / "points3D.bin"))
    for i in range(16):
        Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(
            root / "images" / f"im_{i:02d}.png")
    info = ds.read_colmap_scene(str(root), eval_split=True)
    assert len(info.test_cameras) == 2   # every 8th of 16
    assert len(info.train_cameras) == 14
    names = {c.image_name for c in info.test_cameras}
    assert names == {"im_00", "im_08"}
