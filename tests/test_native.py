"""Native IO runtime: builds via g++, parses COLMAP binaries identically to
the Python readers, writes byte-identical Gaussian PLYs, parallel reads."""

import os

import numpy as np
import pytest

from priordepth_gaussiansplatting_tpu.data import colmap as cm
from priordepth_gaussiansplatting_tpu.data import native
from priordepth_gaussiansplatting_tpu.data import ply as ply_io
from tests.test_data import _toy_model


pytestmark = pytest.mark.skipif(not native.have_native(),
                                reason="native toolchain unavailable")


def test_points3d_matches_python(tmp_path):
    _, _, points = _toy_model()
    path = str(tmp_path / "points3D.bin")
    cm.write_points3D_binary(points, path)
    got = native.read_points3D_binary(path)
    want = cm.read_points3D_binary(path)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k].xyz, want[k].xyz)
        np.testing.assert_array_equal(got[k].rgb, want[k].rgb)
        np.testing.assert_array_equal(got[k].image_ids, want[k].image_ids)
        np.testing.assert_array_equal(got[k].point2D_idxs,
                                      want[k].point2D_idxs)


def test_images_matches_python(tmp_path):
    _, images, _ = _toy_model()
    path = str(tmp_path / "images.bin")
    cm.write_images_binary(images, path)
    got = native.read_images_binary(path)
    want = cm.read_images_binary(path)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k].qvec, want[k].qvec)
        np.testing.assert_allclose(got[k].tvec, want[k].tvec)
        assert got[k].name == want[k].name
        np.testing.assert_allclose(got[k].xys, want[k].xys)
        np.testing.assert_array_equal(got[k].point3D_ids,
                                      want[k].point3D_ids)


def test_native_ply_byte_identical(tmp_path):
    rng = np.random.RandomState(0)
    n, k = 7, 16
    data = dict(
        xyz=rng.randn(n, 3).astype(np.float32),
        features_dc=rng.randn(n, 3).astype(np.float32),
        features_rest=rng.randn(n, (k - 1) * 3).astype(np.float32),
        opacity=rng.randn(n, 1).astype(np.float32),
        scaling=rng.randn(n, 3).astype(np.float32),
        rotation=rng.randn(n, 4).astype(np.float32),
    )
    p_py = str(tmp_path / "py.ply")
    p_na = str(tmp_path / "native.ply")
    ply_io.save_gaussian_ply(p_py, **data)
    assert native.save_gaussian_ply(p_na, **data)
    with open(p_py, "rb") as f:
        py_bytes = f.read()
    with open(p_na, "rb") as f:
        na_bytes = f.read()
    assert py_bytes == na_bytes


def test_parallel_reads(tmp_path):
    paths = []
    for i in range(10):
        p = str(tmp_path / f"f{i}.bin")
        with open(p, "wb") as f:
            f.write(os.urandom(1000 + i))
        paths.append(p)
    datas = native.read_files_parallel(paths, n_threads=4)
    for i, (p, d) in enumerate(zip(paths, datas)):
        with open(p, "rb") as f:
            assert f.read() == d
