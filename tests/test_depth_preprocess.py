"""Border-handling + colorize utilities (reference zoedepth
preprocess.py:29-160, misc.py:97, data_mono.py:324-341)."""

import numpy as np

from priordepth_gaussiansplatting_tpu.depth import preprocess as pp
from priordepth_gaussiansplatting_tpu.depth.metrics import colorize


def test_single_side_borders_detected():
    # top-only border: exact edge found; other sides stop at min_border.
    # 6/64 < tolerance keeps the cross-direction scans at min_border.
    img = np.full((64, 80, 3), 180, np.uint8)
    img[:6] = 0
    c = pp.get_black_border(img)
    assert (c.top, c.bottom, c.left, c.right) == (6, 59, 5, 75)

    img = np.full((64, 80, 3), 120, np.uint8)
    img[:, -7:] = 255  # 7/80 < 0.1
    c = pp.get_white_border(img)
    assert (c.top, c.bottom, c.left, c.right) == (5, 59, 5, 72)


def test_full_frame_border_capped_at_cut_off():
    # A border on all four sides keeps every row/column above tolerance
    # (side pixels), so the scan runs to cut_off+1 — reference semantics
    # (preprocess.py:50-56 breaks AFTER incrementing past cut_off).
    img = np.full((96, 96, 3), 180, np.uint8)
    img[:12] = 0
    img[-12:] = 0
    img[:, :12] = 0
    img[:, -12:] = 0
    c = pp.get_black_border(img, cut_off=20)
    assert c.top == 21 and c.left == 21
    assert c.bottom == 96 - 21 and c.right == 96 - 21


def test_no_border_returns_min_border():
    img = np.full((64, 80, 3), 120, np.uint8)
    c = pp.get_black_border(img)
    assert (c.top, c.bottom, c.left, c.right) == (5, 59, 5, 75)


def test_avoid_boundary_shapes_and_padding():
    img = np.full((64, 80, 3), 180, np.uint8)
    img[:6] = 255  # top-only white border (6/64 < tolerance sideways)
    depth = np.random.RandomState(0).rand(64, 80).astype(np.float32) + 0.5
    img2, depth2 = pp.avoid_boundary(img, depth)
    assert img2.shape == img.shape and depth2.shape == depth.shape
    # depth padding is zeros (unsupervised), image padding is reflected.
    assert (depth2[:6] == 0).all()
    assert (img2[:6] != 255).any()
    # interior depth preserved (crop = rows 6:59, cols 5:75)
    np.testing.assert_array_equal(depth2[6:59, 5:75],
                                  depth[6:59, 5:75])


def test_crop_aware_infer_pads_back():
    img = np.full((64, 80, 3), 0.7, np.float32)
    img[:6] = 0.0  # top-only black border (thin: no sideways trip)
    calls = {}

    def fake_infer(x):
        calls["shape"] = x.shape
        return np.ones(x.shape[:2], np.float32) * 2.0

    pred = pp.crop_aware_infer(fake_infer, img)
    assert pred.shape == img.shape[:2]
    # crop rows 6:59, cols 5:75
    assert calls["shape"][:2] == (53, 70)
    assert (pred[:6] == 0).all()
    assert (pred[6:59, 5:75] == 2.0).all()


def test_colorize_shapes_and_invalid():
    d = np.random.rand(16, 16).astype(np.float32)
    d[0, 0] = -99
    img = colorize(d)
    assert img.shape == (16, 16, 4) and img.dtype == np.uint8
    assert tuple(img[0, 0]) == (128, 128, 128, 255)
    # valid pixels span the colormap (not constant)
    assert img[1:, :, :3].std() > 0
