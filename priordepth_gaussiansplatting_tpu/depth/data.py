"""Depth-training data pipeline (reference `zoedepth/data/data_mono.py`).

Folder-based RGB+depth datasets with the reference's train augmentations
(random rotate / crop / horizontal flip / gamma / brightness / colour,
`DataLoadPreprocess`, data_mono.py:270-509), round-robin dataset mixing
(`MixedNYUKITTI`), and per-host batch sharding in place of torch's
DistributedSampler: every host reads its `process_index`-strided subset and
the trainer's mesh shards the device batch.
"""

from __future__ import annotations

import dataclasses
import os
import random
from typing import Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image


@dataclasses.dataclass
class DepthSample:
    image: np.ndarray   # (H, W, 3) float32 [0, 1]
    depth: np.ndarray   # (H, W) float32 metric depth
    mask: np.ndarray    # (H, W) bool


@dataclasses.dataclass
class AugmentConfig:
    """Reference train-time augmentations (data_mono.py:286-413)."""

    do_random_rotate: bool = True
    degree: float = 2.5
    do_flip: bool = True
    do_color_aug: bool = True
    gamma_range: tuple = (0.9, 1.1)
    brightness_range: tuple = (0.9, 1.1)
    color_range: tuple = (0.9, 1.1)
    crop_h: int = 416
    crop_w: int = 544


def _rotate(arr: np.ndarray, angle_deg: float, bilinear: bool) -> np.ndarray:
    im = Image.fromarray(arr if arr.ndim == 3 else arr.astype(np.float32))
    resample = (Image.Resampling.BILINEAR if bilinear
                else Image.Resampling.NEAREST)
    return np.asarray(im.rotate(angle_deg, resample=resample))


def augment(sample: DepthSample, cfg: AugmentConfig,
            rng: random.Random) -> DepthSample:
    img, depth, mask = sample.image, sample.depth, sample.mask
    if cfg.do_random_rotate:
        angle = rng.uniform(-cfg.degree, cfg.degree)
        img = _rotate((img * 255).astype(np.uint8), angle, True) / 255.0
        depth = _rotate(depth, angle, False)
        mask = _rotate(mask.astype(np.float32), angle, False) > 0.5
    h, w = depth.shape
    ch, cw = min(cfg.crop_h, h), min(cfg.crop_w, w)
    y = rng.randint(0, h - ch) if h > ch else 0
    x = rng.randint(0, w - cw) if w > cw else 0
    img = img[y:y + ch, x:x + cw]
    depth = depth[y:y + ch, x:x + cw]
    mask = mask[y:y + ch, x:x + cw]
    if cfg.do_flip and rng.random() > 0.5:
        img = img[:, ::-1]
        depth = depth[:, ::-1]
        mask = mask[:, ::-1]
    if cfg.do_color_aug and rng.random() > 0.5:
        img = img ** rng.uniform(*cfg.gamma_range)
        img = img * rng.uniform(*cfg.brightness_range)
        colors = np.array([rng.uniform(*cfg.color_range)
                           for _ in range(3)])
        white = np.ones_like(img)
        img = np.clip(img * (white * colors), 0.0, 1.0)
    return DepthSample(np.ascontiguousarray(img.astype(np.float32)),
                       np.ascontiguousarray(depth.astype(np.float32)),
                       np.ascontiguousarray(mask))


class FolderDepthDataset:
    """Paired `images/` + `depths/` folders; depth PNGs are 16-bit values
    scaled by `depth_scale` (NYU: 1000, KITTI: 256)."""

    def __init__(self, root: str, depth_scale: float = 1000.0,
                 min_depth: float = 1e-3, max_depth: float = 10.0,
                 images_dir: str = "images", depths_dir: str = "depths"):
        self.root = root
        self.depth_scale = depth_scale
        self.min_depth = min_depth
        self.max_depth = max_depth
        img_root = os.path.join(root, images_dir)
        self.names = sorted(
            n for n in os.listdir(img_root)
            if os.path.splitext(n)[1].lower() in (".png", ".jpg", ".jpeg"))
        self.images_dir = img_root
        self.depths_dir = os.path.join(root, depths_dir)

    def __len__(self) -> int:
        return len(self.names)

    def __getitem__(self, idx: int) -> DepthSample:
        name = self.names[idx]
        stem = os.path.splitext(name)[0]
        with Image.open(os.path.join(self.images_dir, name)) as im:
            img = np.asarray(im.convert("RGB"), np.float32) / 255.0
        with Image.open(os.path.join(self.depths_dir, stem + ".png")) as dm:
            depth = np.asarray(dm, np.float32) / self.depth_scale
        mask = (depth > self.min_depth) & (depth < self.max_depth)
        return DepthSample(img, depth, mask)


class MixedDataset:
    """Round-robin mixing of several datasets (reference MixedNYUKITTI,
    data_mono.py:181-238); exposes the source index as the domain label."""

    def __init__(self, datasets: Sequence):
        self.datasets = list(datasets)

    def __len__(self) -> int:
        return sum(len(d) for d in self.datasets)

    def sample(self, rng: random.Random):
        d_idx = rng.randrange(len(self.datasets))
        ds = self.datasets[d_idx]
        return ds[rng.randrange(len(ds))], d_idx


def batches(dataset, batch_size: int, cfg: Optional[AugmentConfig] = None,
            seed: int = 0, host_count: int = 1, host_index: int = 0,
            epochs: int = 1) -> Iterator[dict]:
    """Host-sharded shuffled batch iterator (the DistributedSampler
    equivalent: each host sees its strided subset of the permutation)."""
    rng = random.Random(seed + host_index)
    n = len(dataset)
    for epoch in range(epochs):
        order = list(range(n))
        random.Random(seed + epoch).shuffle(order)   # same across hosts
        local = order[host_index::host_count]
        for i in range(0, len(local) - batch_size + 1, batch_size):
            samples = []
            for j in local[i:i + batch_size]:
                s = dataset[j]
                if cfg is not None:
                    s = augment(s, cfg, rng)
                samples.append(s)
            yield {
                "image": np.stack([s.image for s in samples]),
                "depth": np.stack([s.depth for s in samples]),
                "mask": np.stack([s.mask for s in samples]),
            }


# Per-dataset conventions (reference zoedepth DATASETS_CONFIG /
# data_mono.py dataset registry): depth PNG scale factor, eval depth caps
# and crop. Folder layouts normalise to images/ + depths/.
DATASET_PRESETS = {
    "nyu": dict(depth_scale=1000.0, min_depth=1e-3, max_depth=10.0,
                min_depth_eval=1e-3, max_depth_eval=10.0, eigen_crop=True),
    "kitti": dict(depth_scale=256.0, min_depth=1e-3, max_depth=80.0,
                  min_depth_eval=1e-3, max_depth_eval=80.0, garg_crop=True),
    "ibims": dict(depth_scale=1000.0, min_depth=1e-3, max_depth=10.0,
                  min_depth_eval=0.0, max_depth_eval=50.0, eigen_crop=True),
    "sunrgbd": dict(depth_scale=1000.0, min_depth=1e-3, max_depth=8.0,
                    min_depth_eval=1e-3, max_depth_eval=8.0,
                    eigen_crop=True),
    "diml_indoor": dict(depth_scale=1000.0, min_depth=1e-3, max_depth=10.0,
                        min_depth_eval=1e-3, max_depth_eval=10.0,
                        eigen_crop=True),
    "diml_outdoor": dict(depth_scale=1000.0, min_depth=1e-3,
                         max_depth=80.0, min_depth_eval=2.0,
                         max_depth_eval=80.0, garg_crop=True),
    "diode_indoor": dict(depth_scale=256.0, min_depth=1e-3, max_depth=10.0,
                         min_depth_eval=1e-3, max_depth_eval=10.0,
                         eigen_crop=True),
    "diode_outdoor": dict(depth_scale=256.0, min_depth=1e-3,
                          max_depth=80.0, min_depth_eval=1e-3,
                          max_depth_eval=80.0, garg_crop=True),
    "hypersim": dict(depth_scale=1000.0, min_depth=1e-3, max_depth=10.0,
                     min_depth_eval=1e-3, max_depth_eval=10.0,
                     eigen_crop=True),
    "vkitti2": dict(depth_scale=100.0, min_depth=1e-3, max_depth=80.0,
                    min_depth_eval=1e-3, max_depth_eval=80.0,
                    garg_crop=True),
    "ddad": dict(depth_scale=256.0, min_depth=1e-3, max_depth=80.0,
                 min_depth_eval=1e-3, max_depth_eval=80.0, garg_crop=True),
    "mix": dict(depth_scale=1000.0, min_depth=1e-3, max_depth=80.0),
}


def make_dataset(root: str, preset: str = "nyu", **overrides):
    """Folder dataset with a named per-dataset convention preset."""
    cfg = dict(DATASET_PRESETS[preset])
    cfg.update(overrides)
    return FolderDepthDataset(
        root, depth_scale=cfg["depth_scale"],
        min_depth=cfg["min_depth"], max_depth=cfg["max_depth"])


# --- Concrete dataset layouts (reference zoedepth/data/data_mono.py) -------
#
# The reference trains/evals from "filenames files" — text files whose lines
# are `rgb_rel_path depth_rel_path focal` — resolved against data_path /
# gt_path, with KITTI's kb_crop applied at load (`data_mono.py:270-509`).
# The walkers below additionally discover the standard on-disk layouts
# directly (KITTI raw + depth-annotated, NYUv2 scene folders) so the loaders
# work without the txt indices.


def kb_crop(arr: np.ndarray) -> np.ndarray:
    """KITTI benchmark crop: bottom-centre 352x1216 window
    (`data_mono.py`: top_margin = h-352, left_margin = (w-1216)/2)."""
    h, w = arr.shape[:2]
    top = max(h - 352, 0)
    left = max((w - 1216) // 2, 0)
    return arr[top:top + 352, left:left + 1216]


class TxtSplitDepthDataset:
    """Reference filenames-file dataset: lines `rgb_rel depth_rel [focal]`.

    `data_path`/`gt_path` mirror the reference config fields; `None` depth
    paths (the literal string "None" in eval splits with missing gt) yield
    all-false masks. Set `do_kb_crop` for KITTI conventions."""

    def __init__(self, data_path: str, gt_path: str, filenames_file: str,
                 depth_scale: float = 256.0, min_depth: float = 1e-3,
                 max_depth: float = 80.0, do_kb_crop: bool = False):
        self.data_path = data_path
        self.gt_path = gt_path
        self.depth_scale = depth_scale
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.do_kb_crop = do_kb_crop
        self.entries = []
        with open(filenames_file) as f:
            for line in f:
                parts = line.split()
                if not parts:
                    continue
                rgb = parts[0]
                depth = parts[1] if len(parts) > 1 else "None"
                focal = float(parts[2]) if len(parts) > 2 else 0.0
                self.entries.append((rgb, depth, focal))

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, idx: int) -> DepthSample:
        rgb_rel, depth_rel, _ = self.entries[idx]
        with Image.open(os.path.join(self.data_path,
                                     rgb_rel.lstrip("/"))) as im:
            img = np.asarray(im.convert("RGB"), np.float32) / 255.0
        if depth_rel == "None":
            depth = np.zeros(img.shape[:2], np.float32)
        else:
            with Image.open(os.path.join(self.gt_path,
                                         depth_rel.lstrip("/"))) as dm:
                depth = np.asarray(dm, np.float32) / self.depth_scale
        if self.do_kb_crop:
            img = kb_crop(img)
            depth = kb_crop(depth)
        mask = (depth > self.min_depth) & (depth < self.max_depth)
        return DepthSample(img, depth, mask)


class KittiDepthDataset:
    """KITTI raw + depth-annotated on-disk layout walker.

    rgb:   <root>/<date>/<drive>_sync/image_02/data/<frame>.png
    depth: <gt_root>/<drive>_sync/proj_depth/groundtruth/image_02/<frame>.png
    Depth PNGs are uint16 metres*256; frames without gt are skipped. kb_crop
    applied (KITTI eval convention; garg crop happens at metric time)."""

    def __init__(self, root: str, gt_root: str, min_depth: float = 1e-3,
                 max_depth: float = 80.0, do_kb_crop: bool = True):
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.do_kb_crop = do_kb_crop
        self.pairs = []
        for date in sorted(os.listdir(root)):
            dpath = os.path.join(root, date)
            if not os.path.isdir(dpath):
                continue
            for drive in sorted(os.listdir(dpath)):
                img_dir = os.path.join(dpath, drive, "image_02", "data")
                gt_dir = os.path.join(gt_root, drive, "proj_depth",
                                      "groundtruth", "image_02")
                if not (os.path.isdir(img_dir) and os.path.isdir(gt_dir)):
                    continue
                for fn in sorted(os.listdir(img_dir)):
                    gt = os.path.join(gt_dir, fn)
                    if fn.endswith(".png") and os.path.exists(gt):
                        self.pairs.append((os.path.join(img_dir, fn), gt))

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> DepthSample:
        rgb_p, gt_p = self.pairs[idx]
        with Image.open(rgb_p) as im:
            img = np.asarray(im.convert("RGB"), np.float32) / 255.0
        with Image.open(gt_p) as dm:
            depth = np.asarray(dm, np.float32) / 256.0
        if self.do_kb_crop:
            img, depth = kb_crop(img), kb_crop(depth)
        mask = (depth > self.min_depth) & (depth < self.max_depth)
        return DepthSample(img, depth, mask)


class NyuDepthDataset:
    """NYUv2 scene-folder layout walker.

    <root>/<scene>/rgb_<k>.jpg + <root>/<scene>/sync_depth_<k>.png, depth
    uint16 metres*1000; the eigen crop happens at metric time."""

    def __init__(self, root: str, min_depth: float = 1e-3,
                 max_depth: float = 10.0):
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.pairs = []
        for scene in sorted(os.listdir(root)):
            spath = os.path.join(root, scene)
            if not os.path.isdir(spath):
                continue
            for fn in sorted(os.listdir(spath)):
                if fn.startswith("rgb_"):
                    stem = os.path.splitext(fn[len("rgb_"):])[0]
                    gt = os.path.join(spath, f"sync_depth_{stem}.png")
                    if os.path.exists(gt):
                        self.pairs.append((os.path.join(spath, fn), gt))

    def __len__(self) -> int:
        return len(self.pairs)

    def __getitem__(self, idx: int) -> DepthSample:
        rgb_p, gt_p = self.pairs[idx]
        with Image.open(rgb_p) as im:
            img = np.asarray(im.convert("RGB"), np.float32) / 255.0
        with Image.open(gt_p) as dm:
            depth = np.asarray(dm, np.float32) / 1000.0
        mask = (depth > self.min_depth) & (depth < self.max_depth)
        return DepthSample(img, depth, mask)
