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
