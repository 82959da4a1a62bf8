"""Training observability (reference §5.5): JSONL event log with the
reference's TensorBoard scalar names, optional TensorBoard pass-through when
the package exists, and the timestamped-stdout + seeding `safe_state`
(`utils/general_utils.py:112-133`)."""

from __future__ import annotations

import json
import os
import random
import sys
import time
from datetime import datetime
from typing import Optional

import numpy as np


class MetricsLogger:
    """Scalars -> <model_path>/events.jsonl (+ TensorBoard if available)."""

    def __init__(self, model_path: str):
        self.path = os.path.join(model_path, "events.jsonl") \
            if model_path else ""
        if model_path:
            os.makedirs(model_path, exist_ok=True)
        self._fh = open(self.path, "a") if self.path else None
        self._tb = None
        if model_path:
            try:
                from torch.utils.tensorboard import SummaryWriter  # noqa
                self._tb = SummaryWriter(model_path)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._fh is not None:
            self._fh.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step),
                 "ts": time.time()}) + "\n")
            self._fh.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def scalars(self, values: dict, step: int) -> None:
        for tag, v in values.items():
            self.scalar(tag, v, step)

    def image(self, tag: str, img, step: int) -> None:
        """Rendered/GT view logging (reference `train.py:421-427`
        tb_writer.add_images). `img` is (3, H, W) float [0, 1]. TensorBoard
        gets it natively; without TB a PNG artifact is written under
        <model_path>/tb_images/ and its path recorded in the JSONL."""
        img = np.asarray(img)
        if self._tb is not None:
            self._tb.add_images(tag, img[None], global_step=step)
        if self.path:
            out_dir = os.path.join(os.path.dirname(self.path), "tb_images")
            os.makedirs(out_dir, exist_ok=True)
            safe = tag.replace("/", "_").replace(" ", "_")
            fname = os.path.join(out_dir, f"{safe}_{step}.png")
            arr = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
            arr = np.transpose(arr, (1, 2, 0))
            try:
                from PIL import Image  # noqa: PLC0415
                Image.fromarray(arr).save(fname)
            except Exception as e:
                if not getattr(self, "_image_warned", False):
                    self._image_warned = True
                    print(f"[logging] image save failed for {fname}: {e} "
                          "(further image-save failures silenced)",
                          flush=True)
                return
            if self._fh is not None:
                self._fh.write(json.dumps(
                    {"tag": tag, "image": fname, "step": int(step),
                     "ts": time.time()}) + "\n")
                self._fh.flush()

    def histogram(self, tag: str, values, step: int, bins: int = 64) -> None:
        """Histogram logging (reference `train.py:441`
        tb_writer.add_histogram on the opacity vector). The JSONL records
        the bin counts + edges so the distribution is reconstructible."""
        values = np.asarray(values).reshape(-1)
        # torch's add_histogram raises on empty/all-nonfinite input; a
        # logging call must never kill a training run.
        finite = values[np.isfinite(values)]
        if self._tb is not None and finite.size:
            self._tb.add_histogram(tag, finite, global_step=step)
        if self._fh is not None:
            counts, edges = (np.histogram(finite, bins=bins) if finite.size
                             else (np.zeros(bins, np.int64),
                                   np.zeros(bins + 1)))
            self._fh.write(json.dumps(
                {"tag": tag, "step": int(step), "ts": time.time(),
                 "hist": {"counts": counts.tolist(),
                          "lo": float(edges[0]), "hi": float(edges[-1]),
                          "mean": float(finite.mean()) if finite.size else 0.0,
                          "n": int(finite.size)}}) + "\n")
            self._fh.flush()

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
        if self._tb is not None:
            self._tb.close()


class _TimestampedStream:
    def __init__(self, stream, quiet: bool):
        self.stream = stream
        self.quiet = quiet

    def write(self, text):
        if self.quiet:
            return
        if text.endswith("\n"):
            ts = datetime.now().strftime("%d/%m %H:%M:%S")
            text = text.replace("\n", f" [{ts}]\n", 1)
        self.stream.write(text)

    def flush(self):
        self.stream.flush()


def safe_state(quiet: bool = False, seed: int = 0,
               timestamp_stdout: bool = False) -> None:
    """Deterministic seeding (+ optional reference-style timestamped
    stdout). The reference also pins cuda:0 here; device selection on TPU
    is the mesh's job."""
    random.seed(seed)
    np.random.seed(seed)
    if timestamp_stdout:
        sys.stdout = _TimestampedStream(sys.stdout, quiet)
