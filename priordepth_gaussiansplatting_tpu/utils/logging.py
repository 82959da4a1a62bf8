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
