#!/usr/bin/env python
"""LLFF dataset download via kagglehub (reference
`llff_dataset_download.py`); gated on the optional dependency."""

import sys

try:
    import kagglehub
except ImportError:
    print("kagglehub not installed; download the LLFF dataset manually "
          "(kaggle: arenagrenade/llff-dataset-full)")
    sys.exit(1)

path = kagglehub.dataset_download("arenagrenade/llff-dataset-full")
print("Path to dataset files:", path)
