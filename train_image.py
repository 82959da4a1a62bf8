#!/usr/bin/env python
"""Image-folder → trained model orchestration (reference `train_image.py`):
convert.py (COLMAP) → DepthAnythingV2 inverse-depth PNGs → depth-scale
alignment → train.py with the depth prior."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser


def run(cmd: str) -> None:
    print(f"$ {cmd}", flush=True)
    rc = os.system(cmd)
    if rc != 0:
        raise RuntimeError(f"command failed ({rc}): {cmd}")


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--source_path", "-s", required=True)
    parser.add_argument("--model_path", "-m", default="")
    parser.add_argument("--depth_anything_dir", default="",
                        help="checkout of DepthAnythingV2 (run.py); skip "
                             "depth generation if empty and depths exist")
    parser.add_argument("--skip_colmap", action="store_true")
    parser.add_argument("--train_args", default="")
    args = parser.parse_args(argv)
    src = args.source_path

    if not args.skip_colmap:
        run(f"{sys.executable} convert.py -s {src}")

    depths_dir = os.path.join(src, "depths")
    if args.depth_anything_dir:
        # Reference recipe (README.md:61-75): vitl, grayscale, pred-only.
        run(f"{sys.executable} {args.depth_anything_dir}/run.py "
            f"--encoder vitl --pred-only --grayscale "
            f"--img-path {src}/images --outdir {depths_dir}")
    if os.path.isdir(depths_dir):
        from priordepth_gaussiansplatting_tpu.data.depth_scale import \
            make_depth_scale
        make_depth_scale(src, depths_dir)
        depth_flag = " -d depths"
    else:
        print("no depths dir; training without depth prior")
        depth_flag = ""

    model_flag = f" -m {args.model_path}" if args.model_path else ""
    run(f"{sys.executable} train.py -s {src}{model_flag}{depth_flag} "
        f"{args.train_args}")


if __name__ == "__main__":
    main(sys.argv[1:])
