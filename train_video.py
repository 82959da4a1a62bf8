#!/usr/bin/env python
"""Video → dataset → trained model orchestration (reference
`train_video.py`): ffmpeg frame extraction at a chosen fps, then the
train_image.py chain (COLMAP → depth prior → train)."""

from __future__ import annotations

import os
import shutil
import sys
from argparse import ArgumentParser


def run(cmd: str) -> None:
    print(f"$ {cmd}", flush=True)
    rc = os.system(cmd)
    if rc != 0:
        raise RuntimeError(f"command failed ({rc}): {cmd}")


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--video", "-v", required=True)
    parser.add_argument("--workdir", "-w", required=True)
    parser.add_argument("--fps", type=float, default=2.0)
    parser.add_argument("--depth_anything_dir", default="")
    parser.add_argument("--train_args", default="")
    args = parser.parse_args(argv)

    ffmpeg = shutil.which("ffmpeg") or "ffmpeg"
    input_dir = os.path.join(args.workdir, "input")
    os.makedirs(input_dir, exist_ok=True)
    run(f'{ffmpeg} -i "{args.video}" -qscale:v 1 -qmin 1 '
        f'-vf fps={args.fps} "{input_dir}/%04d.jpg"')

    da = f" --depth_anything_dir {args.depth_anything_dir}" \
        if args.depth_anything_dir else ""
    run(f"{sys.executable} train_image.py -s {args.workdir}{da} "
        f"--train_args \"{args.train_args}\"")


if __name__ == "__main__":
    main(sys.argv[1:])
