#!/usr/bin/env python
"""Bulk resize with frame skip (reference `resize_images.py`)."""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

from PIL import Image


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--input_dir", "-i", required=True)
    parser.add_argument("--output_dir", "-o", required=True)
    parser.add_argument("--width", type=int, default=1500)
    parser.add_argument("--height", type=int, default=1000)
    parser.add_argument("--skip", type=int, default=1,
                        help="keep every Nth frame")
    args = parser.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    names = sorted(os.listdir(args.input_dir))
    for i, name in enumerate(names):
        if i % args.skip:
            continue
        src = os.path.join(args.input_dir, name)
        try:
            with Image.open(src) as im:
                im.resize((args.width, args.height),
                          Image.Resampling.LANCZOS).save(
                    os.path.join(args.output_dir, name))
        except OSError:
            continue
    print("done")


if __name__ == "__main__":
    main(sys.argv[1:])
