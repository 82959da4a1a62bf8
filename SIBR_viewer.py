#!/usr/bin/env python
"""Launch a SIBR viewer on a trained model (reference `SIBR_viewer.py`).

The PLY snapshots this framework writes are byte-compatible with the SIBR
gaussian viewer; point `--viewer_path` at a SIBR install
(`SIBR_gaussianViewer_app`). Optionally renders + computes metrics first."""

from __future__ import annotations

import os
import shutil
import sys
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--model_path", "-m", required=True)
    parser.add_argument("--viewer_path", default="",
                        help="dir containing SIBR_gaussianViewer_app")
    parser.add_argument("--with_metrics", action="store_true")
    args = parser.parse_args(argv)

    if args.with_metrics:
        os.system(f"{sys.executable} render.py -m {args.model_path}")
        os.system(f"{sys.executable} metrics.py -m {args.model_path}")

    app = None
    for cand in ("SIBR_gaussianViewer_app", "SIBR_gaussianViewer_app.exe"):
        p = os.path.join(args.viewer_path, cand) if args.viewer_path \
            else shutil.which(cand)
        if p and os.path.exists(p):
            app = p
            break
    if app is None:
        print("SIBR viewer binary not found; the model is viewable with any "
              "3DGS PLY viewer at:",
              os.path.join(args.model_path, "point_cloud"))
        return 1
    return os.system(f'"{app}" -m {args.model_path}')


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
