#!/usr/bin/env python
"""Batch-render train/test views of a saved model to PNGs.

CLI-compatible with the reference `render.py`: reads `<model>/cfg_args`,
writes `<model>/{train,test}/ours_<iter>/{renders,gt}/*.png`.
"""

from __future__ import annotations

import os
import sys
from argparse import ArgumentParser

import jax.numpy as jnp
import numpy as np
from PIL import Image

from priordepth_gaussiansplatting_tpu.data.dataset import Scene
from priordepth_gaussiansplatting_tpu.train import step as step_lib
from priordepth_gaussiansplatting_tpu.train.checkpoint import \
    load_model_snapshot
from priordepth_gaussiansplatting_tpu.utils.config import (
    ModelConfig, PipelineConfig, add_dataclass_args, extract_dataclass,
    get_combined_args)


def save_png(path, img_chw):
    arr = np.asarray(jnp.clip(img_chw, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr.transpose(1, 2, 0)).save(path)


def render_set(model_path, name, iteration, cameras, state, bg, pipe,
               train_test_exp):
    rdir = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gdir = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(rdir, exist_ok=True)
    os.makedirs(gdir, exist_ok=True)
    for idx, cam in enumerate(cameras):
        # Jitted + cached per (resolution, capacity): batch rendering a
        # full camera set compiles once instead of paying an eager
        # host<->device round trip per op (reference render.py:30-46).
        out = step_lib.eval_image(
            cam, state, bg, antialiasing=pipe.antialiasing,
            use_trained_exp=train_test_exp, backend=pipe.backend)
        if out.get("overflow") is not None and int(out["overflow"]) > 0:
            print(f"WARNING: view {idx} overflowed the pair capacity by "
                  f"{int(out['overflow'])} — rendered image is missing "
                  "splats; re-render with a larger capacity", flush=True)
        img = out["render"]
        gt = cam.image
        if train_test_exp:  # left half was used for exposure training
            img = img[..., img.shape[-1] // 2:]
            gt = gt[..., gt.shape[-1] // 2:] if gt is not None else None
        save_png(os.path.join(rdir, f"{idx:05d}.png"), img)
        if gt is not None:
            save_png(os.path.join(gdir, f"{idx:05d}.png"), gt)


def main(argv=None):
    parser = ArgumentParser(description="Render a trained model")
    add_dataclass_args(parser, ModelConfig())
    add_dataclass_args(parser, PipelineConfig())
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = get_combined_args(parser, argv)
    model_cfg = extract_dataclass(ModelConfig, args)
    pipe_cfg = extract_dataclass(PipelineConfig, args)
    print(f"Rendering {model_cfg.model_path}")

    state = load_model_snapshot(model_cfg.model_path, args.iteration,
                                max_sh_degree=model_cfg.sh_degree)
    iteration = args.iteration
    if iteration == -1:
        pc_dir = os.path.join(model_cfg.model_path, "point_cloud")
        iteration = max(int(d.split("_")[1]) for d in os.listdir(pc_dir))
    scene = Scene(model_cfg.source_path, "", images=model_cfg.images,
                  depths=model_cfg.depths, eval_split=model_cfg.eval,
                  resolution=model_cfg.resolution,
                  white_background=model_cfg.white_background,
                  train_test_exp=model_cfg.train_test_exp, shuffle=False)
    # Pretrained exposures (reference load_ply + exposure.json,
    # gaussian_model.py:269-280): align the saved per-image table with the
    # scene's train-image order.
    exp_path = os.path.join(model_cfg.model_path, "exposure.json")
    if model_cfg.train_test_exp and os.path.exists(exp_path):
        import json
        with open(exp_path) as f:
            exposures = json.load(f)
        table = np.tile(np.eye(3, 4, dtype=np.float32)[None],
                        (max(len(scene.exposure_ids), 1), 1, 1))
        for name, idx in scene.exposure_ids.items():
            if name in exposures:
                table[idx] = np.asarray(exposures[name], np.float32)
        state = state.replace(params=state.params.replace(
            exposure=jnp.asarray(table)))

    bg = jnp.asarray([1.0, 1.0, 1.0] if model_cfg.white_background
                     else [0.0, 0.0, 0.0])
    if not args.skip_train:
        render_set(model_cfg.model_path, "train", iteration,
                   scene.train_cameras, state, bg, pipe_cfg,
                   model_cfg.train_test_exp)
    if not args.skip_test:
        render_set(model_cfg.model_path, "test", iteration,
                   scene.test_cameras, state, bg, pipe_cfg,
                   model_cfg.train_test_exp)


if __name__ == "__main__":
    main(sys.argv[1:])
