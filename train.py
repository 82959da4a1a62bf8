#!/usr/bin/env python
"""Train a 3D Gaussian Splatting model on TPU.

CLI-compatible with the reference `train.py` (same flag names: -s, -m, -r,
-d, --eval, --iterations, --test_iterations, --save_iterations,
--checkpoint_iterations, --start_checkpoint, --quiet, ...).
"""

from __future__ import annotations

import sys
from argparse import ArgumentParser

import numpy as np

from priordepth_gaussiansplatting_tpu.data.dataset import Scene
from priordepth_gaussiansplatting_tpu.train.trainer import Trainer
from priordepth_gaussiansplatting_tpu.utils.config import (
    ModelConfig, OptimizationConfig, PipelineConfig, add_dataclass_args,
    extract_dataclass)
from priordepth_gaussiansplatting_tpu.viewer import network_gui


def main(argv=None):
    parser = ArgumentParser(description="TPU 3DGS training")
    add_dataclass_args(parser, ModelConfig())
    add_dataclass_args(parser, OptimizationConfig())
    add_dataclass_args(parser, PipelineConfig())
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--disable_viewer", action="store_true")
    parser.add_argument("--detect_anomaly", action="store_true",
                        help="jax_debug_nans (reference --detect_anomaly)")
    parser.add_argument("--debug_from", type=int, default=-1,
                        help="enable jax_debug_nans from this iteration "
                             "(reference train.py --debug_from: turns on "
                             "the rasterizer debug path late in a run)")
    parser.add_argument("--profile", action="store_true",
                        help="write a jax.profiler trace to <model>/trace")
    parser.add_argument("--n_data", type=int, default=1,
                        help="camera data-parallel mesh axis size")
    parser.add_argument("--n_gauss", type=int, default=1,
                        help="Gaussian-shard mesh axis size (TP analog)")
    parser.add_argument("--tile_shard", action="store_true",
                        help="also shard tile compositing over the gauss "
                             "axis (SP analog, SURVEY.md §5.7)")
    parser.add_argument("--init_capacity", type=int, default=None,
                        help="pre-size the Gaussian store (avoids mid-run "
                             "capacity regrows/recompiles on long runs)")
    parser.add_argument("--pin_pair_capacity", type=int, default=None,
                        help="fix the rasterizer pair capacity (disables "
                             "the adaptive ladder; one compiled program "
                             "for the whole run)")
    args = parser.parse_args(argv)

    import jax
    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    model_cfg = extract_dataclass(ModelConfig, args)
    opt_cfg = extract_dataclass(OptimizationConfig, args)
    pipe_cfg = extract_dataclass(PipelineConfig, args)
    if not model_cfg.model_path:
        import uuid
        model_cfg.model_path = f"./output/{str(uuid.uuid4())[:10]}"
    print(f"Output folder: {model_cfg.model_path}")

    np.random.seed(args.seed)
    scene = Scene(model_cfg.source_path, model_cfg.model_path,
                  images=model_cfg.images, depths=model_cfg.depths,
                  eval_split=model_cfg.eval, resolution=model_cfg.resolution,
                  white_background=model_cfg.white_background,
                  train_test_exp=model_cfg.train_test_exp, seed=args.seed,
                  data_device=("cpu" if model_cfg.data_device == "cpu"
                               else "device"))
    mesh = None
    if args.n_data * args.n_gauss > 1:
        from priordepth_gaussiansplatting_tpu.parallel import mesh as mesh_lib
        mesh_lib.initialize_multihost()  # no-op single-process
        mesh = mesh_lib.make_mesh(args.n_data, args.n_gauss)
        print(f"Multi-chip mesh: data={args.n_data} gauss={args.n_gauss}"
              f"{' tile_shard' if args.tile_shard else ''} over "
              f"{len(jax.devices())} devices")
    trainer = Trainer(model_cfg, opt_cfg, pipe_cfg, scene, seed=args.seed,
                      quiet=args.quiet, mesh=mesh, tile_shard=args.tile_shard,
                      init_capacity=args.init_capacity,
                      pin_pair_capacity=args.pin_pair_capacity)
    if args.start_checkpoint:
        trainer.restore(args.start_checkpoint)

    gui = None
    if not args.disable_viewer:
        try:
            gui = network_gui.NetworkGUI(args.ip, args.port)
        except OSError as e:
            print(f"network GUI disabled: {e}")

    def poll_gui(tr, it, metrics):
        if args.debug_from >= 0 and it == max(args.debug_from, 1):
            # Reference parity: pipe.debug flips on at --debug_from so the
            # rasterizer dumps state on a crash; the jax equivalent is the
            # NaN-checking debug mode (reference train.py:138-139).
            jax.config.update("jax_debug_nans", True)
        if gui is not None:
            gui.poll(tr.state, tr.bg,
                     training_done=it >= opt_cfg.iterations,
                     source_path=model_cfg.source_path)

    import contextlib
    prof_ctx = (jax.profiler.trace(
        f"{model_cfg.model_path}/trace") if args.profile
        else contextlib.nullcontext())
    with prof_ctx:
        result = trainer.train(
            iterations=opt_cfg.iterations,
            test_iterations=set(args.test_iterations),
            save_iterations=set(args.save_iterations),
            checkpoint_iterations=set(args.checkpoint_iterations),
            on_iteration=(poll_gui if gui is not None
                          or args.debug_from >= 0 else None))
    print(f"\nTraining complete: {result}")
    return result


if __name__ == "__main__":
    main(sys.argv[1:])
