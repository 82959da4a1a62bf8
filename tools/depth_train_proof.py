#!/usr/bin/env python
"""On-chip depth-stack training run (VERDICT r03 #7).

The ~2.3 kLoC depth subsystem (flax ZoeDepth: ViT encoder, DPT decoder,
metric-bins head, SILog+GradL1 trainer — reference
`zoedepth/trainers/zoedepth_trainer.py:39-144`) had unit tests and a CPU
learning e2e but zero on-hardware evidence. This driver raycasts a
synthetic RGB-D dataset (the same scene generator as the splatting proof —
true metric depth per pixel), trains DepthModel on the real chip, and
records the SILog loss curve plus held-out eval metrics (a1/abs_rel/rmse,
reference `zoedepth/utils/misc.py:159-246`) to docs/DEPTH_RUN_r04.{md,json}.

Usage: python tools/depth_train_proof.py [steps] [size] [batch]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_rgbd(n_views: int, size: int):
    """Raycast RGB + metric depth from the synthetic proof scene."""
    import make_synthetic_scene as scn

    imgs, depths = [], []
    for i in range(n_views):
        R, t = scn.camera_pose(i, n_views)
        color, tbest, _ = scn.render_view(R, t, size, 0.82 * size)
        imgs.append(color.astype(np.float32))
        depths.append(tbest.astype(np.float32))  # inf for sky
    return np.stack(imgs), np.stack(depths)


def main(argv):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("steps", nargs="?", type=int, default=400)
    ap.add_argument("size", nargs="?", type=int, default=128)
    ap.add_argument("batch", nargs="?", type=int, default=8)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--embed_dim", type=int, default=192)
    ap.add_argument("--encoder_depth", type=int, default=6)
    ap.add_argument("--n_bins", type=int, default=32)
    ap.add_argument("--bin_centers_type", default="normed",
                    help="normed|softplus (reference knob)")
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--tag", default="r04")
    args = ap.parse_args(argv)
    cpu = args.cpu
    steps, size, batch = args.steps, args.size, args.batch

    import jax
    import jax.numpy as jnp

    if cpu:  # the axon plugin ignores JAX_PLATFORMS env
        jax.config.update("jax_platforms", "cpu")

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from priordepth_gaussiansplatting_tpu.depth import config as dcfg
    from priordepth_gaussiansplatting_tpu.depth.metrics import compute_metrics
    from priordepth_gaussiansplatting_tpu.depth.trainer import (
        DepthTrainer, DepthTrainerConfig)

    n_train, n_test = 40, 8
    imgs, depths = make_rgbd(n_train + n_test, size)
    max_depth = 8.0
    masks = np.isfinite(depths) & (depths > 0.05) & (depths < max_depth)
    depths = np.where(masks, depths, 1.0)
    tr_img, te_img = imgs[:n_train], imgs[n_train:]
    tr_d, te_d = depths[:n_train], depths[n_train:]
    tr_m, te_m = masks[:n_train], masks[n_train:]
    print(f"dataset: {n_train}+{n_test} views @{size}px, depth "
          f"p5/p95 = {np.percentile(tr_d[tr_m], 5):.2f}/"
          f"{np.percentile(tr_d[tr_m], 95):.2f} m", flush=True)

    # normed bin centers (a reference bin_centers_type) converge within a
    # few hundred steps; the softplus default starts all centers ≈0.7 m
    # and is tuned for multi-epoch schedules.
    cfg = dcfg.get_config("depth", "train", "nyu",
                          embed_dim=args.embed_dim,
                          encoder_depth=args.encoder_depth,
                          n_bins=args.n_bins, max_depth=max_depth,
                          bin_centers_type=args.bin_centers_type)
    model = dcfg.build_model(cfg)
    tcfg = DepthTrainerConfig(steps_per_epoch=steps, epochs=1, lr=args.lr,
                              max_depth=max_depth,
                              log_dir=os.path.join(REPO, ".proofrun",
                                                   "depth_logs"))
    trainer = DepthTrainer(model, tcfg)
    trainer.init(jnp.asarray(tr_img[:1]))
    n_params = sum(int(np.prod(np.shape(x)))
                   for x in jax.tree.leaves(trainer.params))
    print(f"model: {n_params / 1e6:.1f}M params", flush=True)

    rng = np.random.RandomState(0)
    curve = []
    t0 = time.time()
    for s in range(steps):
        idx = rng.choice(n_train, batch, replace=False)
        loss = trainer.train_step(jnp.asarray(tr_img[idx]),
                                  jnp.asarray(tr_d[idx]),
                                  jnp.asarray(tr_m[idx]))
        if s % 10 == 0 or s == steps - 1:
            curve.append([s, round(float(loss), 4)])
            if s % 50 == 0:
                print(f"[{s}/{steps}] silog+grad loss {loss:.4f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
    wall = time.time() - t0

    # Held-out eval (hard metric depth, garg/eigen-free full mask).
    # Retry the eval jit: the remote compile service can drop the
    # connection transiently (observed r05: "Broken pipe" on the fresh
    # eval-batch shape after a clean 400-step training run).
    # Params must be a jit ARGUMENT, not a closure constant: closed-over
    # arrays serialize into the compile request, and at ViT-B size (93M
    # params ~ 373 MB) the remote compile service rejects the body
    # (HTTP 413) or drops the connection (observed r05).
    eval_fn = jax.jit(lambda p, x: model.apply(p, x)["metric_depth"])
    pred = None
    for attempt in range(3):
        try:
            pred = np.asarray(eval_fn(trainer.params, jnp.asarray(te_img)))
            break
        except Exception as e:
            print(f"[depth] eval attempt {attempt} failed: {e}", flush=True)
            time.sleep(20)
    if pred is None:
        # Fall back to the (already compiled) train-batch shape.
        pred = np.concatenate([
            np.asarray(eval_fn(trainer.params,
                               jnp.asarray(te_img[i:i + batch])))
            for i in range(0, len(te_img), batch)])
    pred = np.clip(pred, tcfg.min_depth, max_depth)
    m = compute_metrics(te_d[te_m], pred[te_m], crop=None)
    m = {k: round(float(v), 4) for k, v in m.items()}
    print("eval:", m, flush=True)
    # structured experiment sinks (the reference's wandb role,
    # base_trainer.py:151-199): metric dict + colorized depth triplet
    trainer.log_eval(m)
    trainer.log_depth_images(te_img[:1], te_d[:1], pred[:1])

    payload = {"steps": steps, "size": size, "batch": batch,
               "embed_dim": args.embed_dim,
               "encoder_depth": args.encoder_depth,
               "n_bins": args.n_bins,
               "bin_centers_type": args.bin_centers_type,
               "wall_s": round(wall, 1),
               "steps_per_s": round(steps / wall, 2),
               "n_params": n_params, "loss_curve": curve, "eval": m,
               "device": str(jax.devices()[0])}
    os.makedirs(os.path.join(REPO, "docs"), exist_ok=True)
    with open(os.path.join(REPO, "docs", f"DEPTH_RUN_{args.tag}.json"), "w") as f:
        json.dump(payload, f, indent=1)
    lines = [
        f"# Depth-stack training run — {args.tag} (real TPU chip)",
        "",
        f"`DepthModel` ({n_params / 1e6:.1f}M params: ViT-{cfg.embed_dim} "
        f"encoder ×{cfg.encoder_depth}, DPT decoder, {cfg.n_bins}-bin "
        "metric head) trained with the SILog+GradL1 recipe "
        "(`depth/trainer.py`, reference `zoedepth_trainer.py:39-104`) on a "
        f"raycast synthetic RGB-D set ({n_train} train / {n_test} test "
        f"views @{size}²). First on-hardware evidence for the depth "
        "subsystem (VERDICT r03 #7).",
        "",
        f"* {steps} steps, batch {batch}: **{wall:.0f} s** "
        f"({steps / wall:.2f} steps/s) on `{jax.devices()[0]}`",
        f"* SILog+GradL1: **{curve[0][1]:.3f} → {curve[-1][1]:.3f}**",
        f"* held-out metrics: a1 **{m.get('a1')}**, abs_rel "
        f"**{m.get('abs_rel')}**, rmse **{m.get('rmse')}** "
        "(reference metric names, `zoedepth/utils/misc.py:159-246`)",
        "",
        "| step | loss |", "|---|---|",
    ]
    lines += [f"| {s} | {v} |" for s, v in curve[:: max(1, len(curve) // 15)]]
    with open(os.path.join(REPO, "docs", f"DEPTH_RUN_{args.tag}.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({k: v for k, v in payload.items()
                      if k != "loss_curve"}))


if __name__ == "__main__":
    main(sys.argv[1:])
