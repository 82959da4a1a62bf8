"""Training orchestration — the reference `train.py:64-342` loop, TPU-native.

Per-iteration work (render → loss → backward → Adam → densify stats) is one
jitted XLA program (train/step.py). This host loop handles what must stay on
the host: camera sampling, the densify/opacity-reset/SH-degree schedule,
capacity regrow + re-jit, eval/save/checkpoint, logging, and the optional
network-GUI poll.
"""

from __future__ import annotations

import os
import random
import sys
import time
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import Camera
from ..models import gaussians as gm
from ..utils.config import (ModelConfig, OptimizationConfig, PipelineConfig,
                            save_cfg_args)
from ..utils.logging import MetricsLogger
from . import checkpoint as ckpt
from . import optim
from . import step as step_lib


class Trainer:
    def __init__(self, model_cfg: ModelConfig, opt_cfg: OptimizationConfig,
                 pipe_cfg: PipelineConfig, scene, seed: int = 0,
                 quiet: bool = False, mesh=None, tile_shard: bool = False,
                 init_capacity: Optional[int] = None,
                 pin_pair_capacity: Optional[int] = None):
        self.model_cfg = model_cfg
        self.opt_cfg = opt_cfg
        self.pipe_cfg = pipe_cfg
        self.scene = scene
        self.quiet = quiet
        self.rng = random.Random(seed)
        self.key = jax.random.PRNGKey(seed)
        self.mesh = mesh
        self.tile_shard = tile_shard
        if mesh is not None:
            from ..parallel import mesh as mesh_lib  # noqa: PLC0415
            self.n_data = int(mesh.shape[mesh_lib.DATA_AXIS])
            self.n_gauss = int(mesh.shape[mesh_lib.GAUSS_AXIS])
        else:
            self.n_data = self.n_gauss = 1

        xyz, colors, _ = scene.point_cloud()
        n_pts = int(np.asarray(xyz).shape[0])
        capacity = init_capacity
        if self.n_gauss > 1 and capacity is None:
            capacity = int(max(2 ** int(np.ceil(np.log2(max(n_pts * 4, 1024)))),
                               1024, self.n_gauss))
        if capacity is not None and self.n_gauss > 1:
            capacity = -(-capacity // self.n_gauss) * self.n_gauss
        self.state = gm.create_from_points(
            np.asarray(xyz), np.asarray(colors),
            num_images=len(scene.train_cameras),
            capacity=capacity,
            max_sh_degree=model_cfg.sh_degree,
            spatial_lr_scale=scene.cameras_extent)
        self.opt_state = optim.init_adam(self.state.params)
        # Pinned pair capacity disables the adaptive ladder: ONE compiled
        # program for a whole run (long runs trade a little padding for
        # zero mid-run recompiles through the remote compile service).
        self._pin_pair_capacity = pin_pair_capacity
        self.pair_capacity: Optional[int] = pin_pair_capacity
        if mesh is not None:
            from ..parallel import integrate as par  # noqa: PLC0415
            self.state, self.opt_state = par.interleave_rows(
                self.state, self.opt_state, self.n_gauss)
            self.state, self.opt_state = par.place_sharded(
                self.state, self.opt_state, mesh)
            # Mixed-resolution/intrinsics scenes: all cameras padded onto
            # one static canvas (true dims/fovs moved to traced leaves) so
            # every DP batch compiles to the same program.
            keys = {(c.height, c.width, c.fovx, c.fovy)
                    for c in scene.train_cameras}
            self._batch_hw = ((max(c.height for c in scene.train_cameras),
                               max(c.width for c in scene.train_cameras))
                              if len(keys) > 1 else None)
        self.fns = self._make_fns(pair_capacity=self.pair_capacity)
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if model_cfg.white_background else [0.0, 0.0, 0.0])
        self.iteration = 0
        self._camera_stack: List[Camera] = []
        self.ema_loss = 0.0
        self.history: List[dict] = []
        self._gt_logged = False

        self.logger = MetricsLogger(model_cfg.model_path)
        if model_cfg.model_path:
            save_cfg_args(model_cfg.model_path, model_cfg)

        # One (6,) device vector per step; fetched in stacked batches.
        self._pack_metrics = jax.jit(lambda m: jnp.stack([
            m["loss"].astype(jnp.float32), m["l1"].astype(jnp.float32),
            m["n_active"].astype(jnp.float32),
            m.get("num_pairs", jnp.int32(0)).astype(jnp.float32),
            m.get("overflow", jnp.int32(0)).astype(jnp.float32),
            m.get("skipped", jnp.int32(0)).astype(jnp.float32)]))
        # Consecutive dropped-update guard: a run silently free-wheeling on
        # persistent overflow / NaN (old params kept every step) must not
        # burn hours looking healthy. After `max_consecutive_skips` the
        # trainer grows the pair capacity (overflow cause) or aborts.
        self.consecutive_skips = 0
        self.total_skips = 0
        self.max_consecutive_skips = 25

    def _make_fns(self, pair_capacity: Optional[int] = None):
        if self.mesh is not None:
            from ..parallel import integrate as par  # noqa: PLC0415
            return par.make_sharded_fns(
                self.opt_cfg, self.pipe_cfg, self.mesh,
                use_trained_exp=self.model_cfg.train_test_exp,
                tile_shard=self.tile_shard, pair_capacity=pair_capacity)
        return step_lib.make_train_step(
            self.opt_cfg, self.pipe_cfg,
            use_trained_exp=self.model_cfg.train_test_exp,
            pair_capacity=pair_capacity)

    # ------------------------------------------------------------- loop
    def pick_camera(self) -> Camera:
        """Random pop from a reshuffled stack (`train.py:129-135`)."""
        if not self._camera_stack:
            self._camera_stack = list(self.scene.train_cameras)
            self.rng.shuffle(self._camera_stack)
        return self._camera_stack.pop()

    def pick_camera_batch(self) -> Camera:
        """n_data cameras stacked for the DP step (padded when mixed-res)."""
        from ..parallel import step as pstep  # noqa: PLC0415
        cams = [self.pick_camera() for _ in range(self.n_data)]
        if self._batch_hw is not None:
            return pstep.pad_camera_batch(cams, target_hw=self._batch_hw)
        return pstep.stack_cameras(cams)

    def restore(self, path: str) -> None:
        self.state, self.opt_state, self.iteration = ckpt.load_checkpoint(path)
        if self.mesh is not None:
            from ..parallel import integrate as par  # noqa: PLC0415
            if self.n_gauss > 1:
                # The checkpoint may come from an UNSHARDED run (active rows
                # packed at the front — sharding that naively starves every
                # shard but the first) or from a sharded run with arbitrary
                # densify holes. Compact-then-interleave balances actives
                # across shards exactly in both cases; row order is
                # loss-irrelevant (the pair pipeline depth-sorts).
                self.state, self.opt_state = par.pad_capacity_to_multiple(
                    self.state, self.opt_state, self.n_gauss)
                self.state, self.opt_state = par.compact_rows(
                    self.state, self.opt_state)
                self.state, self.opt_state = par.interleave_rows(
                    self.state, self.opt_state, self.n_gauss)
            self.state, self.opt_state = par.place_sharded(
                self.state, self.opt_state, self.mesh)
        print(f"Restored checkpoint at iteration {self.iteration}")

    def train(self, iterations: Optional[int] = None,
              test_iterations=(7000, 30000), save_iterations=(7000, 30000),
              checkpoint_iterations=(), on_iteration=None) -> dict:
        opt = self.opt_cfg
        total = iterations if iterations is not None else opt.iterations
        t_start = time.time()
        first = self.iteration + 1
        test_iterations = set(test_iterations)
        save_iterations = set(save_iterations)
        checkpoint_iterations = set(checkpoint_iterations)
        pending = []  # (iteration, device-metrics) awaiting host pull
        for it in range(first, total + 1):
            self.iteration = it
            # SH degree bump every 1000 iters (`train.py:126-127`).
            if it % 1000 == 0:
                self.state = self.state.oneup_sh_degree()

            cam = (self.pick_camera_batch() if self.mesh is not None
                   else self.pick_camera())
            self.key, k = jax.random.split(self.key)
            self.state, self.opt_state, metrics = self.fns.step(
                self.state, self.opt_state, cam, jnp.asarray(it), k, self.bg)

            # Densification schedule (`train.py:311-326`).
            if it < opt.densify_until_iter:
                if (it > opt.densify_from_iter
                        and it % opt.densification_interval == 0):
                    self.key, k = jax.random.split(self.key)
                    use_size = it > opt.opacity_reset_interval
                    self.state, self.opt_state, info = self.fns.densify(
                        self.state, self.opt_state, k,
                        use_size_threshold=use_size)
                    if self.mesh is not None:
                        from ..parallel import integrate as par  # noqa: PLC0415
                        self.state, self.opt_state, grew = par.grow_sharded(
                            self.state, self.opt_state, self.mesh)
                    else:
                        self.state, self.opt_state, grew = ckpt.maybe_grow(
                            self.state, self.opt_state)
                    if grew and not self.quiet:
                        print(f"[it {it}] capacity grown to "
                              f"{self.state.capacity}")
                if (it % opt.opacity_reset_interval == 0
                        or (self.model_cfg.white_background
                            and it == opt.densify_from_iter)):
                    self.state, self.opt_state = self.fns.reset_opacity(
                        self.state, self.opt_state)

            # PriorDepth thesis events (train.py:193-291).
            if opt.noise_injection_iter and it == opt.noise_injection_iter:
                self.inject_noise()
                self._replace_sharded()
            if opt.floating_prune_iter and it == opt.floating_prune_iter:
                self.run_floating_prune()
                self._replace_sharded()

            # Defer materialising device metrics: every host fetch through
            # the TPU tunnel costs a ~30 ms round trip, so per-step (or even
            # per-scalar) pulls dominate small-scene training. Metrics batch
            # up as device (5,)-vectors and are pulled every 50 iterations
            # as ONE stacked transfer; steps in between stay queued.
            pending.append((it, self._pack_metrics(metrics)))
            if (it % 50 == 0 or it >= total or it in test_iterations
                    or it in save_iterations or it in checkpoint_iterations):
                rows = np.asarray(jnp.stack([v for _, v in pending]))
                for (jt, _), row in zip(pending, rows):
                    loss, l1, n_active, num_pairs, overflow, skipped = (
                        float(row[0]), float(row[1]), int(row[2]),
                        int(row[3]), int(row[4]), int(row[5]))
                    self._observe_skip(jt, skipped, overflow, loss)
                    if np.isfinite(loss):
                        self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
                    else:
                        # A non-finite frame loss (e.g. SSIM blowup on a
                        # degenerate early frame) must not poison the EMA
                        # forever; the optimizer step guards itself (the
                        # update is skipped on overflow or non-finite
                        # loss, keeping old params).
                        self.nonfinite_losses = getattr(
                            self, "nonfinite_losses", 0) + 1
                        if self.nonfinite_losses <= 3 and not self.quiet:
                            print(f"[it {jt}] WARNING: non-finite loss "
                                  f"{loss}; excluded from EMA "
                                  f"({self.nonfinite_losses} so far)",
                                  flush=True)
                    if jt % 100 == 0:
                        self._adapt_pair_capacity(num_pairs, overflow)
                    if jt % 10 == 0:
                        # Reference TB scalar names (train.py:402-445).
                        self.logger.scalars({
                            "train_loss_patches/l1_loss": l1,
                            "train_loss_patches/total_loss": loss,
                            "total_points": n_active,
                            "iter_time": time.time() - t_start,
                            "skipped": skipped,
                        }, jt)
                    if not self.quiet and jt % 100 == 0:
                        print(f"[it {jt}/{total}] loss {self.ema_loss:.5f} "
                              f"gaussians {n_active} "
                              f"({(time.time() - t_start):.1f}s)", flush=True)
                pending.clear()

            if it in test_iterations:
                self.report(it)
            if it in save_iterations and self.model_cfg.model_path:
                self.save_snapshot(it)
            if it in checkpoint_iterations and self.model_cfg.model_path:
                ckpt.save_checkpoint(
                    os.path.join(self.model_cfg.model_path,
                                 f"chkpnt{it}.pkl"),
                    self.state, self.opt_state, it,
                    compact=getattr(self, "checkpoint_compact", False))
            if on_iteration is not None:
                on_iteration(self, it, metrics)
        wall = time.time() - t_start
        return {"iterations": total, "wall_s": wall,
                "final_loss": self.ema_loss,
                "n_active": int(self.state.num_active)}

    def _adapt_pair_capacity(self, num_pairs: int, overflow: int) -> None:
        """Size the rasterizer's static pair list from observed pair counts.

        Every pair-sized op (tile sort, expansion scans, attribute gathers,
        kernel sweeps) scales with this capacity, so tracking the scene's
        real (Gaussian, tile) pair count — the CUDA rasterizer allocates it
        exactly per frame — is a direct throughput win. 1.5× headroom
        absorbs view-to-view variance; ladder rounding (round_capacity)
        bounds recompiles. Overflow (dropped pairs this view) forces growth.
        """
        from ..ops import rasterize_pallas as rp  # noqa: PLC0415
        if self._pin_pair_capacity is not None:
            if overflow > 0 and not self.quiet:
                print(f"[it {self.iteration}] WARNING: pair overflow "
                      f"{overflow} with pinned capacity "
                      f"{self._pin_pair_capacity} — step skipped; raise "
                      "--pin_pair_capacity", flush=True)
            return
        effective = (self.pair_capacity
                     or rp.default_pair_capacity(self.state.capacity))
        desired = rp.round_capacity(int((num_pairs + overflow) * 1.5))
        if overflow > 0:
            desired = max(desired, rp.round_capacity(effective + 1))
        if desired < effective and (num_pairs + overflow) * 2.0 > effective:
            return  # hysteresis: don't flap one rung down on view variance
        if desired != effective:
            self.pair_capacity = desired
            self.fns = self._make_fns(pair_capacity=desired)
            if not self.quiet:
                print(f"[it {self.iteration}] pair capacity -> {desired} "
                      f"(pairs {num_pairs}, overflow {overflow})",
                      flush=True)

    def _observe_skip(self, it: int, skipped: int, overflow: int,
                      loss: float) -> None:
        """React to dropped updates (train/step.py `ok` gate).

        The reference CUDA path never drops a frame
        (`gaussian_renderer/__init__.py:90-112` always returns gradients);
        our static-capacity design can, so skips must be loud and bounded:
        a persistent overflow grows the (possibly pinned) pair capacity one
        ladder rung; anything else aborts after `max_consecutive_skips`
        consecutive drops instead of free-wheeling for hours.
        """
        if not skipped:
            self.consecutive_skips = 0
            return
        self.consecutive_skips += 1
        self.total_skips += 1
        if self.total_skips <= 5 or self.consecutive_skips in (5, 10, 20):
            cause = ("pair overflow" if overflow > 0
                     else f"non-finite loss ({loss})")
            print(f"[it {it}] WARNING: update skipped ({cause}); "
                  f"{self.consecutive_skips} consecutive, "
                  f"{self.total_skips} total", flush=True)
        if self.consecutive_skips < self.max_consecutive_skips:
            return
        if overflow > 0:
            from ..ops import rasterize_pallas as rp  # noqa: PLC0415
            effective = (self.pair_capacity
                         or rp.default_pair_capacity(self.state.capacity))
            grown = rp.round_capacity(effective + 1)
            print(f"[it {it}] pair capacity auto-grown {effective} -> "
                  f"{grown} after {self.consecutive_skips} consecutive "
                  "overflow skips", flush=True)
            if self._pin_pair_capacity is not None:
                self._pin_pair_capacity = grown
            self.pair_capacity = grown
            self.fns = self._make_fns(pair_capacity=grown)
            self.consecutive_skips = 0
            return
        raise RuntimeError(
            f"[it {it}] {self.consecutive_skips} consecutive updates "
            f"dropped on non-finite loss ({loss}) — the run is not "
            "training; aborting instead of free-wheeling. Inspect with "
            "--detect_anomaly / --debug_from.")

    def _replace_sharded(self) -> None:
        """Re-apply the mesh shardings after a host-side state rebuild."""
        if self.mesh is not None:
            from ..parallel import integrate as par  # noqa: PLC0415
            self.state, self.opt_state = par.place_sharded(
                self.state, self.opt_state, self.mesh)

    def _unshard(self) -> None:
        """Pull the training state onto the default device (host round
        trip). The thesis events (noise injection, floating-prune loop) and
        the GUI render path run per-view jitted functions that are written
        for unsharded state; gathering once up front is cheap at event
        frequency (twice per run) and avoids relying on implicit GSPMD
        resharding of every per-view call. `_replace_sharded` restores the
        mesh placement afterwards."""
        if self.mesh is not None:
            pull = lambda x: jnp.asarray(np.asarray(x))
            self.state = jax.tree.map(pull, self.state)
            self.opt_state = jax.tree.map(pull, self.opt_state)

    # ------------------------------------------------------------- eval
    def report(self, it: int) -> dict:
        """Validation PSNR on held-out (or train-subset) views
        (`train.py:402-445`)."""
        out = {}
        for split, cams in (("test", self.scene.test_cameras),
                            ("train", self.scene.train_cameras[:5])):
            if not cams:
                continue
            psnrs, l1s = [], []
            for vi, cam in enumerate(cams):
                r = step_lib.eval_image(
                    cam, self.state, self.bg,
                    antialiasing=self.pipe_cfg.antialiasing,
                    use_trained_exp=self.model_cfg.train_test_exp,
                    backend=self.pipe_cfg.backend)
                # First-5-views image logging (`train.py:421-427`): render
                # every eval, ground truth once (the reference gates GT on
                # iteration == testing_iterations[0]).
                if vi < 5:
                    name = getattr(cam, "image_name", None) or f"view_{vi}"
                    # Clamp to [0,1]; with train_test_exp only the right
                    # half is evaluated/logged (reference train.py:422-432).
                    def _prep(img):
                        img = jnp.clip(img, 0.0, 1.0)
                        if self.model_cfg.train_test_exp:
                            img = img[..., img.shape[-1] // 2:]
                        return img
                    self.logger.image(
                        f"{split}_view_{name}/render", _prep(r["render"]), it)
                    if cam.image is not None and not self._gt_logged:
                        self.logger.image(
                            f"{split}_view_{name}/ground_truth",
                            _prep(cam.image), it)
                if "psnr" in r:
                    psnrs.append(float(r["psnr"]))
                    l1s.append(float(r["l1"]))
                ov = r.get("overflow")
                if ov is not None and int(ov) > 0 and not self.quiet:
                    print(f"[it {it}] WARNING: eval view {vi} overflowed "
                          f"the pair capacity by {int(ov)} — its PSNR "
                          "reads low", flush=True)
            if psnrs:
                out[split] = {"psnr": float(np.mean(psnrs)),
                              "l1": float(np.mean(l1s))}
                self.logger.scalar(f"{split}/loss_viewpoint - psnr",
                                   out[split]["psnr"], it)
                self.logger.scalar(f"{split}/loss_viewpoint - l1_loss",
                                   out[split]["l1"], it)
                if not self.quiet:
                    print(f"[it {it}] eval {split}: "
                          f"psnr {out[split]['psnr']:.2f} "
                          f"l1 {out[split]['l1']:.4f}", flush=True)
        self._gt_logged = True
        # Opacity histogram + point count (`train.py:439-442`).
        active = np.asarray(self.state.active)
        opacity = np.asarray(self.state.get_opacity())[active]
        self.logger.histogram("scene/opacity_histogram", opacity, it)
        self.logger.scalar("total_points", float(active.sum()), it)
        self.history.append({"iteration": it, **out})
        return out

    def inject_noise(self) -> None:
        """Iteration-30000 robustness experiment: plant floating Gaussians
        (`train.py:193-221`; see train/prune.inject_noise_gaussians)."""
        from . import prune as prune_lib  # noqa: PLC0415
        self._unshard()
        self.key, k = jax.random.split(self.key)
        self.state, self.opt_state, _ = prune_lib.inject_noise_gaussians(
            self.state, self.opt_state, k, self.scene.cameras_extent)
        if not self.quiet:
            print(f"[it {self.iteration}] injected noise gaussians "
                  f"(n_active={int(self.state.num_active)})", flush=True)

    def run_floating_prune(self) -> None:
        """Iteration-40000 depth-prior floating-object prune loop
        (`train.py:224-291`)."""
        from ..ops.render import render as render_fn  # noqa: PLC0415
        from . import prune as prune_lib  # noqa: PLC0415
        self._unshard()

        def rfn(cam, state):
            out = render_fn(cam, state, self.bg,
                            antialiasing=self.pipe_cfg.antialiasing,
                            backend=self.pipe_cfg.backend)
            return out["invdepth"], out["radii"]

        self.state, self.opt_state, info = prune_lib.prune_loop(
            self.state, self.opt_state, self.scene.train_cameras, rfn,
            self.scene.cameras_extent,
            rng=np.random.RandomState(self.rng.randint(0, 2 ** 31)))
        if not self.quiet:
            print(f"[it {self.iteration}] floating-object prune: "
                  f"deleted {info['total_deleted']} over "
                  f"{info['epochs']} views", flush=True)

    def save_snapshot(self, it: int) -> None:
        print(f"[it {it}] saving snapshot", flush=True)
        ckpt.save_model_snapshot(self.model_cfg.model_path, it, self.state,
                                 image_names=self.scene.exposure_ids)
