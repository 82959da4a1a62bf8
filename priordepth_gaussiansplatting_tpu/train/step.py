"""The jitted training step: render → loss → backward → Adam → densify stats.

Functional equivalent of one iteration of the reference `train.py:100-342` hot
loop, fused into a single XLA program per camera resolution. The screen-space
densification gradient is harvested by differentiating w.r.t. a zeros-valued
`screen_offset` added to the projected 2D means (see ops/render.py), replacing
the reference's retain_grad dummy tensor.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from ..core.schedules import expon_lr
from ..models import densify as densify_ops
from ..models.gaussians import GaussianState
from ..ops import losses
from ..ops.render import render
from ..utils.config import OptimizationConfig, PipelineConfig
from . import optim


def depth_l1_weight(step, cfg: OptimizationConfig):
    """1.0 → 0.01 log-linear over the run (`arguments/__init__.py:96-97`)."""
    return expon_lr(step, cfg.depth_l1_weight_init, cfg.depth_l1_weight_final,
                    max_steps=cfg.iterations)


def learning_rates(step, cfg: OptimizationConfig,
                   spatial_lr_scale: float) -> optim.LearningRates:
    """Per-group LRs at `step` (`gaussian_model.py:180-226`)."""
    xyz = expon_lr(step,
                   cfg.position_lr_init * spatial_lr_scale,
                   cfg.position_lr_final * spatial_lr_scale,
                   lr_delay_mult=cfg.position_lr_delay_mult,
                   max_steps=cfg.position_lr_max_steps)
    exposure = expon_lr(step, cfg.exposure_lr_init, cfg.exposure_lr_final,
                        lr_delay_steps=cfg.exposure_lr_delay_steps,
                        lr_delay_mult=cfg.exposure_lr_delay_mult,
                        max_steps=cfg.iterations)
    as_arr = lambda v: jnp.asarray(v, dtype=jnp.float32)
    return optim.LearningRates(
        xyz=xyz,
        features_dc=as_arr(cfg.feature_lr),
        features_rest=as_arr(cfg.feature_lr / 20.0),
        scaling=as_arr(cfg.scaling_lr),
        rotation=as_arr(cfg.rotation_lr),
        opacity=as_arr(cfg.opacity_lr),
        exposure=exposure,
    )


@dataclasses.dataclass(frozen=True)
class TrainStepFns:
    """Bundled jitted functions for one (opt_cfg, pipe_cfg) setting."""

    step: callable
    densify: callable
    reset_opacity: callable


def make_train_step(opt_cfg: OptimizationConfig, pipe_cfg: PipelineConfig,
                    use_trained_exp: bool = False,
                    pair_capacity: Optional[int] = None):
    """Build the jitted train step closed over static hyperparameters.

    `pair_capacity` pins the rasterizer's static (Gaussian, tile) pair-list
    size; the trainer adapts it from observed pair counts (metrics carry
    `num_pairs`/`overflow`) and rebuilds the step on ladder changes — every
    pair-sized op scales with it, so a tight value is a direct win."""
    sparse = opt_cfg.optimizer_type == "sparse_adam"
    backend = pipe_cfg.backend

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(state: GaussianState, opt_state: optim.AdamState,
                   camera: Camera, step: jnp.ndarray, key: jax.Array,
                   bg_color: jnp.ndarray):
        kb, ks = jax.random.split(key)
        if opt_cfg.random_background:
            bg = jax.random.uniform(kb, (3,))
        else:
            bg = bg_color

        screen_offset = jnp.zeros((state.capacity, 2), dtype=jnp.float32)

        def loss_fn(params, screen_offset):
            st = state.replace(params=params)
            out = render(camera, st, bg,
                         antialiasing=pipe_cfg.antialiasing,
                         use_trained_exp=use_trained_exp,
                         screen_offset=screen_offset,
                         backend=backend,
                         pair_capacity=pair_capacity)
            image = out["render"]
            gt = camera.image
            if camera.alpha_mask is not None:
                image = image * camera.alpha_mask[None]
            ll1 = losses.l1_loss(image, gt)
            ssim_v = losses.ssim(image, gt)
            loss = ((1.0 - opt_cfg.lambda_dssim) * ll1
                    + opt_cfg.lambda_dssim * (1.0 - ssim_v))
            dloss = jnp.zeros(())
            if opt_cfg.depth_feedback and camera.invdepth is not None:
                w = depth_l1_weight(step, opt_cfg)
                mask = (camera.depth_mask if camera.depth_mask is not None
                        else jnp.ones_like(camera.invdepth))
                dloss = w * losses.depth_l1_loss(
                    out["invdepth"][0], camera.invdepth, mask)
                loss = loss + dloss
            aux = {"radii": out["radii"], "l1": ll1, "ssim": ssim_v,
                   "depth_loss": dloss, "image": image}
            if out.get("num_pairs") is not None:
                aux["num_pairs"] = jax.lax.stop_gradient(out["num_pairs"])
                aux["overflow"] = jax.lax.stop_gradient(out["overflow"])
            return loss, aux

        (loss, aux), (param_grads, screen_grads) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(state.params, screen_offset)

        radii = aux["radii"]
        visibility = radii > 0
        lrs = learning_rates(step, opt_cfg, state.spatial_lr_scale)
        new_params, new_opt = optim.adam_update(
            state.params, param_grads, opt_state, lrs,
            visibility=visibility, sparse=sparse)
        # Pair overflow means the rendered frame was missing pairs and the
        # gradient is wrong: skip the whole update (the trainer grows the
        # capacity for future frames from the overflow metric). A
        # non-finite loss (degenerate frame) is equally untrustworthy —
        # skipping it keeps one bad frame from NaN-poisoning the params.
        ok = aux.get("overflow")
        ok = jnp.bool_(True) if ok is None else (ok == 0)
        ok = ok & jnp.isfinite(loss)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old)
        state = state.replace(params=keep(new_params, state.params))
        opt_state = keep(new_opt, opt_state)
        stats_state = densify_ops.add_densification_stats(
            state, screen_grads, radii, camera.width, camera.height)
        state = keep(stats_state, state)
        metrics = {
            "loss": loss, "l1": aux["l1"], "ssim": aux["ssim"],
            "depth_loss": aux["depth_loss"],
            "n_visible": jnp.sum(visibility.astype(jnp.int32)),
            "n_active": state.num_active,
            # Dropped updates must be observable per-iteration: a silent
            # free-wheel (every step skipped on persistent overflow) looks
            # exactly like a healthy-but-flat loss curve otherwise (the
            # round-4 proof pathology). The trainer counts consecutive
            # skips and grows capacity / aborts loudly.
            "skipped": (~ok).astype(jnp.int32),
        }
        if "num_pairs" in aux:
            metrics["num_pairs"] = aux["num_pairs"]
            metrics["overflow"] = aux["overflow"]
        return state, opt_state, metrics

    def densify(state, opt_state, key, use_size_threshold: bool = False):
        # size_threshold=20px only after the first opacity reset
        # (`train.py:318-321`: `if iteration > opt.opacity_reset_interval`).
        max_screen = 20.0 if use_size_threshold else 0.0
        return densify_ops.densify_and_prune(
            state, opt_state, key,
            opt_cfg.densify_grad_threshold, 0.005,
            state.spatial_lr_scale, max_screen,
            percent_dense=opt_cfg.percent_dense)

    return TrainStepFns(step=train_step, densify=densify,
                        reset_opacity=densify_ops.reset_opacity)


@partial(jax.jit,
         static_argnames=("antialiasing", "use_trained_exp", "backend",
                          "pair_capacity"))
def _eval_render(camera: Camera, state: GaussianState, bg: jnp.ndarray,
                 antialiasing: bool, use_trained_exp: bool, backend: str,
                 pair_capacity: Optional[int]):
    out = render(camera, state, bg, antialiasing=antialiasing,
                 use_trained_exp=use_trained_exp, backend=backend,
                 pair_capacity=pair_capacity)
    img = out["render"]
    res = {"render": img}
    if out.get("overflow") is not None:
        # Surfaced so eval callers can warn: an overflowed render is
        # missing pairs and its PSNR silently wrong otherwise.
        res["overflow"] = out["overflow"]
    if camera.image is not None:
        res["psnr"] = losses.psnr(img, camera.image)
        res["l1"] = losses.l1_loss(img, camera.image)
    return res


def eval_image(camera: Camera, state: GaussianState, bg: jnp.ndarray,
               antialiasing: bool = False, use_trained_exp: bool = False,
               backend: str = "auto", pair_capacity: Optional[int] = None):
    """No-grad render + PSNR/L1 for validation (`train.py:402-445`).

    Jitted and cached per (resolution, capacity): per-camera aux metadata
    (name/uid/reliability) is neutralised first so a full test-set sweep
    compiles ONCE instead of per view — an eager render costs a host↔TPU
    round trip per op, which made full-set evals crawl. The per-view
    exposure index (static on Camera) is routed through the TRACED
    `exposure_idx` leaf for the same reason: with train_test_exp sets each
    view has a distinct exposure row, which would otherwise defeat the
    compile-once goal."""
    exposure_idx = camera.exposure_idx
    if (use_trained_exp and exposure_idx is None
            and camera.exposure_id >= 0):
        exposure_idx = jnp.asarray(camera.exposure_id, jnp.int32)
    cam = dataclasses.replace(camera, image_name="", uid=0,
                              depth_reliable=False, exposure_id=-1,
                              exposure_idx=exposure_idx)
    return _eval_render(cam, state, bg, antialiasing, use_trained_exp,
                        backend, pair_capacity)
