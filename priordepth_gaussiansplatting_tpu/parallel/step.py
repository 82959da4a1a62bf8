"""shard_map'd multi-chip training step: camera-DP × Gaussian sharding.

Dataflow per step (see parallel/mesh.py for the axes):
  1. every (data, gauss) rank projects ITS Gaussian shard for ITS camera(s)
     (embarrassingly parallel preprocess, local radii/visibility);
  2. `all_gather` of the projected screen-space attributes over `gauss`
     (the only per-step collective on the forward path — rides ICI);
  3. each data rank rasterizes its camera(s) with the full projected set and
     computes the loss; backward through the gather reduces per-pair
     gradients back to the local Gaussian shard automatically;
  4. gradients are `psum`'d over `data`; Adam updates the local shard;
     densification stats accumulate shard-locally (also psum'd over `data`).

Densify/prune (models/densify.py) runs shard-locally outside this step —
each shard manages its own free slots, the sharded analog of the reference's
global reallocation.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..core.cameras import Camera
from ..models import densify as densify_ops
from ..models.gaussians import GaussianState
from ..ops import losses
from ..ops import projection as proj_ops
from ..ops import reference as ref_ops
from ..train import optim
from ..train.step import learning_rates
from ..utils.config import OptimizationConfig, PipelineConfig
from . import mesh as mesh_lib


def _rasterize_tile_sharded(proj_full, bg, width: int, height: int,
                            n_shards: int, axis_name: str,
                            pair_capacity: int | None = None,
                            valid_capacity: int | None = None):
    """SP-analog path: every rank composites a BAND of the tile grid; bands
    are all-gathered into the image. The band VJP zeroes non-owned pair
    lanes, so the psum the gather VJP inserts over `axis_name` sums exact
    per-band contributions (SURVEY.md §5.7 north star).

    Runs the FUSED binning (ops/binning.bin_sorted_pairs — one depth sort
    carrying attributes, exact ellipse-tile culling, one tile sort) exactly
    like the single-chip path; only the composite sweep is band-sharded.
    Overflow counters are surfaced so the sharded trainer can adapt the
    pair capacities the same way the single-chip one does."""
    from ..ops import binning as binning_lib  # noqa: PLC0415
    from ..ops import rasterize_pallas as rp  # noqa: PLC0415

    n = proj_full.mean2d.shape[0]
    if pair_capacity is None:
        pair_capacity = rp.default_pair_capacity(n)
    if valid_capacity is None:
        valid_capacity = pair_capacity
    sorted_attrs, aux = binning_lib.bin_sorted_pairs(
        proj_full, width, height, pair_capacity, valid_capacity)

    grid_x, grid_y = binning_lib.grid_shape(width, height)
    nt = grid_x * grid_y
    band = -(-nt // n_shards)
    pad = band * n_shards - nt
    tile_ids = jnp.pad(jnp.arange(nt, dtype=jnp.int32), (0, pad))
    # padded tiles: empty ranges -> zero output, dropped at assembly.
    starts = jnp.pad(aux["tile_start"], (0, pad), constant_values=0)
    ends = jnp.pad(aux["tile_end"], (0, pad), constant_values=0)
    m = jax.lax.axis_index(axis_name)
    my_ids = jax.lax.dynamic_slice(tile_ids, (m * band,), (band,))
    my_start = jax.lax.dynamic_slice(starts, (m * band,), (band,))
    my_end = jax.lax.dynamic_slice(ends, (m * band,), (band,))

    color_b, invd_b, t_b = rp.composite_bands(
        sorted_attrs, my_ids, my_start, my_end, width, height)
    gather = lambda x: jax.lax.all_gather(x, axis_name, axis=0, tiled=True)
    color = rp.tiles_to_image(gather(color_b)[:nt], width, height)
    invd = rp.tiles_to_image(gather(invd_b)[:nt], width, height)
    t_fin = rp.tiles_to_image(gather(t_b)[:nt], width, height)
    image = color + t_fin * bg[:, None, None]
    return {"render": image, "invdepth": invd, "final_T": t_fin[0],
            "overflow": aux["overflow_rect"] + aux["overflow_valid"],
            "num_pairs": aux["num_valid"]}


def _render_gathered(camera: Camera, state: GaussianState, bg, screen_offset,
                     pipe_cfg: PipelineConfig, axis_name: str,
                     tile_shard_n: int = 0,
                     pair_capacity: int | None = None,
                     valid_capacity: int | None = None):
    """Project the local shard, all-gather screen-space attrs, rasterize.

    With `tile_shard_n` > 0 the compositing work is ALSO sharded over the
    same axis (each rank renders a tile band)."""
    cov3d = state.get_covariance()
    if camera.tan_wh is not None:
        tanx, tany = camera.tan_wh[0], camera.tan_wh[1]
        map_w, map_h = camera.pix_wh[0], camera.pix_wh[1]
    else:
        tanx, tany = camera.tan_fovx, camera.tan_fovy
        map_w = map_h = None
    proj = proj_ops.project_gaussians(
        state.params.xyz, cov3d, state.get_opacity(), state.get_features(),
        state.max_sh_degree, camera.world_view, camera.full_proj,
        camera.cam_center, camera.width, camera.height,
        tanx, tany, map_width=map_w, map_height=map_h,
        antialiasing=pipe_cfg.antialiasing, valid_mask=state.active)
    local_radii = proj.radius
    proj = dataclasses.replace(proj, mean2d=proj.mean2d + screen_offset)
    proj_full = jax.tree.map(
        lambda x: jax.lax.all_gather(x, axis_name, axis=0, tiled=True), proj)
    use_pallas = pipe_cfg.backend == "pallas"
    if pipe_cfg.backend == "auto":
        use_pallas = jax.default_backend() == "tpu"
    if tile_shard_n > 1 and use_pallas:
        out = _rasterize_tile_sharded(proj_full, bg, camera.width,
                                      camera.height, tile_shard_n,
                                      axis_name,
                                      pair_capacity=pair_capacity,
                                      valid_capacity=valid_capacity)
    elif use_pallas:
        from ..ops import rasterize_pallas as rp  # noqa: PLC0415
        out = rp.rasterize(proj_full, bg, camera.width, camera.height,
                           pair_capacity=pair_capacity,
                           valid_capacity=valid_capacity)
    else:
        out = ref_ops.rasterize_reference(proj_full, bg, camera.width,
                                          camera.height)
    return out, local_radii


def make_sharded_train_step(opt_cfg: OptimizationConfig,
                            pipe_cfg: PipelineConfig, mesh,
                            use_trained_exp: bool = False,
                            tile_shard: bool = False,
                            pair_capacity: int | None = None,
                            valid_capacity: int | None = None):
    """Returns a jitted step(state, opt_state, cam_batch, step, key, bg).

    `cam_batch` is a Camera pytree with a leading batch axis equal to the
    `data` axis size; state/opt are sharded per mesh.state_spec(). With
    `tile_shard`, the gauss axis also shards the tile-compositing work
    (each rank renders a band of the image). `pair_capacity` /
    `valid_capacity` pin the rasterizer's static pair lists (the sharded
    trainer adapts them from the returned num_pairs/overflow metrics,
    exactly like the single-chip trainer). On any rank's pair overflow the
    whole optimizer/densify-stat update is skipped — a frame missing pairs
    produces a wrong gradient; capacity grows for future steps instead.
    """
    sparse = opt_cfg.optimizer_type == "sparse_adam"
    n_gauss = int(mesh.shape[mesh_lib.GAUSS_AXIS])
    tile_shard_n = n_gauss if tile_shard else 0

    def local_step(state, opt_state, cam_batch, step_i, key, bg):
        # One camera per data rank (leading axis sliced to 1 by shard_map).
        camera = jax.tree.map(lambda x: x[0], cam_batch)
        n_local = state.capacity  # local shard capacity
        screen_offset = jnp.zeros((n_local, 2), jnp.float32)

        def loss_fn(params, screen_offset):
            st = dataclasses.replace(state, params=params)
            out, local_radii = _render_gathered(
                camera, st, bg, screen_offset, pipe_cfg,
                mesh_lib.GAUSS_AXIS, tile_shard_n=tile_shard_n,
                pair_capacity=pair_capacity,
                valid_capacity=valid_capacity)
            image = out["render"]
            if use_trained_exp and camera.exposure_id >= 0:
                eid = (camera.exposure_idx if camera.exposure_idx is not None
                       else camera.exposure_id)
                exposure = st.get_exposure(eid)
                image = jnp.einsum("ij,jhw->ihw", exposure[:3, :3], image) \
                    + exposure[:3, 3][:, None, None]
            image = jnp.clip(image, 0.0, 1.0)
            gt = camera.image
            if camera.alpha_mask is not None:
                image = image * camera.alpha_mask[None]
            if camera.pix_wh is not None:
                # Zero-padded mixed-resolution camera: losses masked to the
                # true image region and normalised by its pixel count — the
                # SSIM convolution is zero-"same"-padded, so this reproduces
                # the native-resolution loss exactly.
                from ..ops.ssim import ssim_map  # noqa: PLC0415
                mask = camera.alpha_mask[None]
                nval = 3.0 * camera.pix_wh[0] * camera.pix_wh[1]
                ll1 = jnp.sum(jnp.abs(image - gt) * mask) / nval
                ssim_v = jnp.sum(ssim_map(image, gt) * mask) / nval
            else:
                ll1 = losses.l1_loss(image, gt)
                ssim_v = losses.ssim(image, gt)
            loss = ((1.0 - opt_cfg.lambda_dssim) * ll1
                    + opt_cfg.lambda_dssim * (1.0 - ssim_v))
            if opt_cfg.depth_feedback and camera.invdepth is not None:
                from ..train.step import depth_l1_weight  # noqa: PLC0415
                w = depth_l1_weight(step_i, opt_cfg)
                mask = (camera.depth_mask if camera.depth_mask is not None
                        else jnp.ones_like(camera.invdepth))
                loss = loss + w * losses.depth_l1_loss(
                    out["invdepth"][0], camera.invdepth, mask)
            # The loss is computed (identically) on every gauss rank, and
            # the all_gather transpose SUMS the n_gauss per-rank cotangent
            # copies. Dividing the per-rank loss by n_gauss (a plain static
            # scale — collectives don't transpose the way you'd hope under
            # shard_map) makes that sum come out to exactly 1x.
            loss = loss / n_gauss
            overflow = out.get("overflow")
            num_pairs = out.get("num_pairs")
            if overflow is None:
                overflow = jnp.int32(0)
            if num_pairs is None:
                num_pairs = jnp.int32(0)
            return loss, (local_radii, ll1,
                          jax.lax.stop_gradient(overflow),
                          jax.lax.stop_gradient(num_pairs))

        (loss, (radii, ll1, overflow, num_pairs)), (pgrads, sgrads) = \
            jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    state.params, screen_offset)
        # Any data rank overflowing poisons the DP-averaged gradient.
        overflow = jax.lax.pmax(overflow, mesh_lib.DATA_AXIS)
        num_pairs = jax.lax.pmax(num_pairs, mesh_lib.DATA_AXIS)

        # Replicated (non-per-gaussian) leaves see only their rank's 1/n
        # share after the pmean: sum them over the gauss axis.
        pgrads = dataclasses.replace(
            pgrads, exposure=jax.lax.psum(pgrads.exposure,
                                          mesh_lib.GAUSS_AXIS))
        # Gradient all-reduce over the camera-DP axis (mean).
        nd = jax.lax.psum(1, mesh_lib.DATA_AXIS)
        pgrads = jax.tree.map(
            lambda g: jax.lax.psum(g, mesh_lib.DATA_AXIS) / nd, pgrads)
        sgrads = jax.lax.psum(sgrads, mesh_lib.DATA_AXIS) / nd

        visibility = jax.lax.pmax(
            (radii > 0).astype(jnp.int32), mesh_lib.DATA_AXIS) > 0
        lrs = learning_rates(step_i, opt_cfg, state.spatial_lr_scale)
        new_params, new_opt = optim.adam_update(
            state.params, pgrads, opt_state, lrs,
            visibility=visibility, sparse=sparse)
        # Overflow frames: discard the whole update (wrong gradient) —
        # capacity adaptation handles future frames. Non-finite loss
        # (degenerate frame) is equally untrustworthy (matches the
        # single-chip step); pmax makes the decision replicated.
        ok = (overflow == 0) & (jax.lax.pmin(
            jnp.isfinite(loss).astype(jnp.int32), mesh_lib.DATA_AXIS) > 0)
        keep = lambda new, old: jax.tree.map(
            lambda a, b: jnp.where(ok, a, b), new, old)
        new_params = keep(new_params, state.params)
        opt_state = keep(new_opt, opt_state)
        state = dataclasses.replace(state, params=new_params)
        max_radii = jax.lax.pmax(radii, mesh_lib.DATA_AXIS)
        stats_state = densify_ops.add_densification_stats(
            state, sgrads, max_radii, camera.width, camera.height)
        state = keep(stats_state, state)
        metrics = {
            # undo the 1/n_gauss grad-normalisation for reporting
            "loss": jax.lax.pmean(loss * n_gauss, mesh_lib.DATA_AXIS),
            "l1": jax.lax.pmean(ll1, mesh_lib.DATA_AXIS),
            "n_active": jax.lax.psum(state.num_active, mesh_lib.GAUSS_AXIS),
            "num_pairs": num_pairs,
            "overflow": overflow,
            # Per-iteration dropped-update flag (see train/step.py).
            "skipped": (~ok).astype(jnp.int32),
        }
        return state, opt_state, metrics

    ad_spec = mesh_lib.adam_spec()
    cam_spec_fn = lambda cam_batch: jax.tree.map(
        lambda _: P(mesh_lib.DATA_AXIS), cam_batch)

    def step(state, opt_state, cam_batch, step_i, key, bg):
        st_spec = mesh_lib.state_spec(state)
        sharded = shard_map(
            local_step, mesh=mesh,
            in_specs=(st_spec, ad_spec, cam_spec_fn(cam_batch), P(), P(),
                      P()),
            out_specs=(st_spec, ad_spec,
                       {"loss": P(), "l1": P(), "n_active": P(),
                        "num_pairs": P(), "overflow": P(),
                        "skipped": P()}),
            check_rep=False)
        return sharded(state, opt_state, cam_batch, step_i, key, bg)

    return jax.jit(step, donate_argnums=(0, 1))


def stack_cameras(cameras) -> Camera:
    """Stack a list of same-resolution Cameras into a leading batch axis.

    Per-camera STATIC aux fields that differ across the batch (exposure id,
    image name, uid, depth reliability) are unified: the exposure index
    moves into the traced `exposure_idx` leaf (one compiled program serves
    every batch), the rest take neutral values — they are only consumed by
    host-side code that operates on individual cameras."""
    ids = [c.exposure_id for c in cameras]
    all_exp = all(i >= 0 for i in ids)
    cameras = [dataclasses.replace(
        c,
        exposure_idx=jnp.asarray(max(i, 0), jnp.int32),
        exposure_id=(0 if all_exp else -1),
        image_name="", uid=0, depth_reliable=False)
        for c, i in zip(cameras, ids)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cameras)


def pad_camera_batch(cameras, target_hw: tuple[int, int] | None = None
                     ) -> Camera:
    """Stack cameras of HETEROGENEOUS resolutions/intrinsics for DP.

    Real COLMAP scenes routinely mix per-camera dimensions (the reference
    trains one camera at a time, `train.py:129-135`); DP needs one static
    program. Each camera is zero-padded onto the max (H, W) canvas, its true
    dims/intrinsics move into the TRACED `pix_wh`/`tan_wh` leaves (the
    static fov fields are zeroed so the aux data matches across the batch),
    and the valid region is folded into `alpha_mask`. The sharded step then
    maps pixels with the traced intrinsics and masks the losses to the true
    region — exactly reproducing each camera's native-resolution loss
    (the SSIM convolution is zero-"same"-padded)."""
    import numpy as np  # noqa: PLC0415

    if target_hw is not None:
        H, W = target_hw
    else:
        H = max(c.height for c in cameras)
        W = max(c.width for c in cameras)
    # Optional fields must agree structurally across the batch.
    have_depth = all(c.invdepth is not None for c in cameras)
    have_dmask = all(c.depth_mask is not None for c in cameras)

    def pad2(x, h, w, fill=0.0):
        if x is None:
            return None
        return jnp.pad(jnp.asarray(x), [(0, 0)] * (x.ndim - 2)
                       + [(0, H - h), (0, W - w)], constant_values=fill)

    out = []
    for c in cameras:
        mask = np.zeros((H, W), np.float32)
        mask[:c.height, :c.width] = 1.0
        mask = jnp.asarray(mask)
        if c.alpha_mask is not None:
            mask = mask * pad2(c.alpha_mask, c.height, c.width)
        out.append(dataclasses.replace(
            c,
            image=pad2(c.image, c.height, c.width),
            invdepth=pad2(c.invdepth, c.height, c.width)
            if have_depth else None,
            depth_mask=pad2(c.depth_mask, c.height, c.width)
            if have_dmask else None,
            alpha_mask=mask,
            pix_wh=jnp.asarray([c.width, c.height], jnp.float32),
            tan_wh=jnp.asarray([c.tan_fovx, c.tan_fovy], jnp.float32),
            height=H, width=W, fovx=0.0, fovy=0.0))
    return stack_cameras(out)
