"""Depth-prior floating-object pruning — the PriorDepth thesis module.

TPU-native re-implementation of the reference `GaussianOpt.py` pipeline and
its `train.py:193-291` driver:

  * project all Gaussian centres to the camera (WtoC + PerspectiveProj —
    here via the Camera's world_view matrix, i.e. the mathematically
    consistent world→camera transform rather than the reference's
    centre-confused variant);
  * validity filter: in-bounds pixel, positive camera z, visible this frame
    (`valid_pixel_filter`, GaussianOpt.py:112-145);
  * linearise both depth maps: depth = 1/(invdepth + ε)
    (`linearization`, :234-248);
  * optional closed-form least-squares (k, b) alignment of rendered depth to
    camera z over a circular feature table (`least_squares` +
    `update_feature_target_table`, :148-183, 251-277). The reference
    overrides the fit with (k, b) = (1, 0) (:303); `use_least_squares=False`
    replicates that default.
  * prune mask (`floatingObj_prune`, :375-433):
      (mono_depth − rendered_depth > cam_extent)
        ∧ (cam_z < 20) ∧ (cam_z − geo_mean_radius < rendered_depth)
      ∪ (cam_z < 20 ∧ max_scale > 50);
  * host loop (`prune_loop`): re-render random views and prune until a full
    pass of views deletes nothing (`train.py:224-291`);
  * `inject_noise_gaussians`: the reference's iteration-30000
    fault-injection experiment (`train.py:193-221`) — plant bright
    floating Gaussians at z=15 and let the pruner remove them.

All per-view math is one jitted function; only the view loop is host-side.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import Camera
from ..models import densify as densify_ops
from ..models.gaussians import GaussianState
from ..train import optim

EPSILON = 1e-6
MAX_TABLE = 100_000
NEAR_Z = 20.0
MAX_RADII_WORLD = 50.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FeatureTable:
    """Circular (rendered_depth, cam_z) buffer for the least-squares fit."""

    data: jnp.ndarray   # (MAX_TABLE, 2)
    index: jnp.ndarray  # () int32 — next write position
    count: jnp.ndarray  # () int32 — valid rows

    @staticmethod
    def empty(size: int = MAX_TABLE) -> "FeatureTable":
        return FeatureTable(data=jnp.zeros((size, 2), jnp.float32),
                            index=jnp.zeros((), jnp.int32),
                            count=jnp.zeros((), jnp.int32))


def least_squares_fit(feature: jnp.ndarray, target: jnp.ndarray,
                      mask: jnp.ndarray):
    """Closed-form k, b with kx+b ≈ y over masked rows (2×2 normal eqs)."""
    w = mask.astype(jnp.float32)
    n = jnp.sum(w)
    sx = jnp.sum(w * feature)
    sy = jnp.sum(w * target)
    sxx = jnp.sum(w * feature * feature)
    sxy = jnp.sum(w * feature * target)
    det = n * sxx - sx * sx
    ok = jnp.abs(det) > 1e-12
    k = jnp.where(ok, (n * sxy - sx * sy) / jnp.where(ok, det, 1.0), 1.0)
    b = jnp.where(ok, (sxx * sy - sx * sxy) / jnp.where(ok, det, 1.0), 0.0)
    return k, b, ok


def update_table(table: FeatureTable, pairs: jnp.ndarray,
                 valid: jnp.ndarray) -> FeatureTable:
    """Circular append of valid rows (compacted to the front first)."""
    size = table.data.shape[0]
    order = jnp.argsort(~valid, stable=True)  # valid rows first
    pairs = pairs[order]
    n_add = jnp.minimum(jnp.sum(valid.astype(jnp.int32)), size)
    idx = (table.index + jnp.arange(pairs.shape[0])) % size
    write = jnp.arange(pairs.shape[0]) < n_add
    data = table.data.at[jnp.where(write, idx, size)].set(
        pairs, mode="drop")
    return FeatureTable(
        data=data,
        index=(table.index + n_add) % size,
        count=jnp.minimum(table.count + n_add, size))


@partial(jax.jit, donate_argnums=(0, 1),
         static_argnames=("use_least_squares",))
def prune_view(state: GaussianState, opt_state: optim.AdamState,
               table: FeatureTable, camera: Camera,
               rendered_invdepth: jnp.ndarray, radii: jnp.ndarray,
               cam_extent: float, use_least_squares: bool = False):
    """One view of the floating-object pruner. Returns
    (state, opt_state, table, n_deleted)."""
    w2c = camera.world_view
    cam_xyz = state.params.xyz @ w2c[:3, :3].T + w2c[:3, 3]
    cam_z = cam_xyz[:, 2]
    fx = camera.width / (2.0 * camera.tan_fovx)
    fy = camera.height / (2.0 * camera.tan_fovy)
    px = fx * cam_xyz[:, 0] / cam_z + camera.width / 2.0
    py = fy * cam_xyz[:, 1] / cam_z + camera.height / 2.0

    valid = ((px >= 0) & (px < camera.width)
             & (py >= 0) & (py < camera.height)
             & (cam_z > 0) & (radii > 0) & state.active)

    xi = jnp.clip(px.astype(jnp.int32), 0, camera.width - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, camera.height - 1)
    rend_depth = 1.0 / (rendered_invdepth[0][yi, xi] + EPSILON)
    mono = camera.invdepth if camera.invdepth is not None else \
        jnp.zeros((camera.height, camera.width))
    mono_depth = 1.0 / (mono[yi, xi] + EPSILON)

    # Least-squares rendered-depth → camera-z alignment over the table.
    pairs = jnp.stack([rend_depth, cam_z], axis=1)
    table = update_table(table, pairs, valid)
    if use_least_squares:
        in_tbl = jnp.arange(table.data.shape[0]) < table.count
        k, b, _ = least_squares_fit(table.data[:, 0], table.data[:, 1],
                                    in_tbl)
    else:
        k, b = jnp.float32(1.0), jnp.float32(0.0)  # reference override :303
    norm_rend = k * rend_depth + b
    norm_mono = k * mono_depth + b

    scaling = state.get_scaling()
    max_radii3d = jnp.max(scaling, axis=1)
    geo_mean_radii = jnp.prod(scaling, axis=1) ** (1.0 / 3.0)

    near = cam_z < NEAR_Z
    floating = ((norm_mono - norm_rend) > cam_extent) & near \
        & ((cam_z - geo_mean_radii) < norm_rend)
    huge = near & (max_radii3d > MAX_RADII_WORLD)
    prune_mask = valid & (floating | huge)

    state, opt_state, n_del = densify_ops.prune_rows(state, opt_state,
                                                     prune_mask)
    return state, opt_state, table, n_del


def prune_loop(state, opt_state, cameras, render_fn, cam_extent: float,
               rng: np.random.RandomState | None = None,
               use_least_squares: bool = False, max_epochs: int = 1000):
    """Repeat random-view pruning until a full camera pass deletes nothing
    (`train.py:229-291` termination rule). `render_fn(camera, state)` must
    return (invdepth (1,H,W), radii (C,))."""
    rng = rng or np.random.RandomState(0)
    table = FeatureTable.empty()
    zero_views = 0
    total_deleted = 0
    epochs = 0
    deletions = []
    while zero_views < len(cameras) and epochs < max_epochs:
        cam = cameras[rng.randint(len(cameras))]
        if cam.invdepth is None or not cam.depth_reliable:
            zero_views += 1
            epochs += 1
            continue
        invdepth, radii = render_fn(cam, state)
        state, opt_state, table, n_del = prune_view(
            state, opt_state, table, cam, invdepth, radii, cam_extent,
            use_least_squares=use_least_squares)
        n_del = int(n_del)
        total_deleted += n_del
        deletions.append(total_deleted)
        if n_del == 0:
            zero_views += 1
        epochs += 1
    return state, opt_state, {"total_deleted": total_deleted,
                              "epochs": epochs, "history": deletions}


def inject_noise_gaussians(state: GaussianState, opt_state: optim.AdamState,
                           key: jax.Array, cam_extent: float,
                           n_noise: int = 6, z_depth: float = 15.0):
    """The iteration-30000 robustness experiment (`train.py:193-221`):
    insert n bright floating Gaussians at z=z_depth with features copied
    from the nearest existing point. Uses free capacity slots."""
    c = state.capacity
    k1, k2, k3 = jax.random.split(key, 3)
    new_xy = jax.random.uniform(k1, (n_noise, 2), minval=-2 * cam_extent,
                                maxval=1 * cam_extent)
    new_xyz = jnp.concatenate(
        [new_xy, jnp.full((n_noise, 1), z_depth)], axis=1)

    # Nearest existing ACTIVE point (return_closest_point).
    d2 = jnp.sum((new_xyz[:, None, :] - state.params.xyz[None]) ** 2, -1)
    d2 = jnp.where(state.active[None, :], d2, jnp.inf)
    closest = jnp.argmin(d2, axis=1)

    free_slots = jnp.argsort(state.active, stable=True)[:n_noise]
    n_free = c - jnp.sum(state.active.astype(jnp.int32))
    ok = jnp.arange(n_noise) < n_free
    dst = jnp.where(ok, free_slots, c)

    rand_rows = jax.random.randint(k3, (n_noise,), 0, c)
    p = state.params
    # Opacity logit uniform [4, 9) -> sigmoid ≈ 0.98..1 (train.py:207).
    new_op = 4.0 + jax.random.uniform(k2, (n_noise, 1)) * 5.0
    new_params = p.replace(
        xyz=p.xyz.at[dst].set(new_xyz, mode="drop"),
        features_dc=p.features_dc.at[dst].set(p.features_dc[closest],
                                              mode="drop"),
        features_rest=p.features_rest.at[dst].set(p.features_rest[closest],
                                                  mode="drop"),
        opacity=p.opacity.at[dst].set(new_op, mode="drop"),
        scaling=p.scaling.at[dst].set(p.scaling[rand_rows], mode="drop"),
        rotation=p.rotation.at[dst].set(p.rotation[closest], mode="drop"),
    )
    active = state.active.at[dst].set(True, mode="drop")
    touched = jnp.zeros(c, bool).at[dst].set(True, mode="drop")
    opt_state = optim.zero_moments_rows(opt_state, touched)
    return state.replace(params=new_params, active=active), opt_state, dst


@partial(jax.jit, donate_argnums=(0,))
def adjust_gaussians_to_depth(state: GaussianState, camera: Camera,
                              rendered_invdepth: jnp.ndarray,
                              radii: jnp.ndarray, cam_extent: float,
                              threshold_frac: float = 0.5):
    """The reference's alternative `gs_adjustment` path (GaussianOpt.py:436-503):
    instead of deleting floaters, MOVE Gaussians whose rendered depth
    disagrees with the mono prior to the prior's depth along the camera ray
    (the monkey-patched `set_z`, applied here to the full camera-space
    position for geometric consistency). Not called from the reference
    train loop; exposed for experimentation."""
    w2c = camera.world_view
    cam_xyz = state.params.xyz @ w2c[:3, :3].T + w2c[:3, 3]
    cam_z = cam_xyz[:, 2]
    fx = camera.width / (2.0 * camera.tan_fovx)
    fy = camera.height / (2.0 * camera.tan_fovy)
    px = fx * cam_xyz[:, 0] / cam_z + camera.width / 2.0
    py = fy * cam_xyz[:, 1] / cam_z + camera.height / 2.0
    valid = ((px >= 0) & (px < camera.width)
             & (py >= 0) & (py < camera.height)
             & (cam_z > 0) & (radii > 0) & state.active)
    xi = jnp.clip(px.astype(jnp.int32), 0, camera.width - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, camera.height - 1)
    rend_depth = 1.0 / (rendered_invdepth[0][yi, xi] + EPSILON)
    mono = camera.invdepth if camera.invdepth is not None else \
        jnp.zeros((camera.height, camera.width))
    mono_depth = 1.0 / (mono[yi, xi] + EPSILON)
    move = valid & (jnp.abs(mono_depth - rend_depth)
                    > threshold_frac * cam_extent)
    # New camera-space position: same ray, z from the mono prior.
    scale = mono_depth / jnp.maximum(cam_z, EPSILON)
    new_cam = cam_xyz * scale[:, None]
    c2w_r = w2c[:3, :3].T
    cam_center = -c2w_r @ w2c[:3, 3]
    new_world = new_cam @ w2c[:3, :3] + cam_center
    xyz = jnp.where(move[:, None], new_world, state.params.xyz)
    return (state.replace(params=state.params.replace(xyz=xyz)),
            jnp.sum(move.astype(jnp.int32)))
