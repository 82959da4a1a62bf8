"""The Gaussian scene model as a fixed-capacity padded pytree.

TPU-first counterpart of the reference's `scene/gaussian_model.py` GaussianModel
(torch nn.Module with dynamically resized tensors). XLA requires static shapes,
so the parameter store is a padded array of capacity C with an `active` mask;
densify/clone/split/prune are masked scatter ops (models/densify.py) and the
capacity only regrows host-side (with one re-jit) when occupancy crosses a
threshold.

Parameter groups and storage spaces mirror the reference exactly
(`scene/gaussian_model.py:50-67,150-178`):
  xyz           (C, 3)    world positions
  features_dc   (C, 3)    SH DC coefficients (one RGB triple)
  features_rest (C, 3(K-1)) higher SH bands, FLAT channel-minor layout
                (column 3(k-1)+c = coeff k, channel c; K = (max_deg+1)².
                (C, K, 3) would tile its last two dims on TPU and pad the
                3-lane minor to 128 — ~40x slower elementwise ops)
  scaling       (C, 3)    log-space
  rotation      (C, 4)    unnormalised quaternion (w, x, y, z)
  opacity       (C, 1)    inverse-sigmoid space
  exposure      (M, 3, 4) per-training-image affine colour transform

`active_sh_degree` is a traced int32 scalar: instead of recompiling on each
`oneup_sh_degree`, SH bands above the active degree are masked to zero before
the (always max-degree) basis contraction — same math, static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core import sh as shlib
from ..core import transforms
from ..ops.knn import mean_knn_sq_dist


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianParams:
    """Trainable leaves (pre-activation storage spaces)."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    exposure: jnp.ndarray

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianState:
    """Parameters + densification bookkeeping (all fixed capacity C)."""

    params: GaussianParams
    active: jnp.ndarray            # (C,) bool — live rows
    max_radii2d: jnp.ndarray       # (C,) f32 — max observed screen radius
    xyz_gradient_accum: jnp.ndarray  # (C,) f32 — Σ‖∇ndc mean2D‖ over visible
    denom: jnp.ndarray             # (C,) f32 — visibility counts
    active_sh_degree: jnp.ndarray  # () int32
    spatial_lr_scale: float = dataclasses.field(
        metadata=dict(static=True), default=1.0)
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True), default=3)

    # ---- activations (reference gaussian_model.py:33-48,103-144) ----
    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    @property
    def num_active(self) -> jnp.ndarray:
        return jnp.sum(self.active.astype(jnp.int32))

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.params.scaling)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.params.opacity[:, 0]) * self.active

    def get_rotation(self) -> jnp.ndarray:
        return transforms.normalize_quat(self.params.rotation)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        return transforms.scaling_rotation_to_cov3d(
            self.get_scaling() * scaling_modifier, self.params.rotation)

    def get_features(self) -> jnp.ndarray:
        """(C, 3K) FLAT SH coefficients (column 3k+c = coeff k, channel c)
        with inactive bands zeroed.

        Masking higher bands reproduces `active_sh_degree` semantics
        (gaussian_model.py:146-148) without shape changes. The flat
        channel-minor layout is deliberate: (C, K, 3) arrays tile their
        last two dims on TPU, padding the 3-lane minor to 128 — every
        elementwise op on that shape (Adam moments, gradients, masking)
        costs ~40x its flat equivalent.
        """
        feats = jnp.concatenate(
            [self.params.features_dc, self.params.features_rest], axis=1)
        k = feats.shape[1] // 3
        degs = np.concatenate(
            [np.full((2 * d + 1) * 3, d) for d in range(int(np.sqrt(k)))])
        band = jnp.asarray(degs, dtype=jnp.int32)
        mask = (band <= self.active_sh_degree).astype(feats.dtype)
        return feats * mask[None, :]

    def get_exposure(self, exposure_id) -> jnp.ndarray:
        return self.params.exposure[exposure_id]

    def oneup_sh_degree(self) -> "GaussianState":
        return dataclasses.replace(
            self,
            active_sh_degree=jnp.minimum(
                self.active_sh_degree + 1, self.max_sh_degree))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


def create_from_points(points: np.ndarray, colors: np.ndarray,
                       num_images: int, capacity: int | None = None,
                       max_sh_degree: int = 3,
                       spatial_lr_scale: float = 1.0) -> GaussianState:
    """Initialise from an SfM point cloud (reference `create_from_pcd`,
    gaussian_model.py:150-178): RGB→SH DC, log-sqrt-KNN scales, identity
    quaternions, opacity 0.1, identity exposures.
    """
    n = points.shape[0]
    if capacity is None:
        capacity = int(max(2 ** int(np.ceil(np.log2(max(n * 4, 1024)))), 1024))
    if capacity < n:
        raise ValueError(f"capacity {capacity} < initial points {n}")
    k = shlib.num_sh_bases(max_sh_degree)

    pts = jnp.asarray(points, dtype=jnp.float32)
    dist2 = jnp.maximum(mean_knn_sq_dist(pts), 1e-7)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        widths = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    xyz = pad(pts)
    features_dc = pad(shlib.rgb_to_sh(jnp.asarray(colors, dtype=jnp.float32)))
    features_rest = jnp.zeros((capacity, (k - 1) * 3), dtype=jnp.float32)
    # Padding rows get unit quats / tiny scales so activations stay finite.
    scaling = jnp.pad(scales, ((0, capacity - n), (0, 0)),
                      constant_values=np.log(1e-6))
    rotation = jnp.zeros((capacity, 4), dtype=jnp.float32).at[:, 0].set(1.0)
    opacity = jnp.full((capacity, 1),
                       float(transforms.inverse_sigmoid(jnp.asarray(0.1))),
                       dtype=jnp.float32)
    exposure = jnp.tile(
        jnp.eye(3, 4, dtype=jnp.float32)[None], (max(num_images, 1), 1, 1))
    active = (jnp.arange(capacity) < n)

    params = GaussianParams(
        xyz=xyz, features_dc=features_dc, features_rest=features_rest,
        scaling=scaling, rotation=rotation, opacity=opacity, exposure=exposure)
    # Distinct buffers (aliased leaves break donation under jit).
    return GaussianState(
        params=params, active=active,
        max_radii2d=jnp.zeros((capacity,), dtype=jnp.float32),
        xyz_gradient_accum=jnp.zeros((capacity,), dtype=jnp.float32),
        denom=jnp.zeros((capacity,), dtype=jnp.float32),
        active_sh_degree=jnp.asarray(0, dtype=jnp.int32),
        spatial_lr_scale=float(spatial_lr_scale),
        max_sh_degree=max_sh_degree)


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side capacity regrow (re-jit boundary). Preserves all live rows."""
    c = state.capacity
    if new_capacity <= c:
        return state
    extra = new_capacity - c

    def padp(x, fill=0.0):
        widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, widths, constant_values=fill)

    p = state.params
    params = GaussianParams(
        xyz=padp(p.xyz),
        features_dc=padp(p.features_dc),
        features_rest=padp(p.features_rest),
        scaling=padp(p.scaling, np.log(1e-6)),
        rotation=jnp.concatenate(
            [p.rotation,
             jnp.zeros((extra, 4), p.rotation.dtype).at[:, 0].set(1.0)]),
        opacity=padp(p.opacity, -6.0),
        exposure=p.exposure,
    )
    return dataclasses.replace(
        state, params=params,
        active=jnp.pad(state.active, (0, extra)),
        max_radii2d=jnp.pad(state.max_radii2d, (0, extra)),
        xyz_gradient_accum=jnp.pad(state.xyz_gradient_accum, (0, extra)),
        denom=jnp.pad(state.denom, (0, extra)))
