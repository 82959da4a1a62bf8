"""Camera model and view/projection matrices.

Conventions (deliberately chosen, then made file-format-compatible in data/):
  * COLUMN-vector convention internally: ``p_cam = W2C @ [p; 1]``. The
    reference stores torch row-major transposed matrices for row-vector
    multiplies (`scene/cameras.py:86-88`); our loaders convert at the boundary.
  * Projection is the OpenGL-style perspective with z mapped to [0, 1]
    (reference `utils/graphics_utils.py:51-71`, znear=0.01, zfar=100).

The :class:`Camera` is a frozen pytree: array fields (matrices, image, depth)
are leaves; ints (H, W) are static aux data so jitted renderers specialise on
resolution.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_ZNEAR = 0.01
DEFAULT_ZFAR = 100.0


def fov_to_focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal_to_fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray = None, scale: float = 1.0) -> np.ndarray:
    """4x4 world->camera matrix from COLMAP-convention (R, t).

    Semantics of the reference `getWorld2View2` (`utils/graphics_utils.py:38-49`):
    R is the camera-to-world rotation (i.e. COLMAP qvec2rotmat transposed),
    t the world-to-camera translation; optional scene recentring/rescale is
    applied to the camera centre. Column-vector convention (NOT transposed).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        c2w = np.linalg.inv(Rt)
        c2w[:3, 3] = (c2w[:3, 3] + translate) * scale
        Rt = np.linalg.inv(c2w)
    return Rt.astype(np.float32)


def perspective_projection(fovx: float, fovy: float,
                           znear: float = DEFAULT_ZNEAR,
                           zfar: float = DEFAULT_ZFAR) -> np.ndarray:
    """OpenGL-style perspective matrix, z in [0, 1], column-vector convention.

    Matches `utils/graphics_utils.py:51-71` exactly (same element layout, since
    that reference matrix is used with row-vectors AFTER a transpose — i.e. it
    is already the column-vector matrix).
    """
    tan_x = math.tan(fovx / 2.0)
    tan_y = math.tan(fovy / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Camera:
    """One training/eval view. Array fields are pytree leaves.

    Equivalent of the reference `scene/cameras.py:19-89` Camera, as data:
      world_view: (4, 4) world->camera (column-vector)
      full_proj:  (4, 4) proj @ world_view
      cam_center: (3,) camera position in world space
      image:      (3, H, W) float32 in [0,1], or None outside training
      invdepth:   (H, W) mono inverse-depth prior (already scale/offset
                  aligned), or None
      depth_mask: (H, W) {0,1} reliability mask (alpha mask ∧ depth_reliable)
      alpha_mask: (H, W) {0,1}
    """

    world_view: jnp.ndarray
    full_proj: jnp.ndarray
    cam_center: jnp.ndarray
    image: Optional[jnp.ndarray] = None
    invdepth: Optional[jnp.ndarray] = None
    depth_mask: Optional[jnp.ndarray] = None
    alpha_mask: Optional[jnp.ndarray] = None
    # Mixed-resolution DP batching (parallel/step.pad_camera_batch): when a
    # camera is zero-padded onto a common canvas, these TRACED leaves carry
    # the camera's true pixel dims [w, h] and [tan_fovx, tan_fovy] so one
    # compiled program serves heterogeneous intrinsics; the static
    # width/height then describe the canvas and fovx/fovy are zeroed.
    pix_wh: Optional[jnp.ndarray] = None
    tan_wh: Optional[jnp.ndarray] = None
    # DP batching (parallel/step.stack_cameras): the per-camera exposure
    # index as a TRACED leaf, so one compiled program serves a batch of
    # different training views. When set it overrides the static
    # exposure_id for the exposure-table lookup.
    exposure_idx: Optional[jnp.ndarray] = None
    height: int = dataclasses.field(metadata=dict(static=True), default=0)
    width: int = dataclasses.field(metadata=dict(static=True), default=0)
    fovx: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    fovy: float = dataclasses.field(metadata=dict(static=True), default=0.0)
    znear: float = dataclasses.field(metadata=dict(static=True), default=DEFAULT_ZNEAR)
    zfar: float = dataclasses.field(metadata=dict(static=True), default=DEFAULT_ZFAR)
    # index into the per-image exposure table; -1 = no exposure compensation
    exposure_id: int = dataclasses.field(metadata=dict(static=True), default=-1)
    image_name: str = dataclasses.field(metadata=dict(static=True), default="")
    depth_reliable: bool = dataclasses.field(metadata=dict(static=True), default=False)
    uid: int = dataclasses.field(metadata=dict(static=True), default=0)

    @property
    def tan_fovx(self) -> float:
        return math.tan(self.fovx / 2.0)

    @property
    def tan_fovy(self) -> float:
        return math.tan(self.fovy / 2.0)

    @property
    def focal_x(self) -> float:
        return fov_to_focal(self.fovx, self.width)

    @property
    def focal_y(self) -> float:
        return fov_to_focal(self.fovy, self.height)


def make_camera(R: np.ndarray, t: np.ndarray, fovx: float, fovy: float,
                width: int, height: int, image=None, invdepth=None,
                depth_mask=None, alpha_mask=None, exposure_id: int = -1,
                image_name: str = "", depth_reliable: bool = False,
                uid: int = 0, translate=None, scale: float = 1.0,
                znear: float = DEFAULT_ZNEAR, zfar: float = DEFAULT_ZFAR) -> Camera:
    """Build a Camera from COLMAP-style extrinsics (mirrors scene/cameras.py:19-89)."""
    w2c = world_to_view(R, t, translate=translate, scale=scale)
    proj = perspective_projection(fovx, fovy, znear, zfar)
    full = proj @ w2c
    c2w = np.linalg.inv(w2c)
    return Camera(
        world_view=jnp.asarray(w2c),
        full_proj=jnp.asarray(full),
        cam_center=jnp.asarray(c2w[:3, 3]),
        image=None if image is None else jnp.asarray(image),
        invdepth=None if invdepth is None else jnp.asarray(invdepth),
        depth_mask=None if depth_mask is None else jnp.asarray(depth_mask),
        alpha_mask=None if alpha_mask is None else jnp.asarray(alpha_mask),
        height=int(height), width=int(width), fovx=float(fovx), fovy=float(fovy),
        znear=float(znear), zfar=float(zfar), exposure_id=int(exposure_id),
        image_name=image_name, depth_reliable=bool(depth_reliable), uid=int(uid),
    )
