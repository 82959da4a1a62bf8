"""High-level differentiable render() — the framework's equivalent of the
reference `gaussian_renderer/__init__.py:18-130` Python shim.

Functional contract (vs the reference's stateful torch version):
  * takes a Camera pytree + GaussianState, returns
    {render, invdepth, radii, visibility} — radii/visibility replace the
    reference's `visibility_filter` return.
  * `screen_offset`: a (C, 2) zeros array threaded through the projected 2D
    means; differentiating the loss w.r.t. it yields the per-Gaussian
    screen-space gradient that densification thresholds — the JAX-native
    replacement for the reference's retain_grad on the dummy `means2D`
    (`gaussian_renderer/__init__.py:26-30`). Gradients are returned in pixel
    units; the densify bookkeeping rescales by (W/2, H/2) to match the CUDA
    NDC-gradient convention that the 2e-4 threshold was tuned for.
  * exposure compensation: img' = E[:3,:3]·img + E[:3,3] when
    `use_trained_exp` and the camera has an exposure id
    (`gaussian_renderer/__init__.py:115-117`).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..core.cameras import Camera
from ..models.gaussians import GaussianState
from . import projection as proj_ops
from . import reference as ref_ops


def render(
    camera: Camera,
    state: GaussianState,
    bg_color: jnp.ndarray,
    *,
    scaling_modifier: float = 1.0,
    antialiasing: bool = False,
    use_trained_exp: bool = False,
    override_color: Optional[jnp.ndarray] = None,
    screen_offset: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    clamp: bool = True,
    pair_capacity: Optional[int] = None,
):
    """Render one view. Returns dict(render, invdepth, radii, visibility)."""
    cov3d = state.get_covariance(scaling_modifier)
    sh_coeffs = state.get_features()
    proj = proj_ops.project_gaussians(
        state.params.xyz, cov3d, state.get_opacity(), sh_coeffs,
        state.max_sh_degree,
        camera.world_view, camera.full_proj, camera.cam_center,
        camera.width, camera.height, camera.tan_fovx, camera.tan_fovy,
        antialiasing=antialiasing, valid_mask=state.active,
        colors_precomp=override_color)
    if screen_offset is not None:
        proj = proj.__class__(
            mean2d=proj.mean2d + screen_offset, conic=proj.conic,
            opacity=proj.opacity, rgb=proj.rgb, depth=proj.depth,
            invdepth=proj.invdepth, radius=proj.radius)

    # Backend dispatch: 'auto' uses the Pallas kernels on TPU and the jnp
    # oracle elsewhere (interpret-mode Pallas on CPU is only for parity
    # tests — orders of magnitude slower than the oracle).
    use_pallas = backend == "pallas"
    if backend == "auto":
        import jax  # noqa: PLC0415
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from . import rasterize_pallas  # noqa: PLC0415
        out = rasterize_pallas.rasterize(
            proj, bg_color, camera.width, camera.height,
            pair_capacity=pair_capacity)
    else:
        out = ref_ops.rasterize_reference(
            proj, bg_color, camera.width, camera.height)

    image = out["render"]
    # The traced exposure_idx leaf (when set) overrides the STATIC
    # exposure_id so one compiled program serves every view — the DP batch
    # path and eval_image both route through it (a static per-view id
    # would recompile per camera).
    if use_trained_exp and camera.exposure_idx is not None:
        exposure = state.get_exposure(camera.exposure_idx)
        image = jnp.einsum("ij,jhw->ihw", exposure[:3, :3], image) \
            + exposure[:3, 3][:, None, None]
    elif use_trained_exp and camera.exposure_id >= 0:
        exposure = state.get_exposure(camera.exposure_id)
        image = jnp.einsum("ij,jhw->ihw", exposure[:3, :3], image) \
            + exposure[:3, 3][:, None, None]
    if clamp:
        image = jnp.clip(image, 0.0, 1.0)
    return {
        "render": image,
        "invdepth": out["invdepth"],
        "radii": proj.radius,
        "visibility": proj.radius > 0,
        "final_T": out.get("final_T"),
        "overflow": out.get("overflow"),
        "num_pairs": out.get("num_pairs"),
    }
