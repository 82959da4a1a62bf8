"""Oracle rasterizer correctness: analytic single-splat values, occlusion
ordering, background compositing, and autodiff-vs-finite-difference gradients.
This is the golden model the Pallas kernels are verified against."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from priordepth_gaussiansplatting_tpu.core import transforms
from priordepth_gaussiansplatting_tpu.ops import projection as proj_ops
from priordepth_gaussiansplatting_tpu.ops import reference as ref_ops
from priordepth_gaussiansplatting_tpu.utils import testing as T


def _project(params, cam, sh_degree=3, antialiasing=False, valid_mask=None):
    cov3d = transforms.scaling_rotation_to_cov3d(params["scales"],
                                                 params["quats"])
    return proj_ops.project_gaussians(
        params["means"], cov3d, params["opacities"], params["sh"], sh_degree,
        cam.world_view, cam.full_proj, cam.cam_center,
        cam.width, cam.height, cam.tan_fovx, cam.tan_fovy,
        antialiasing=antialiasing, valid_mask=valid_mask)


def _single_gaussian(color=(1.0, 0.0, 0.0), z=0.0, opacity=0.8, scale=0.05):
    from priordepth_gaussiansplatting_tpu.core import sh as shlib
    n = 1
    return dict(
        means=jnp.array([[0.0, 0.0, z]]),
        scales=jnp.full((n, 3), scale),
        quats=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 1)),
        opacities=jnp.array([opacity]),
        sh=jnp.zeros((n, 16, 3)).at[:, 0, :].set(
            shlib.rgb_to_sh(jnp.array([color]))),
    )


def test_single_gaussian_center_pixel_analytic():
    W = H = 64
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)
    params = _single_gaussian(opacity=0.8)
    proj = _project(params, cam)
    out = ref_ops.rasterize_reference(proj, jnp.zeros(3), W, H)
    img = np.asarray(out["render"])
    # Center of a WxW image in ndc2Pix coords: pixel (W-1)/2 — the gaussian
    # projects exactly there; at the gaussian center exp(power)=~1 so
    # alpha≈opacity and the red channel ≈ 0.8 at the nearest pixel.
    cx = int(round((W - 1) / 2))
    d = float(np.asarray(proj.mean2d)[0, 0]) - cx  # subpixel offset
    conic = np.asarray(proj.conic)[0]
    power = -0.5 * (conic[0] * d * d + conic[2] * d * d) - conic[1] * d * d
    expected_alpha = min(0.99, 0.8 * math.exp(power))
    assert img[0, cx, cx] == pytest.approx(expected_alpha, abs=1e-3)
    assert img[1, cx, cx] == pytest.approx(0.0, abs=1e-6)
    # Transmittance at that pixel.
    assert np.asarray(out["final_T"])[cx, cx] == pytest.approx(
        1.0 - expected_alpha, abs=1e-3)
    # Inverse depth: camera at distance 2 -> invdepth = alpha * 0.5.
    assert np.asarray(out["invdepth"])[0, cx, cx] == pytest.approx(
        expected_alpha * 0.5, abs=1e-3)


def test_background_composited_through_transmittance():
    W = H = 32
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)
    params = _single_gaussian(opacity=0.5)
    proj = _project(params, cam)
    bg = jnp.array([0.0, 0.0, 1.0])
    out = ref_ops.rasterize_reference(proj, bg, W, H)
    img = np.asarray(out["render"])
    # Far corner: no splat -> pure background.
    np.testing.assert_allclose(img[:, 0, 0], [0, 0, 1], atol=1e-6)


def test_occlusion_front_to_back_order():
    """A red splat in front of a green one: center pixel dominated by red,
    regardless of array order."""
    from priordepth_gaussiansplatting_tpu.core import sh as shlib
    W = H = 64
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)

    def scene(order):
        reds = _single_gaussian((1, 0, 0), z=-0.5, opacity=0.9)   # closer
        greens = _single_gaussian((0, 1, 0), z=0.5, opacity=0.9)  # farther
        pair = [reds, greens] if order == "rg" else [greens, reds]
        return {k: jnp.concatenate([p[k] for p in pair]) for k in reds}

    outs = []
    for order in ("rg", "gr"):
        proj = _project(scene(order), cam)
        out = ref_ops.rasterize_reference(proj, jnp.zeros(3), W, H)
        outs.append(np.asarray(out["render"]))
    cx = int(round((W - 1) / 2))
    for img in outs:
        assert img[0, cx, cx] > 0.80          # red dominates
        assert img[1, cx, cx] < 0.15          # green occluded
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-6)  # order-invariant


def test_culled_and_masked_gaussians_do_not_render():
    W = H = 32
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)
    params = _single_gaussian(opacity=0.9)
    # Second gaussian behind the camera; third masked out.
    p2 = _single_gaussian((0, 1, 0), z=-5.0, opacity=0.9)
    p3 = _single_gaussian((0, 0, 1), z=0.2, opacity=0.9)
    params = {k: jnp.concatenate([params[k], p2[k], p3[k]]) for k in params}
    mask = jnp.array([True, True, False])
    proj = _project(params, cam, valid_mask=mask)
    radius = np.asarray(proj.radius)
    assert radius[1] == 0  # frustum-culled (z<=0.2 camera space)
    assert radius[2] == 0  # masked padding row
    out = ref_ops.rasterize_reference(proj, jnp.zeros(3), W, H)
    img = np.asarray(out["render"])
    assert img[1].max() == 0.0 and img[2].max() == 0.0


def test_antialiasing_rescales_opacity():
    W = H = 64
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)
    params = _single_gaussian(opacity=0.8, scale=0.003)  # tiny -> strong AA
    p_no = _project(params, cam, antialiasing=False)
    p_aa = _project(params, cam, antialiasing=True)
    assert float(p_aa.opacity[0]) < float(p_no.opacity[0])
    # AA factor = sqrt(det(cov)/det(cov + 0.3I)) for this splat.
    ratio = float(p_aa.opacity[0]) / float(p_no.opacity[0])
    assert 0.0 < ratio < 1.0


def test_random_scene_renders_finite_and_in_range():
    key = jax.random.PRNGKey(0)
    W = H = 128
    cam = T.look_at_camera((0, 0, -3.0), width=W, height=H)
    params = T.random_gaussians(key, 512)
    proj = _project(params, cam)
    out = ref_ops.rasterize_reference(proj, jnp.ones(3) * 0.5, W, H)
    img = np.asarray(out["render"])
    assert np.isfinite(img).all()
    assert (np.asarray(out["final_T"]) >= 0).all()
    assert img.min() >= 0.0


def test_gradients_match_finite_differences():
    """Autodiff pixel-loss gradients vs central finite differences on means,
    scales, opacities — the contract the Pallas backward must also meet."""
    key = jax.random.PRNGKey(1)
    W = H = 48
    cam = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    params = T.random_gaussians(key, 24, scale_range=(0.05, 0.15))
    target = jax.random.uniform(jax.random.PRNGKey(2), (3, H, W))

    def loss(p):
        # round_bf16=False: finite differences need a smooth loss; the
        # bf16 attribute-rounding spec is a staircase at these epsilons
        # (its VJP is exercised by the pallas-vs-oracle gradient tests).
        cov3d = transforms.scaling_rotation_to_cov3d(p["scales"], p["quats"])
        proj = proj_ops.project_gaussians(
            p["means"], cov3d, p["opacities"], p["sh"], 3,
            cam.world_view, cam.full_proj, cam.cam_center,
            cam.width, cam.height, cam.tan_fovx, cam.tan_fovy,
            round_bf16=False)
        out = ref_ops.rasterize_reference(proj, jnp.zeros(3), W, H)
        return jnp.mean((out["render"] - target) ** 2)

    g = jax.grad(loss)(params)
    rng = np.random.RandomState(0)
    for name in ("means", "scales", "opacities"):
        arr = np.asarray(params[name], dtype=np.float64)
        flat_g = np.asarray(g[name]).ravel()
        # Probe 5 random coordinates.
        idxs = rng.choice(arr.size, size=5, replace=False)
        eps = 3e-3 if name != "opacities" else 1e-3
        for idx in idxs:
            for sign, store in ((1, "hi"), (-1, "lo")):
                pert = arr.copy().ravel()
                pert[idx] += sign * eps
                p2 = dict(params)
                p2[name] = jnp.asarray(pert.reshape(arr.shape),
                                       dtype=jnp.float32)
                if store == "hi":
                    hi = float(loss(p2))
                else:
                    lo = float(loss(p2))
            fd = (hi - lo) / (2 * eps)
            ad = float(flat_g[idx])
            assert ad == pytest.approx(fd, rel=0.15, abs=1e-4), (
                f"{name}[{idx}]: autodiff {ad} vs fd {fd}")


def test_scaling_modifier_shrinks_splats():
    from priordepth_gaussiansplatting_tpu.models import gaussians as gm
    from priordepth_gaussiansplatting_tpu.ops.render import render as render_api
    rng = np.random.RandomState(0)
    st = gm.create_from_points(rng.randn(16, 3).astype(np.float32) * 0.3,
                               rng.rand(16, 3).astype(np.float32),
                               num_images=1, capacity=32)
    cam = T.look_at_camera((0, 0, -2.5), width=32, height=32)
    full = render_api(cam, st, jnp.zeros(3), backend="oracle",
                      scaling_modifier=1.0)
    tiny = render_api(cam, st, jnp.zeros(3), backend="oracle",
                      scaling_modifier=0.1)
    # Shrinking covariances reduces covered pixels/energy.
    assert float(tiny["render"].sum()) < float(full["render"].sum())
    assert int((tiny["radii"] > 0).sum()) <= int((full["radii"] > 0).sum())


def test_override_color_bypasses_sh():
    from priordepth_gaussiansplatting_tpu.models import gaussians as gm
    from priordepth_gaussiansplatting_tpu.ops.render import render as render_api
    rng = np.random.RandomState(1)
    st = gm.create_from_points(rng.randn(8, 3).astype(np.float32) * 0.2,
                               rng.rand(8, 3).astype(np.float32),
                               num_images=1, capacity=16)
    cam = T.look_at_camera((0, 0, -2.0), width=32, height=32)
    colors = jnp.zeros((16, 3)).at[:, 1].set(1.0)  # pure green
    out = render_api(cam, st, jnp.zeros(3), backend="oracle",
                     override_color=colors)
    img = np.asarray(out["render"])
    assert img[1].max() > 0.1        # green present
    assert img[0].max() == 0.0       # no red
    assert img[2].max() == 0.0
