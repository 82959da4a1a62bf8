"""Train-step integration: a tiny scene must overfit a rendered target
(loss falls, PSNR rises) with densification and opacity reset in the loop —
the minimum end-to-end slice of SURVEY.md §7."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from priordepth_gaussiansplatting_tpu.models import gaussians as gm
from priordepth_gaussiansplatting_tpu.ops import losses
from priordepth_gaussiansplatting_tpu.ops.render import render
from priordepth_gaussiansplatting_tpu.train import optim, step as step_lib
from priordepth_gaussiansplatting_tpu.utils import testing as T
from priordepth_gaussiansplatting_tpu.utils.config import (OptimizationConfig,
                                                           PipelineConfig)


def _target_scene(key, cam, n=40):
    """Ground-truth image rendered from a random Gaussian set."""
    p = T.random_gaussians(key, n, extent=0.8, scale_range=(0.05, 0.2),
                           opacity_range=(0.6, 0.95))
    pts = np.asarray(p["means"])
    cols = np.clip(np.asarray(
        0.28209479177387814 * p["sh"][:, :3] + 0.5), 0, 1)
    st = gm.create_from_points(pts, cols, num_images=1, capacity=64)
    scal = np.full((st.capacity, 3), np.log(1e-6), np.float32)
    scal[:n] = np.log(np.asarray(p["scales"]))
    op = np.full((st.capacity, 1), -6.0, np.float32)
    o = np.asarray(p["opacities"])
    op[:n, 0] = np.log(o / (1 - o))
    st = st.replace(params=st.params.replace(
        scaling=jnp.asarray(scal), opacity=jnp.asarray(op)))
    out = render(cam, st, jnp.zeros(3), backend="oracle")
    return np.asarray(out["render"])


@pytest.mark.slow
def test_overfit_tiny_scene_with_densify():
    key = jax.random.PRNGKey(0)
    W = H = 48
    cam0 = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    target = _target_scene(jax.random.PRNGKey(42), cam0)
    import dataclasses
    cam = dataclasses.replace(cam0, image=jnp.asarray(target))

    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.8, 0.8, (64, 3)).astype(np.float32)
    cols = rng.rand(64, 3).astype(np.float32)
    state = gm.create_from_points(pts, cols, num_images=1, capacity=256)
    opt_state = optim.init_adam(state.params)

    opt_cfg = OptimizationConfig(
        iterations=400, position_lr_max_steps=400,
        densify_from_iter=50, densify_until_iter=300,
        densification_interval=100, opacity_reset_interval=10_000,
        densify_grad_threshold=2e-3)
    pipe_cfg = PipelineConfig(backend="oracle")
    fns = step_lib.make_train_step(opt_cfg, pipe_cfg)

    bg = jnp.zeros(3)
    metrics0 = None
    state_t, opt_t = state, opt_state
    for it in range(1, 201):
        k = jax.random.fold_in(key, it)
        state_t, opt_t, m = fns.step(state_t, opt_t, cam,
                                     jnp.asarray(it), k, bg)
        if metrics0 is None:
            metrics0 = {k2: float(v) for k2, v in m.items()}
        if it % 100 == 0 and it >= opt_cfg.densify_from_iter:
            state_t, opt_t, info = fns.densify(state_t, opt_t,
                                               jax.random.fold_in(key, 100000 + it))
    final = {k2: float(v) for k2, v in m.items()}
    assert np.isfinite(final["loss"])
    assert final["loss"] < 0.6 * metrics0["loss"], (metrics0, final)

    out = render(cam, state_t, bg, backend="oracle")
    p = float(losses.psnr(out["render"], jnp.asarray(target)))
    # Random init starts around ~8-12 dB on this scene; overfit must clear 16.
    assert p > 16.0, p
    # Densification actually ran and kept the state sane.
    assert int(state_t.num_active) >= 64
    assert bool(jnp.all(jnp.isfinite(state_t.params.xyz)))


def test_depth_loss_gate_and_weight_schedule():
    opt_cfg = OptimizationConfig(iterations=100)
    w0 = float(step_lib.depth_l1_weight(0, opt_cfg))
    w1 = float(step_lib.depth_l1_weight(100, opt_cfg))
    assert w0 == jax.numpy.asarray(1.0)
    assert abs(w1 - 0.01) < 1e-4

    # With depth_feedback on and a depth map present, depth_loss is nonzero.
    W = H = 32
    cam0 = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    target = _target_scene(jax.random.PRNGKey(7), cam0, n=20)
    inv = jnp.ones((H, W)) * 0.5
    import dataclasses
    cam = dataclasses.replace(cam0, image=jnp.asarray(target), invdepth=inv,
                              depth_mask=jnp.ones((H, W)))
    rng = np.random.RandomState(3)
    st = gm.create_from_points(rng.randn(16, 3).astype(np.float32) * 0.3,
                               rng.rand(16, 3).astype(np.float32),
                               num_images=1, capacity=32)
    opt_state = optim.init_adam(st.params)
    for feedback, expect_nonzero in ((True, True), (False, False)):
        cfg = OptimizationConfig(iterations=100, depth_feedback=feedback)
        fns = step_lib.make_train_step(cfg, PipelineConfig(backend="oracle"))
        # Copy: fns.step donates its state args.
        st_c = jax.tree.map(jnp.array, st)
        opt_c = jax.tree.map(jnp.array, opt_state)
        _, _, m = fns.step(st_c, opt_c, cam, jnp.asarray(1),
                           jax.random.PRNGKey(0), jnp.zeros(3))
        if expect_nonzero:
            assert float(m["depth_loss"]) > 0.0
        else:
            assert float(m["depth_loss"]) == 0.0


def test_exposure_compensation_applies_affine():
    W = H = 16
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H, exposure_id=0)
    rng = np.random.RandomState(0)
    st = gm.create_from_points(rng.randn(8, 3).astype(np.float32) * 0.2,
                               rng.rand(8, 3).astype(np.float32),
                               num_images=2, capacity=16)
    # Exposure 0: scale red channel by 2, add 0.1 to blue.
    exp = np.tile(np.eye(3, 4, dtype=np.float32)[None], (2, 1, 1))
    exp[0, 0, 0] = 2.0
    exp[0, 2, 3] = 0.1
    st = st.replace(params=st.params.replace(exposure=jnp.asarray(exp)))
    out_plain = render(cam, st, jnp.zeros(3), backend="oracle",
                       use_trained_exp=False, clamp=False)
    out_exp = render(cam, st, jnp.zeros(3), backend="oracle",
                     use_trained_exp=True, clamp=False)
    np.testing.assert_allclose(np.asarray(out_exp["render"][0]),
                               2 * np.asarray(out_plain["render"][0]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_exp["render"][2]),
                               np.asarray(out_plain["render"][2]) + 0.1,
                               atol=1e-5)


def test_ssim_known_values():
    from priordepth_gaussiansplatting_tpu.ops.ssim import ssim
    img = jnp.asarray(np.random.RandomState(0).rand(3, 32, 32).astype(np.float32))
    assert float(ssim(img, img)) > 0.999
    assert float(ssim(img, 1.0 - img)) < 0.5


def test_sparse_adam_training_runs():
    """optimizer_type=sparse_adam end to end: visible-only updates train."""
    import dataclasses
    W = H = 32
    cam0 = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    target = _target_scene(jax.random.PRNGKey(11), cam0, n=20)
    cam = dataclasses.replace(cam0, image=jnp.asarray(target))
    rng = np.random.RandomState(5)
    st = gm.create_from_points(rng.uniform(-0.8, 0.8, (32, 3)).astype(np.float32),
                               rng.rand(32, 3).astype(np.float32),
                               num_images=1, capacity=64)
    opt_state = optim.init_adam(st.params)
    cfg = OptimizationConfig(iterations=50, position_lr_max_steps=50,
                             optimizer_type="sparse_adam")
    fns = step_lib.make_train_step(cfg, PipelineConfig(backend="oracle"))
    losses_seen = []
    for it in range(1, 31):
        st, opt_state, m = fns.step(st, opt_state, cam, jnp.asarray(it),
                                    jax.random.fold_in(jax.random.PRNGKey(0), it),
                                    jnp.zeros(3))
        losses_seen.append(float(m["loss"]))
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]


def test_training_with_pallas_backend():
    """The full jitted train step through the Pallas rasterizer (interpret
    mode on CPU): losses decrease and densify stats accumulate."""
    import dataclasses
    W = H = 32
    cam0 = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    target = _target_scene(jax.random.PRNGKey(21), cam0, n=16)
    cam = dataclasses.replace(cam0, image=jnp.asarray(target))
    rng = np.random.RandomState(9)
    st = gm.create_from_points(rng.uniform(-0.6, 0.6, (24, 3)).astype(np.float32),
                               rng.rand(24, 3).astype(np.float32),
                               num_images=1, capacity=32)
    opt_state = optim.init_adam(st.params)
    cfg = OptimizationConfig(iterations=30, position_lr_max_steps=30)
    fns = step_lib.make_train_step(cfg, PipelineConfig(backend="pallas"))
    losses_seen = []
    for it in range(1, 16):
        st, opt_state, m = fns.step(st, opt_state, cam, jnp.asarray(it),
                                    jax.random.fold_in(jax.random.PRNGKey(1), it),
                                    jnp.zeros(3))
        losses_seen.append(float(m["loss"]))
    assert np.isfinite(losses_seen).all()
    assert losses_seen[-1] < losses_seen[0]
    assert float(jnp.sum(st.xyz_gradient_accum)) > 0.0  # densify grads flow


def test_metrics_logger_images_and_histograms(tmp_path):
    """MetricsLogger image/histogram parity (reference train.py:421-441):
    PNG artifacts + JSONL hist records exist and reconstruct the data."""
    import json

    from priordepth_gaussiansplatting_tpu.utils.logging import MetricsLogger

    model_path = str(tmp_path)
    lg = MetricsLogger(model_path)
    img = np.linspace(0, 1, 3 * 8 * 8, dtype=np.float32).reshape(3, 8, 8)
    lg.image("test_view_r0/render", img, 100)
    vals = np.concatenate([np.zeros(10), np.ones(30)])
    lg.histogram("scene/opacity_histogram", vals, 100, bins=4)
    lg.close()

    pngs = list((tmp_path / "tb_images").glob("*.png"))
    assert len(pngs) == 1 and "100" in pngs[0].name
    from PIL import Image
    arr = np.asarray(Image.open(pngs[0]))
    assert arr.shape == (8, 8, 3)

    events = [json.loads(l) for l in
              (tmp_path / "events.jsonl").read_text().splitlines()]
    hists = [e for e in events if "hist" in e]
    assert len(hists) == 1
    h = hists[0]["hist"]
    assert h["n"] == 40 and sum(h["counts"]) == 40
    assert abs(h["mean"] - 0.75) < 1e-6
    imgs = [e for e in events if "image" in e]
    assert len(imgs) == 1


def test_eval_image_compiles_once_across_exposure_ids():
    """With train_test_exp, every eval view has a distinct exposure row;
    routing it through the traced exposure_idx leaf keeps eval_image at
    ONE compiled program (r03 advisor finding) while still applying the
    per-view exposure affine."""
    import dataclasses

    from priordepth_gaussiansplatting_tpu.models import gaussians as gm
    from priordepth_gaussiansplatting_tpu.train import step as step_lib
    from priordepth_gaussiansplatting_tpu.utils import testing as T

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (32, 3)).astype(np.float32)
    cols = rng.rand(32, 3).astype(np.float32)
    state = gm.create_from_points(pts, cols, num_images=3, capacity=64)
    # distinct exposure rows so the applied affine differs per view
    expo = np.tile(np.eye(3, 4, dtype=np.float32)[None], (3, 1, 1))
    expo[1, :3, :3] *= 0.5
    expo[2, :3, 3] = 0.25
    state = dataclasses.replace(
        state, params=state.params.replace(exposure=jnp.asarray(expo)))

    cams = [dataclasses.replace(
        T.look_at_camera((0, 0, -2.5), width=32, height=32, exposure_id=i),
        image=jnp.zeros((3, 32, 32)), image_name=f"v{i}") for i in range(3)]
    bg = jnp.zeros(3)
    before = step_lib._eval_render._cache_size()
    outs = [step_lib.eval_image(c, state, bg, use_trained_exp=True,
                                backend="oracle") for c in cams]
    added = step_lib._eval_render._cache_size() - before
    assert added == 1, f"eval_image compiled {added} programs for 3 views"
    # exposure rows actually differ in the rendered output
    r0, r1, r2 = (np.asarray(o["render"]) for o in outs)
    assert not np.allclose(r0, r1)
    assert not np.allclose(r0, r2)
