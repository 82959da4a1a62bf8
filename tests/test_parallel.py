"""Multi-chip sharding on the 8-device CPU mesh: the sharded train step
runs, updates parameters, agrees with the single-device step on a 1×1 mesh,
and the graft-entry dryrun passes."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from priordepth_gaussiansplatting_tpu.models import gaussians as gm
from priordepth_gaussiansplatting_tpu.parallel import mesh as mesh_lib
from priordepth_gaussiansplatting_tpu.parallel import step as pstep
from priordepth_gaussiansplatting_tpu.train import optim, step as step_lib
from priordepth_gaussiansplatting_tpu.utils import testing as T
from priordepth_gaussiansplatting_tpu.utils.config import (OptimizationConfig,
                                                           PipelineConfig)


def _scene(n=32, capacity=64, w=32, h=32, n_cams=1):
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    state = gm.create_from_points(pts, cols, num_images=4, capacity=capacity)
    cams = []
    for i in range(n_cams):
        c = T.look_at_camera((0.2 * i, 0, -2.5), width=w, height=h,
                             exposure_id=0)
        img = jnp.asarray(rng.rand(3, h, w).astype(np.float32))
        cams.append(dataclasses.replace(c, image=img))
    return state, cams


def test_requires_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("n_data,n_gauss", [(2, 1), (2, 2), (4, 2)])
def test_sharded_step_runs_and_updates(n_data, n_gauss):
    mesh = mesh_lib.make_mesh(n_data, n_gauss)
    state, cams = _scene(n_cams=n_data)
    opt_state = optim.init_adam(state.params)
    step = pstep.make_sharded_train_step(
        OptimizationConfig(), PipelineConfig(backend="oracle"), mesh)
    new_state, new_opt, m = step(state, opt_state,
                                 pstep.stack_cameras(cams),
                                 jnp.asarray(1), jax.random.PRNGKey(0),
                                 jnp.zeros(3))
    assert np.isfinite(float(m["loss"]))
    assert int(m["n_active"]) == 32
    assert float(jnp.max(jnp.abs(new_state.params.xyz))) > 0
    assert int(new_opt.count) == 1


def test_sharded_matches_single_device_step():
    """1×1 mesh sharded step ≡ plain train step (same math, same camera)."""
    state, cams = _scene(n_cams=1)
    opt_state = optim.init_adam(state.params)
    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(backend="oracle")

    mesh = mesh_lib.make_mesh(1, 1)
    sh_step = pstep.make_sharded_train_step(opt_cfg, pipe_cfg, mesh)
    s1, o1, m1 = sh_step(jax.tree.map(jnp.array, state),
                         jax.tree.map(jnp.array, opt_state),
                         pstep.stack_cameras(cams), jnp.asarray(1),
                         jax.random.PRNGKey(0), jnp.zeros(3))

    fns = step_lib.make_train_step(opt_cfg, pipe_cfg)
    s2, o2, m2 = fns.step(jax.tree.map(jnp.array, state),
                          jax.tree.map(jnp.array, opt_state), cams[0],
                          jnp.asarray(1), jax.random.PRNGKey(0),
                          jnp.zeros(3))
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    np.testing.assert_allclose(np.asarray(s1.params.xyz),
                               np.asarray(s2.params.xyz), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.xyz_gradient_accum),
                               np.asarray(s2.xyz_gradient_accum), atol=1e-5)


def test_gauss_sharding_matches_unsharded_loss():
    """Sharding the Gaussians across 4 ranks must not change the image/loss."""
    state, cams = _scene(n=32, capacity=64, n_cams=1)
    opt_state = optim.init_adam(state.params)
    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(backend="oracle")

    losses = []
    for n_gauss in (1, 4):
        mesh = mesh_lib.make_mesh(1, n_gauss)
        step = pstep.make_sharded_train_step(opt_cfg, pipe_cfg, mesh)
        _, _, m = step(jax.tree.map(jnp.array, state),
                       jax.tree.map(jnp.array, opt_state),
                       pstep.stack_cameras(cams), jnp.asarray(1),
                       jax.random.PRNGKey(0), jnp.zeros(3))
        losses.append(float(m["loss"]))
    assert losses[0] == pytest.approx(losses[1], rel=1e-5)


@pytest.mark.slow
def test_graft_dryrun():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_tile_sharded_matches_unsharded():
    """SP-analog: sharding the tile grid over 4 ranks must reproduce the
    unsharded pallas loss and parameter updates."""
    state, cams = _scene(n=32, capacity=64, w=48, h=48, n_cams=1)
    opt_state = optim.init_adam(state.params)
    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(backend="pallas")

    results = []
    for n_gauss, tile_shard in ((1, False), (4, True)):
        mesh = mesh_lib.make_mesh(1, n_gauss)
        step = pstep.make_sharded_train_step(opt_cfg, pipe_cfg, mesh,
                                             tile_shard=tile_shard)
        s, o, m = step(jax.tree.map(jnp.array, state),
                       jax.tree.map(jnp.array, opt_state),
                       pstep.stack_cameras(cams), jnp.asarray(1),
                       jax.random.PRNGKey(0), jnp.zeros(3))
        results.append((float(m["loss"]), np.asarray(s.params.xyz),
                        np.asarray(s.xyz_gradient_accum)))
    assert results[0][0] == pytest.approx(results[1][0], rel=1e-5)
    np.testing.assert_allclose(results[1][1], results[0][1], atol=1e-6)
    np.testing.assert_allclose(results[1][2], results[0][2], atol=1e-4)


def test_initialize_multihost_single_process_noop(monkeypatch):
    """Without coordinator env/args this is a single-process run: the
    helper must return False and NOT call jax.distributed.initialize."""
    from priordepth_gaussiansplatting_tpu.parallel import mesh as mesh_lib
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    for var in ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS"):
        monkeypatch.delenv(var, raising=False)
    assert mesh_lib.initialize_multihost() is False
    assert not called


def test_initialize_multihost_forwards_args(monkeypatch):
    from priordepth_gaussiansplatting_tpu.parallel import mesh as mesh_lib
    called = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: called.append(kw))
    assert mesh_lib.initialize_multihost("10.0.0.1:1234", 2, 1) is True
    assert called == [{"coordinator_address": "10.0.0.1:1234",
                       "num_processes": 2, "process_id": 1}]


def test_sharded_training_converges():
    """Multi-iteration DP training on the mesh: rendering its own target
    from a fixed camera set must drive the loss down monotonically-ish
    (smoke for optimizer + psum grads over many steps, not just one)."""
    mesh = mesh_lib.make_mesh(2, 2)
    state, cams = _scene(n=24, capacity=32, n_cams=2)
    opt_state = optim.init_adam(state.params)
    step = pstep.make_sharded_train_step(
        OptimizationConfig(), PipelineConfig(backend="oracle"), mesh)
    batch = pstep.stack_cameras(cams)
    losses = []
    key = jax.random.PRNGKey(0)
    for it in range(1, 13):
        key, k = jax.random.split(key)
        state, opt_state, m = step(state, opt_state, batch,
                                   jnp.asarray(it), k, jnp.zeros(3))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    # Random targets aren't fittable fast; require a steady downward trend.
    assert losses[-1] < losses[0] * 0.97, losses
    assert (np.diff(losses) < 0).mean() > 0.8, losses


def test_mixed_resolution_dp_matches_native_losses():
    """pad_camera_batch: cameras of DIFFERENT resolutions/intrinsics train
    in one DP batch, and the batch loss equals the mean of each camera's
    native-resolution single-device loss (zero-pad + masked losses are
    exact because the SSIM conv is zero-same-padded)."""
    rng = np.random.RandomState(3)
    pts = rng.uniform(-0.8, 0.8, (24, 3)).astype(np.float32)
    cols = rng.rand(24, 3).astype(np.float32)
    state = gm.create_from_points(pts, cols, num_images=4, capacity=32)
    cams = []
    for i, (w, h) in enumerate(((48, 32), (32, 48))):
        c = T.look_at_camera((0.2 * i, 0, -2.5), width=w, height=h,
                             exposure_id=0)
        img = jnp.asarray(rng.rand(3, h, w).astype(np.float32))
        cams.append(dataclasses.replace(c, image=img))

    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(backend="oracle")

    # Native per-camera losses via the single-device step.
    fns = step_lib.make_train_step(opt_cfg, pipe_cfg)
    native = []
    for cam in cams:
        st = jax.tree.map(jnp.array, state)
        _, _, m = fns.step(st, optim.init_adam(st.params), cam,
                           jnp.asarray(1), jax.random.PRNGKey(0),
                           jnp.zeros(3))
        native.append(float(m["loss"]))

    mesh = mesh_lib.make_mesh(2, 1)
    step = pstep.make_sharded_train_step(opt_cfg, pipe_cfg, mesh)
    batch = pstep.pad_camera_batch(cams)
    st = jax.tree.map(jnp.array, state)
    _, _, m = step(st, optim.init_adam(st.params), batch, jnp.asarray(1),
                   jax.random.PRNGKey(0), jnp.zeros(3))
    assert float(m["loss"]) == pytest.approx(np.mean(native), rel=2e-5)


# ---------------------------------------------------------------- restore
def _tiny_trainer(tmp_path, name, mesh=None, iters=6):
    from tests.test_data import _make_blender_scene
    from priordepth_gaussiansplatting_tpu.data.dataset import Scene
    from priordepth_gaussiansplatting_tpu.train.trainer import Trainer
    from priordepth_gaussiansplatting_tpu.utils.config import ModelConfig

    root = str(tmp_path / f"{name}_scene")
    out = str(tmp_path / f"{name}_out")
    _make_blender_scene(root, n_frames=4, size=32)
    model_cfg = ModelConfig(source_path=root, model_path=out,
                            white_background=True)
    opt_cfg = OptimizationConfig(iterations=iters, position_lr_max_steps=iters,
                                 densify_from_iter=2, densify_until_iter=iters,
                                 densification_interval=3,
                                 opacity_reset_interval=1000)
    pipe_cfg = PipelineConfig(backend="oracle")
    scene = Scene(root, out, white_background=True, shuffle=True)
    xyz, cols, nrm = scene.info.point_cloud
    scene.info = scene.info.__class__(
        point_cloud=(xyz[:128], cols[:128], nrm[:128]),
        train_cameras=scene.info.train_cameras,
        test_cameras=scene.info.test_cameras,
        nerf_normalization=scene.info.nerf_normalization,
        ply_path=scene.info.ply_path,
        is_nerf_synthetic=True)
    tr = Trainer(model_cfg, opt_cfg, pipe_cfg, scene, quiet=True, mesh=mesh,
                 init_capacity=512)
    return tr, out


def _shard_counts(state, n_gauss):
    act = np.asarray(state.active)
    return act.reshape(n_gauss, -1).sum(axis=1)


def test_sharded_checkpoint_save_restore_continues(tmp_path):
    """Train sharded -> checkpoint -> restore into a NEW sharded trainer ->
    continue training. Shard active counts stay balanced and the loss keeps
    improving (VERDICT r03 #5)."""
    import os
    mesh = mesh_lib.make_mesh(2, 2)
    tr1, out = _tiny_trainer(tmp_path, "a", mesh=mesh, iters=6)
    tr1.train(iterations=6, test_iterations=(), save_iterations=(),
              checkpoint_iterations=(6,))
    path = os.path.join(out, "chkpnt6.pkl")
    assert os.path.exists(path)
    loss1 = tr1.ema_loss

    tr2, _ = _tiny_trainer(tmp_path, "b", mesh=mesh, iters=12)
    tr2.restore(path)
    assert tr2.iteration == 6
    counts = _shard_counts(tr2.state, 2)
    assert abs(int(counts[0]) - int(counts[1])) <= 1, counts
    tr2.train(iterations=12, test_iterations=(), save_iterations=())
    assert np.isfinite(tr2.ema_loss)
    # params stayed finite through the resumed sharded steps
    assert np.isfinite(np.asarray(tr2.state.params.xyz)).all()
    # resumed training continues to fit (no blow-up vs the saved point)
    assert tr2.ema_loss < max(2.0 * loss1, 0.5)


def test_unsharded_checkpoint_restores_balanced_into_mesh(tmp_path):
    """A checkpoint written WITHOUT a mesh (active rows packed at the
    front) must interleave across shards on restore — naive sharding puts
    every live row on shard 0 (VERDICT r03 weak #4)."""
    import os
    tr1, out = _tiny_trainer(tmp_path, "c", mesh=None, iters=5)
    tr1.checkpoint_compact = True  # the proof-run path
    tr1.train(iterations=5, test_iterations=(), save_iterations=(),
              checkpoint_iterations=(5,))
    path = os.path.join(out, "chkpnt5.pkl")

    mesh = mesh_lib.make_mesh(1, 4)
    tr2, _ = _tiny_trainer(tmp_path, "d", mesh=mesh, iters=8)
    tr2.restore(path)
    counts = _shard_counts(tr2.state, 4)
    assert counts.min() > 0, f"starved shard: {counts}"
    assert counts.max() - counts.min() <= 1, counts
    tr2.train(iterations=8, test_iterations=(), save_iterations=())
    assert np.isfinite(tr2.ema_loss)
    assert np.isfinite(np.asarray(tr2.state.params.xyz)).all()


def test_thesis_events_under_gauss_sharding(tmp_path):
    """inject_noise + run_floating_prune on a mesh-sharded trainer: the
    events gather the state, run the host loops, and re-place shardings;
    a sharded step must still run afterwards (VERDICT r03 weak #5)."""
    mesh = mesh_lib.make_mesh(1, 2)
    tr, _ = _tiny_trainer(tmp_path, "e", mesh=mesh, iters=4)
    tr.train(iterations=4, test_iterations=(), save_iterations=())
    n0 = int(np.asarray(tr.state.num_active))
    tr.inject_noise()
    tr._replace_sharded()
    assert int(np.asarray(tr.state.num_active)) == n0 + 6
    tr.run_floating_prune()
    tr._replace_sharded()
    assert int(np.asarray(tr.state.num_active)) <= n0 + 6
    # one more sharded step still runs on the re-placed state
    cam = tr.pick_camera_batch()
    tr.key, k = jax.random.split(tr.key)
    tr.state, tr.opt_state, m = tr.fns.step(
        tr.state, tr.opt_state, cam, jnp.asarray(5), k, tr.bg)
    assert np.isfinite(float(m["loss"]))
