"""End-to-end: synthetic Blender scene → Trainer → snapshot → reload →
render; checkpoint save/restore round-trip; network-GUI protocol loopback."""

import json
import os
import socket
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # shared 85s "trained" fixture

from priordepth_gaussiansplatting_tpu.data.dataset import Scene
from priordepth_gaussiansplatting_tpu.ops.render import render
from priordepth_gaussiansplatting_tpu.train import checkpoint as ckpt
from priordepth_gaussiansplatting_tpu.train.trainer import Trainer
from priordepth_gaussiansplatting_tpu.utils.config import (ModelConfig,
                                                           OptimizationConfig,
                                                           PipelineConfig)
from tests.test_data import _make_blender_scene


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene") / "lego")
    out = str(tmp_path_factory.mktemp("out"))
    _make_blender_scene(root, n_frames=4, size=32)
    model_cfg = ModelConfig(source_path=root, model_path=out,
                            white_background=True)
    opt_cfg = OptimizationConfig(iterations=60, position_lr_max_steps=60,
                                 densify_from_iter=10, densify_until_iter=50,
                                 densification_interval=20,
                                 opacity_reset_interval=1000)
    pipe_cfg = PipelineConfig(backend="oracle")
    scene = Scene(root, out, white_background=True, shuffle=True)
    # shrink: the blender random init is 100k points — subsample for speed
    xyz, cols, nrm = scene.info.point_cloud
    scene.info = scene.info.__class__(
        point_cloud=(xyz[:256], cols[:256], nrm[:256]),
        train_cameras=scene.info.train_cameras,
        test_cameras=scene.info.test_cameras,
        nerf_normalization=scene.info.nerf_normalization,
        ply_path=scene.info.ply_path,
        is_nerf_synthetic=True)
    trainer = Trainer(model_cfg, opt_cfg, pipe_cfg, scene, quiet=True)
    result = trainer.train(test_iterations={60}, save_iterations={60},
                           checkpoint_iterations={60})
    return trainer, result, out


def test_training_ran_and_loss_finite(trained):
    trainer, result, out = trained
    assert result["iterations"] == 60
    assert np.isfinite(result["final_loss"])
    assert result["n_active"] > 0


def test_snapshot_artifacts_written(trained):
    _, _, out = trained
    assert os.path.exists(
        os.path.join(out, "point_cloud", "iteration_60", "point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "exposure.json"))
    assert os.path.exists(os.path.join(out, "cfg_args"))
    assert os.path.exists(os.path.join(out, "input.ply"))
    assert os.path.exists(os.path.join(out, "cameras.json"))
    with open(os.path.join(out, "cameras.json")) as f:
        cams = json.load(f)
    assert len(cams) == 4
    assert {"id", "img_name", "position", "rotation", "fx", "fy"} \
        <= set(cams[0])


def test_snapshot_reload_renders_identically(trained):
    trainer, _, out = trained
    state2 = ckpt.load_model_snapshot(out, iteration=-1)
    cam = trainer.scene.train_cameras[0]
    bg = trainer.bg
    img1 = render(cam, trainer.state, bg, backend="oracle")["render"]
    img2 = render(cam, state2, bg, backend="oracle")["render"]
    np.testing.assert_allclose(np.asarray(img2), np.asarray(img1), atol=1e-5)


def test_checkpoint_roundtrip(trained):
    trainer, _, out = trained
    path = os.path.join(out, "chkpnt60.pkl")
    assert os.path.exists(path)
    state, opt_state, it = ckpt.load_checkpoint(path)
    assert it == 60
    np.testing.assert_allclose(np.asarray(state.params.xyz),
                               np.asarray(trainer.state.params.xyz))
    np.testing.assert_allclose(np.asarray(opt_state.mu.xyz),
                               np.asarray(trainer.opt_state.mu.xyz))
    assert int(opt_state.count) == int(trainer.opt_state.count)


def test_compact_checkpoint_roundtrip_and_finite_padding(trained, tmp_path):
    """Compact checkpoints (active rows only) must reload exactly AND pad
    the inactive tail with finite-activation fills — an all-zero padding
    quaternion normalises to NaN and poisons the first resumed gradient
    step (r04 regression)."""
    trainer, _, _ = trained
    path = str(tmp_path / "compact.pkl")
    ckpt.save_checkpoint(path, trainer.state, trainer.opt_state, 60,
                         compact=True)
    state, opt_state, it = ckpt.load_checkpoint(path)
    assert it == 60
    assert state.capacity == trainer.state.capacity
    act0 = np.asarray(trainer.state.active)
    act1 = np.asarray(state.active)
    assert act0.sum() == act1.sum()
    # active rows identical (compaction may reorder only if the source mask
    # had holes; compare as sorted sets via lexsort on xyz)
    a = np.asarray(trainer.state.params.xyz)[act0]
    b = np.asarray(state.params.xyz)[act1]
    np.testing.assert_allclose(np.sort(a, axis=0), np.sort(b, axis=0))
    np.testing.assert_allclose(np.asarray(opt_state.mu.xyz)[act1],
                               np.asarray(trainer.opt_state.mu.xyz)[act0])
    # every activation finite across the FULL capacity, including padding
    for arr in (state.get_scaling(), state.get_rotation(),
                state.get_opacity()):
        assert np.isfinite(np.asarray(arr)).all()


def test_eval_history_recorded(trained):
    trainer, _, _ = trained
    assert trainer.history
    assert "train" in trainer.history[-1]
    assert np.isfinite(trainer.history[-1]["train"]["psnr"])


def test_network_gui_roundtrip(trained):
    """Drive the byte protocol end to end against a live listener."""
    from priordepth_gaussiansplatting_tpu.viewer.network_gui import NetworkGUI
    trainer, _, _ = trained
    gui = NetworkGUI("127.0.0.1", 0)
    port = gui.listener.getsockname()[1]

    cam = trainer.scene.train_cameras[0]
    w2c = np.asarray(cam.world_view)
    # Encode in the wire convention (torch row-vector + column sign flips).
    view = w2c.T.copy()
    view[:, 1] *= -1
    view[:, 2] *= -1
    proj = np.asarray(cam.full_proj).T.copy()
    proj[:, 1] *= -1
    msg = {
        "resolution_x": cam.width, "resolution_y": cam.height,
        "train": True, "fov_y": cam.fovy, "fov_x": cam.fovx,
        "z_near": 0.01, "z_far": 100.0, "shs_python": False,
        "rot_scale_python": False, "keep_alive": False,
        "scaling_modifier": 1.0,
        "view_matrix": view.flatten().tolist(),
        "view_projection_matrix": proj.flatten().tolist(),
    }
    client = socket.create_connection(("127.0.0.1", port))
    payload = json.dumps(msg).encode()
    client.sendall(struct.pack("<I", len(payload)) + payload)

    gui.poll(trainer.state, trainer.bg, source_path="/src/path")

    n_img = cam.width * cam.height * 3
    buf = b""
    while len(buf) < n_img + 4:
        chunk = client.recv(65536)
        if not chunk:
            break
        buf += chunk
    img = np.frombuffer(buf[:n_img], np.uint8).reshape(cam.height,
                                                       cam.width, 3)
    (verify_len,) = struct.unpack("<I", buf[n_img:n_img + 4])
    verify = client.recv(verify_len).decode() if len(buf) == n_img + 4 \
        else buf[n_img + 4:n_img + 4 + verify_len].decode()
    assert verify == "/src/path"
    # The GUI image matches a direct render.
    want = np.asarray(
        jnp.clip(render(cam, trainer.state, trainer.bg)["render"], 0, 1)
        * 255).astype(np.uint8).transpose(1, 2, 0)
    np.testing.assert_array_equal(img, want)
    client.close()
    gui.close()


def test_thesis_events_fire(tmp_path):
    """Noise injection at its iteration adds 6 Gaussians; the floating-prune
    loop runs (and no-ops gracefully without depth priors)."""
    root = str(tmp_path / "scene")
    _make_blender_scene(root, n_frames=2, size=32)
    model_cfg = ModelConfig(source_path=root, model_path="",
                            white_background=True)
    opt_cfg = OptimizationConfig(iterations=45, position_lr_max_steps=45,
                                 densify_from_iter=1000,
                                 densify_until_iter=0,
                                 opacity_reset_interval=10_000,
                                 noise_injection_iter=30,
                                 floating_prune_iter=40)
    scene = Scene(root, "", white_background=True)
    xyz, cols, nrm = scene.info.point_cloud
    scene.info = scene.info.__class__(
        point_cloud=(xyz[:64], cols[:64], nrm[:64]),
        train_cameras=scene.info.train_cameras,
        test_cameras=scene.info.test_cameras,
        nerf_normalization=scene.info.nerf_normalization,
        ply_path=scene.info.ply_path, is_nerf_synthetic=True)
    trainer = Trainer(model_cfg, opt_cfg, PipelineConfig(backend="oracle"),
                      scene, quiet=True)
    n0 = None
    seen = {}

    def hook(tr, it, m):
        nonlocal n0
        if it == 29:
            n0 = int(tr.state.num_active)
        if it == 31:
            seen["after_inject"] = int(tr.state.num_active)

    trainer.train(test_iterations=(), save_iterations=(), on_iteration=hook)
    assert seen["after_inject"] == n0 + 6


def test_render_cli_end_to_end(trained, tmp_path):
    """The render.py CLI renders a saved model into the reference artifact
    layout, and metrics.py computes results.json over it."""
    import sys
    trainer, _, out = trained
    sys.argv_backup = list(sys.argv)
    import render as render_cli
    render_cli.main(["-m", out, "-s", trainer.model_cfg.source_path,
                     "--white_background", "--skip_test"])
    rdir = os.path.join(out, "train", "ours_60", "renders")
    assert os.path.isdir(rdir) and len(os.listdir(rdir)) == 4
    gdir = os.path.join(out, "train", "ours_60", "gt")
    assert len(os.listdir(gdir)) == 4
    # evaluate with metrics.py over the train split pretending it's test
    import shutil
    shutil.copytree(os.path.join(out, "train"),
                    os.path.join(out, "test"), dirs_exist_ok=True)
    import metrics as metrics_cli
    res = metrics_cli.evaluate([out])
    key = list(res[out].keys())[0]
    assert np.isfinite(res[out][key]["PSNR"])
    assert 0.0 <= res[out][key]["SSIM"] <= 1.0
    assert os.path.exists(os.path.join(out, "results.json"))
    assert os.path.exists(os.path.join(out, "per_view.json"))


def test_forced_overflow_grows_or_aborts(tmp_path):
    """A run whose every frame overflows the pinned pair capacity must not
    silently free-wheel (VERDICT r04 weak #2): the trainer counts the
    per-iteration `skipped` metric and auto-grows the pair capacity."""
    root = str(tmp_path / "lego")
    out = str(tmp_path / "out")
    _make_blender_scene(root, n_frames=2, size=64)
    scene = Scene(root, out, white_background=True, shuffle=False)
    # Dense random cloud: ≥6000 visible (Gaussian, tile) pairs per frame
    # guarantees overflow of the 4096-pair pinned floor every iteration.
    rng = np.random.RandomState(7)
    xyz = rng.uniform(-0.8, 0.8, (6000, 3)).astype(np.float32)
    cols = rng.rand(6000, 3).astype(np.float32)
    scene.info = scene.info.__class__(
        point_cloud=(xyz, cols, np.zeros_like(xyz)),
        train_cameras=scene.info.train_cameras,
        test_cameras=scene.info.test_cameras,
        nerf_normalization=scene.info.nerf_normalization,
        ply_path=scene.info.ply_path,
        is_nerf_synthetic=True)
    model_cfg = ModelConfig(source_path=root, model_path="",
                            white_background=True)
    opt_cfg = OptimizationConfig(iterations=60, position_lr_max_steps=60,
                                 densify_from_iter=1000,
                                 densify_until_iter=0,
                                 opacity_reset_interval=10_000)
    trainer = Trainer(model_cfg, opt_cfg, PipelineConfig(backend="pallas"),
                      scene, quiet=True, pin_pair_capacity=4096)
    trainer.max_consecutive_skips = 10
    trainer.train(iterations=60, test_iterations=(), save_iterations=())
    assert trainer.total_skips > 0, "scene failed to overflow 4096 pairs"
    assert trainer.pair_capacity > 4096, \
        "overflow skips did not grow the pinned pair capacity"


def test_consecutive_nonfinite_skips_abort():
    """Non-finite-loss skips must abort loudly after the cap, not
    free-wheel (the step keeps old params on every skip)."""
    trainer = Trainer.__new__(Trainer)  # no scene needed for the guard
    trainer.consecutive_skips = 0
    trainer.total_skips = 0
    trainer.max_consecutive_skips = 5
    trainer.pair_capacity = None
    trainer._pin_pair_capacity = None
    for _ in range(4):
        trainer._observe_skip(10, 1, 0, float("nan"))
    with pytest.raises(RuntimeError, match="non-finite"):
        trainer._observe_skip(11, 1, 0, float("nan"))
