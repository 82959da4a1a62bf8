"""Depth-prior floating-object pruning (train/prune.py): least-squares,
circular table, prune criteria, the full loop, and the noise-injection
robustness experiment (SURVEY.md §5.3 — the reference's fault-injection)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from priordepth_gaussiansplatting_tpu.models import gaussians as gm
from priordepth_gaussiansplatting_tpu.ops.render import render
from priordepth_gaussiansplatting_tpu.train import optim
from priordepth_gaussiansplatting_tpu.train import prune as pr
from priordepth_gaussiansplatting_tpu.utils import testing as T


def test_least_squares_fit_recovers_line():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(200).astype(np.float32) * 10)
    y = 2.5 * x - 1.25
    mask = jnp.ones(200, bool)
    k, b, ok = pr.least_squares_fit(x, y, mask)
    assert bool(ok)
    assert abs(float(k) - 2.5) < 1e-3
    assert abs(float(b) + 1.25) < 1e-2
    # Degenerate (constant x) falls back to identity.
    k, b, ok = pr.least_squares_fit(jnp.ones(200), y, mask)
    assert not bool(ok)


def test_feature_table_circular():
    t = pr.FeatureTable.empty(8)
    pairs = jnp.arange(10, dtype=jnp.float32).reshape(5, 2)
    t = pr.update_table(t, pairs, jnp.ones(5, bool))
    assert int(t.count) == 5 and int(t.index) == 5
    t = pr.update_table(t, pairs + 100, jnp.ones(5, bool))
    assert int(t.count) == 8
    assert int(t.index) == 2  # wrapped
    # Invalid rows are not appended.
    t2 = pr.update_table(pr.FeatureTable.empty(8), pairs,
                         jnp.zeros(5, bool))
    assert int(t2.count) == 0


def _scene_with_floater():
    """Background wall of Gaussians at z=0 + one floater at z=-1.
    Camera at z=-2 → wall depth 2, floater depth 1."""
    rng = np.random.RandomState(1)
    n_bg = 30
    pts = np.concatenate([
        np.concatenate([rng.uniform(-0.6, 0.6, (n_bg, 2)),
                        np.zeros((n_bg, 1))], axis=1),
        np.array([[0.0, 0.0, -1.0]]),          # the floater
    ]).astype(np.float32)
    cols = np.concatenate([np.full((n_bg, 3), 0.5),
                           np.array([[1.0, 0.0, 0.0]])]).astype(np.float32)
    st = gm.create_from_points(pts, cols, num_images=1, capacity=64)
    # Opaque, moderately sized.
    op = np.full((64, 1), 3.0, np.float32)  # sigmoid ~ 0.95
    scal = np.full((64, 3), np.log(0.15), np.float32)
    st = st.replace(params=st.params.replace(
        opacity=jnp.asarray(op), scaling=jnp.asarray(scal)))
    return st, n_bg


def test_floating_object_prune_removes_floater_keeps_wall():
    W = H = 64
    st, n_bg = _scene_with_floater()
    opt = optim.init_adam(st.params)
    # Mono prior agrees with the wall: invdepth = 1/2 everywhere.
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)
    cam = dataclasses.replace(cam, invdepth=jnp.full((H, W), 0.5),
                              depth_reliable=True)
    out = render(cam, st, jnp.zeros(3), backend="oracle")
    table = pr.FeatureTable.empty(1024)
    st2, opt2, table, n_del = pr.prune_view(
        st, opt, table, cam, out["invdepth"], out["radii"],
        cam_extent=0.5)
    assert int(n_del) >= 1
    active = np.asarray(st2.active)
    assert not active[n_bg]              # floater removed
    assert active[:n_bg].sum() >= n_bg - 2   # wall survives


def test_prune_loop_terminates_and_cleans():
    W = H = 64
    st, n_bg = _scene_with_floater()
    opt = optim.init_adam(st.params)
    cams = []
    for i, eye in enumerate([(-0.3, 0, -2.0), (0.3, 0, -2.0)]):
        c = T.look_at_camera(eye, width=W, height=H)
        cams.append(dataclasses.replace(
            c, invdepth=jnp.full((H, W), 0.5), depth_reliable=True))

    def render_fn(cam, state):
        out = render(cam, state, jnp.zeros(3), backend="oracle")
        return out["invdepth"], out["radii"]

    st2, opt2, info = pr.prune_loop(st, opt, cams, render_fn,
                                    cam_extent=0.5,
                                    rng=np.random.RandomState(0))
    assert info["total_deleted"] >= 1
    assert info["epochs"] < 1000
    assert not bool(st2.active[n_bg])


def test_noise_injection_then_prune_recovers():
    """The reference's robustness experiment: inject floaters at z=15, then
    verify the pruner removes them (expreiment.md:2-15 semantics)."""
    W = H = 64
    st, n_bg = _scene_with_floater()
    # Remove the handcrafted floater first: keep only the wall.
    act = np.asarray(st.active).copy()
    act[n_bg] = False
    st = st.replace(active=jnp.asarray(act))
    opt = optim.init_adam(st.params)

    st2, opt2, dst = pr.inject_noise_gaussians(
        st, opt, jax.random.PRNGKey(0), cam_extent=1.0)
    assert int(st2.num_active) == int(st.num_active) + 6
    dst = np.asarray(dst)
    assert (np.asarray(st2.params.xyz)[dst][:, 2] == 15.0).all()
    # injected opacity logit in [4, 9) -> near-opaque
    assert (np.asarray(st2.params.opacity)[dst] >= 4.0).all()

    # Camera BEHIND the wall looking at the noise cloud: z=15 floaters are
    # within its near field with a mono prior that contradicts them.
    cam = T.look_at_camera((0, 0, 5.0), target=(0, 0, 20.0),
                           width=W, height=H)
    cam = dataclasses.replace(cam, invdepth=jnp.full((H, W), 1.0 / 40.0),
                              depth_reliable=True)
    out = render(cam, st2, jnp.zeros(3), backend="oracle")
    table = pr.FeatureTable.empty(1024)
    st3, _, _, n_del = pr.prune_view(
        st2, opt2, table, cam, out["invdepth"], out["radii"],
        cam_extent=0.2)
    # At least most of the injected floaters get pruned.
    removed = (~np.asarray(st3.active)[dst]).sum()
    assert removed >= 4, removed


def test_gs_adjustment_moves_floater_to_prior_depth():
    W = H = 64
    st, n_bg = _scene_with_floater()
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)
    cam = dataclasses.replace(cam, invdepth=jnp.full((H, W), 0.5),
                              depth_reliable=True)
    out = render(cam, st, jnp.zeros(3), backend="oracle")
    st2, n_moved = pr.adjust_gaussians_to_depth(
        jax.tree.map(jnp.array, st), cam, out["invdepth"], out["radii"],
        cam_extent=0.5)
    assert int(n_moved) >= 1
    # The floater (was z=-1, depth 1) moves to the prior depth (2) -> z≈0.
    z = float(st2.params.xyz[n_bg, 2])
    assert abs(z - 0.0) < 0.15, z
