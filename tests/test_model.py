"""GaussianState pytree, KNN init, band masking, capacity growth,
densify/prune/reset-opacity, and optimizer-moment surgery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from priordepth_gaussiansplatting_tpu.models import densify as densify_ops
from priordepth_gaussiansplatting_tpu.models import gaussians as gm
from priordepth_gaussiansplatting_tpu.ops.knn import mean_knn_sq_dist
from priordepth_gaussiansplatting_tpu.train import optim


def _mk_state(n=20, capacity=64, seed=0, num_images=3):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n, 3).astype(np.float32)
    cols = rng.rand(n, 3).astype(np.float32)
    return gm.create_from_points(pts, cols, num_images=num_images,
                                 capacity=capacity, spatial_lr_scale=2.0)


def test_knn_matches_numpy_bruteforce():
    rng = np.random.RandomState(0)
    pts = rng.randn(50, 3).astype(np.float32)
    got = np.asarray(mean_knn_sq_dist(jnp.asarray(pts), k=3, chunk=16))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_create_from_points_matches_reference_init():
    st = _mk_state(n=20, capacity=64)
    assert st.capacity == 64
    assert int(st.num_active) == 20
    # Opacity init 0.1 (gaussian_model.py:168).
    np.testing.assert_allclose(np.asarray(st.get_opacity())[:20], 0.1,
                               atol=1e-5)
    # Padding rows render as opacity 0.
    np.testing.assert_allclose(np.asarray(st.get_opacity())[20:], 0.0)
    # Scale = sqrt(mean knn dist²), isotropic (gaussian_model.py:160-162).
    pts = np.asarray(st.params.xyz[:20])
    d2 = np.maximum(np.asarray(mean_knn_sq_dist(jnp.asarray(pts))), 1e-7)
    np.testing.assert_allclose(np.asarray(st.get_scaling())[:20, 0],
                               np.sqrt(d2), rtol=1e-4)
    # Exposure: identity affine per image (gaussian_model.py:175-178).
    assert st.params.exposure.shape == (3, 3, 4)
    np.testing.assert_allclose(np.asarray(st.params.exposure[0]),
                               np.eye(3, 4), atol=1e-7)


def test_sh_band_masking_tracks_active_degree():
    st = _mk_state()
    st = st.replace(params=st.params.replace(
        features_rest=jnp.ones_like(st.params.features_rest)))
    f0 = np.asarray(st.get_features())  # flat (C, 3K) channel-minor
    assert (f0[:, 3:] == 0).all()  # degree 0: only DC passes
    st1 = st.oneup_sh_degree()
    f1 = np.asarray(st1.get_features())
    assert (f1[:, 3:12] == 1).all() and (f1[:, 12:] == 0).all()
    st3 = st1.oneup_sh_degree().oneup_sh_degree()
    assert (np.asarray(st3.get_features()) != 0).any()
    # Saturates at max degree.
    st4 = st3.oneup_sh_degree()
    assert int(st4.active_sh_degree) == 3


def test_grow_capacity_preserves_rows():
    st = _mk_state(n=20, capacity=32)
    st2 = gm.grow_capacity(st, 128)
    assert st2.capacity == 128
    assert int(st2.num_active) == 20
    np.testing.assert_allclose(np.asarray(st2.params.xyz[:32]),
                               np.asarray(st.params.xyz))


def test_densify_clone_and_split():
    st = _mk_state(n=20, capacity=64)
    opt = optim.init_adam(st.params)
    opt = optim.AdamState(
        mu=jax.tree.map(lambda x: jnp.ones_like(x), opt.mu),
        nu=jax.tree.map(lambda x: jnp.ones_like(x), opt.nu),
        count=opt.count)
    extent = st.spatial_lr_scale
    # Force: rows 0-4 small+high-grad (clone), rows 5-9 big+high-grad (split).
    scaling = np.array(st.params.scaling)
    scaling[:5] = np.log(0.001 * extent)   # below percent_dense*extent = 0.02
    scaling[5:10] = np.log(0.5 * extent)   # above
    st = st.replace(params=st.params.replace(scaling=jnp.asarray(scaling)))
    accum = np.zeros(64, np.float32)
    accum[:10] = 1.0  # avg grad 1.0 >> 2e-4 threshold
    st = st.replace(xyz_gradient_accum=jnp.asarray(accum),
                    denom=jnp.asarray((accum > 0).astype(np.float32)))
    # Snapshot values compared later (densify donates its inputs).
    fdc_before = np.array(st.params.features_dc)
    st2, opt2, info = densify_ops.densify_and_prune(
        st, opt, jax.random.PRNGKey(0), max_grad=2e-4, min_opacity=0.005,
        extent=extent, max_screen_size=0.0)
    assert int(info["n_cloned"]) == 5
    assert int(info["n_split"]) == 5
    assert int(info["n_pruned"]) == 0
    assert int(info["n_active"]) == 30
    # Split parents got scale/1.6 in place.
    np.testing.assert_allclose(np.asarray(st2.get_scaling())[5:10, 0],
                               0.5 * extent / 1.6, rtol=1e-4)
    # Clones are verbatim copies in the first free slots (20..24).
    np.testing.assert_allclose(np.asarray(st2.params.features_dc)[20:25],
                               fdc_before[:5])
    # Moments zeroed for new rows and split parents, kept for untouched rows.
    mu_xyz = np.asarray(opt2.mu.xyz)
    assert (mu_xyz[20:30] == 0).all()
    assert (mu_xyz[5:10] == 0).all()
    assert (mu_xyz[10:20] == 1).all()
    # Stats reset for everyone (densification_postfix semantics).
    assert float(jnp.sum(st2.xyz_gradient_accum)) == 0.0


def test_densify_prune_low_opacity_and_big():
    st = _mk_state(n=20, capacity=32)
    opt = optim.init_adam(st.params)
    op = np.array(st.params.opacity)
    op[:3] = -10.0  # sigmoid ~ 0 < 0.005
    sc = np.full((32, 3), np.log(0.01), np.float32)
    # Row 6: world size above 0.1*extent -> pruned by the (live)
    # world-size term. Row 5's big SCREEN radius must NOT prune: the
    # reference's big_points_vs test is dead code (max_radii2D is zeroed
    # by densification_postfix right before the test — see
    # models/densify.py), and we match that behavior.
    sc[6] = np.log(0.2 * st.spatial_lr_scale)
    st = st.replace(params=st.params.replace(
        opacity=jnp.asarray(op),
        scaling=jnp.asarray(sc)),
        max_radii2d=jnp.zeros(32).at[5].set(50.0))
    st2, _, info = densify_ops.densify_and_prune(
        st, opt, jax.random.PRNGKey(0), max_grad=2e-4, min_opacity=0.005,
        extent=st.spatial_lr_scale, max_screen_size=20.0)
    assert int(info["n_pruned"]) == 4  # rows 0,1,2 (opacity) + row 6 (world)
    active = np.asarray(st2.active)
    assert not active[0] and not active[6] and active[5] and active[4]


def test_densify_capacity_overflow_drops_requests():
    st = _mk_state(n=20, capacity=24)
    opt = optim.init_adam(st.params)
    extent = st.spatial_lr_scale
    st = st.replace(
        params=st.params.replace(
            scaling=jnp.full((24, 3), np.log(0.001 * extent))),
        xyz_gradient_accum=jnp.ones(24), denom=jnp.ones(24))
    st2, _, info = densify_ops.densify_and_prune(
        st, opt, jax.random.PRNGKey(0), max_grad=2e-4, min_opacity=0.005,
        extent=extent, max_screen_size=0.0)
    assert int(info["n_cloned"]) == 4     # only 4 free slots
    assert int(info["n_dropped"]) == 16
    assert int(info["n_active"]) == 24


def test_reset_opacity_clamps_and_zeroes_moments():
    st = _mk_state()
    opt = optim.init_adam(st.params)
    opt = optim.AdamState(
        mu=jax.tree.map(lambda x: jnp.ones_like(x), opt.mu),
        nu=opt.nu, count=opt.count)
    st2, opt2 = densify_ops.reset_opacity(st, opt)
    assert float(jnp.max(jax.nn.sigmoid(st2.params.opacity))) <= 0.01 + 1e-6
    assert (np.asarray(opt2.mu.opacity) == 0).all()
    assert (np.asarray(opt2.mu.xyz) == 1).all()  # other groups untouched


def test_prune_rows_masks_and_zeroes():
    st = _mk_state(n=20, capacity=32)
    opt = optim.init_adam(st.params)
    mask = jnp.zeros(32, bool).at[jnp.array([1, 3])].set(True)
    st2, _, n = densify_ops.prune_rows(st, opt, mask)
    assert int(n) == 2
    assert int(st2.num_active) == 18


def test_sparse_adam_only_touches_visible_rows():
    st = _mk_state(n=20, capacity=32)
    opt = optim.init_adam(st.params)
    grads = jax.tree.map(jnp.ones_like, st.params)
    lrs = optim.LearningRates(*(jnp.asarray(0.1),) * 7)
    vis = jnp.zeros(32, bool).at[:5].set(True)
    new_p, _ = optim.adam_update(st.params, grads, opt, lrs,
                                 visibility=vis, sparse=True)
    dx = np.asarray(new_p.xyz - st.params.xyz)
    assert (dx[:5] != 0).all()
    assert (dx[5:] == 0).all()
    # Exposure is not per-gaussian: always updated.
    assert (np.asarray(new_p.exposure != st.params.exposure)).any()


def test_dense_adam_matches_torch_formula():
    st = _mk_state(n=4, capacity=8)
    opt = optim.init_adam(st.params)
    g = 0.5
    grads = jax.tree.map(lambda x: jnp.full_like(x, g), st.params)
    lrs = optim.LearningRates(*(jnp.asarray(0.01),) * 7)
    new_p, opt2 = optim.adam_update(st.params, grads, opt, lrs)
    # Step 1 with zero init: mhat = g, vhat = g² -> Δ = lr·g/(|g|+eps) = lr.
    np.testing.assert_allclose(
        np.asarray(st.params.xyz - new_p.xyz), 0.01, rtol=1e-5)
    assert int(opt2.count) == 1
