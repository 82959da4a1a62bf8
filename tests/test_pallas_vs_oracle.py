"""Pallas tile rasterizer vs the jnp oracle: images, inverse depth,
transmittance, and parameter gradients must match (interpret mode on CPU).
This is the acceptance gate of SURVEY.md §7.3 / BASELINE.json config 1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from priordepth_gaussiansplatting_tpu.core import transforms
from priordepth_gaussiansplatting_tpu.ops import binning
from priordepth_gaussiansplatting_tpu.ops import projection as proj_ops
from priordepth_gaussiansplatting_tpu.ops import rasterize_pallas as rp
from priordepth_gaussiansplatting_tpu.ops import reference as ref_ops
from priordepth_gaussiansplatting_tpu.utils import testing as T


def _project(params, cam, valid_mask=None):
    cov3d = transforms.scaling_rotation_to_cov3d(params["scales"],
                                                 params["quats"])
    return proj_ops.project_gaussians(
        params["means"], cov3d, params["opacities"], params["sh"], 3,
        cam.world_view, cam.full_proj, cam.cam_center,
        cam.width, cam.height, cam.tan_fovx, cam.tan_fovy,
        valid_mask=valid_mask)


def test_binning_covers_each_pair_once():
    key = jax.random.PRNGKey(0)
    W = H = 64
    cam = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    proj = _project(T.random_gaussians(key, 64), cam)
    b = binning.bin_gaussians(proj, W, H, pair_capacity=4096)
    gx, gy = binning.grid_shape(W, H)
    npairs = int(b.num_pairs)
    assert int(b.overflow) == 0
    # Ranges partition [0, num_pairs).
    starts = np.asarray(b.tile_start)
    ends = np.asarray(b.tile_end)
    assert (ends >= starts).all()
    assert (ends - starts).sum() == npairs
    # Pairs sorted by tile then depth.
    tids = np.asarray(b.tile_ids)[:npairs]
    assert (np.diff(tids) >= 0).all()
    depth = np.asarray(proj.depth)[np.asarray(b.gauss_ids)[:npairs]]
    for t in range(gx * gy):
        s, e = starts[t], ends[t]
        if e - s > 1:
            assert (np.diff(depth[s:e]) >= -1e-6).all()
    # Pair count matches the rect areas.
    xmin, ymin, xmax, ymax = proj_ops.tile_rect(proj.mean2d, proj.radius, W, H)
    want = int(np.sum(np.asarray((xmax - xmin) * (ymax - ymin))))
    assert npairs == want


@pytest.mark.parametrize("n,wh", [(64, 64), (256, 128)])
def test_forward_matches_oracle(n, wh):
    key = jax.random.PRNGKey(n)
    W = H = wh
    cam = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    proj = _project(T.random_gaussians(key, n), cam)
    bg = jnp.array([0.1, 0.2, 0.3])
    want = ref_ops.rasterize_reference(proj, bg, W, H)
    got = rp.rasterize(proj, bg, W, H, interpret=True)
    assert int(got["overflow"]) == 0
    np.testing.assert_allclose(np.asarray(got["render"]),
                               np.asarray(want["render"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["invdepth"]),
                               np.asarray(want["invdepth"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got["final_T"]),
                               np.asarray(want["final_T"]), atol=2e-5)


def test_forward_matches_oracle_dense_overlap():
    """Many overlapping opaque splats exercise early termination."""
    key = jax.random.PRNGKey(5)
    W = H = 48
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)
    params = T.random_gaussians(key, 128, extent=0.3,
                                scale_range=(0.1, 0.3),
                                opacity_range=(0.9, 0.99))
    proj = _project(params, cam)
    bg = jnp.zeros(3)
    want = ref_ops.rasterize_reference(proj, bg, W, H)
    got = rp.rasterize(proj, bg, W, H, interpret=True)
    # Near-opaque chains hit the T<1e-4 early-stop boundary; chunked vs
    # single-pass cumprod rounding can flip the cutoff pair on a handful of
    # pixels (the CUDA kernel differs from the oracle the same way). Require
    # exactness almost everywhere and boundedness at the boundary.
    diff = np.abs(np.asarray(got["render"]) - np.asarray(want["render"]))
    frac_exact = (diff <= 3e-5).mean()
    assert frac_exact > 0.99, frac_exact
    assert diff.max() < 5e-3, diff.max()


def test_gradients_match_oracle():
    key = jax.random.PRNGKey(2)
    W = H = 48
    cam = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    params = T.random_gaussians(key, 48, scale_range=(0.05, 0.15))
    target = jax.random.uniform(jax.random.PRNGKey(3), (3, H, W))
    bg = jnp.array([0.3, 0.3, 0.3])

    def loss(p, backend, exact=False):
        proj = _project(p, cam)
        if backend == "oracle":
            out = ref_ops.rasterize_reference(proj, bg, W, H)
        else:
            out = rp.rasterize(proj, bg, W, H, interpret=True,
                               exact_grads=exact)
        # Touch both render and invdepth so both cotangent paths flow.
        return (jnp.mean((out["render"] - target) ** 2)
                + 0.1 * jnp.mean(jnp.abs(out["invdepth"])))

    g_ref = jax.grad(lambda p: loss(p, "oracle"))(params)
    # exact_grads=True routes per-pair cotangents at full f32: strict
    # parity with the oracle.
    g_exact = jax.grad(lambda p: loss(p, "pallas", True))(params)
    for name in params:
        a, b = np.asarray(g_ref[name]), np.asarray(g_exact[name])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=3e-4 * scale, rtol=2e-3,
                                   err_msg=f"exact grad mismatch: {name}")
    # DEFAULT fast routing: per-pair cotangents are bf16-rounded (RTNE,
    # 2^-9 relative) before the per-Gaussian f32 sum
    # (ops/binning._bin_sorted_bwd). Per-element error is bounded by
    # ~2^-9 * sum|pair cotangents|, which sign cancellation can leave at
    # a few percent of the row's max — an order below minibatch gradient
    # noise. Strict parity lives in the exact_grads check above;
    # end-to-end training parity in docs/PROOF_r03.md.
    g_pal = jax.grad(lambda p: loss(p, "pallas"))(params)
    for name in params:
        a, b = np.asarray(g_ref[name]), np.asarray(g_pal[name])
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, atol=2e-2 * scale, rtol=3e-2,
                                   err_msg=f"fast grad mismatch: {name}")


def test_screen_offset_grads_flow_through_pallas():
    """Densification needs d(loss)/d(mean2D) — check via the attrs path."""
    key = jax.random.PRNGKey(4)
    W = H = 32
    cam = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    params = T.random_gaussians(key, 16)
    proj = _project(params, cam)
    bg = jnp.zeros(3)

    def loss_on_mean2d(m2d):
        p2 = proj.__class__(mean2d=m2d, conic=proj.conic,
                            opacity=proj.opacity, rgb=proj.rgb,
                            depth=proj.depth, invdepth=proj.invdepth,
                            radius=proj.radius)
        out = rp.rasterize(p2, bg, W, H, interpret=True,
                           exact_grads=True)
        return jnp.sum(out["render"] ** 2)

    def loss_ref(m2d):
        p2 = proj.__class__(mean2d=m2d, conic=proj.conic,
                            opacity=proj.opacity, rgb=proj.rgb,
                            depth=proj.depth, invdepth=proj.invdepth,
                            radius=proj.radius)
        out = ref_ops.rasterize_reference(p2, bg, W, H)
        return jnp.sum(out["render"] ** 2)

    g_pal = np.asarray(jax.grad(loss_on_mean2d)(proj.mean2d))
    g_ref = np.asarray(jax.grad(loss_ref)(proj.mean2d))
    scale = max(np.abs(g_ref).max(), 1e-8)
    np.testing.assert_allclose(g_pal, g_ref, atol=3e-4 * scale, rtol=2e-3)


def test_pair_overflow_is_reported():
    key = jax.random.PRNGKey(6)
    W = H = 64
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)
    params = T.random_gaussians(key, 64, scale_range=(0.3, 0.6))
    proj = _project(params, cam)
    out = rp.rasterize(proj, jnp.zeros(3), W, H, pair_capacity=4096,
                       interpret=True)
    # huge splats cover many tiles; just check the counter is consistent
    assert int(out["overflow"]) >= 0


def test_segment_reduce_matches_numpy():
    """Pallas pair->Gaussian reduction vs float64 numpy ground truth,
    covering zero-pair Gaussians and N not a multiple of the block size."""
    key = jax.random.PRNGKey(11)
    W = H = 96
    cam = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    n = 700  # not a multiple of binning.SEG_G
    params = T.random_gaussians(key, n, scale_range=(0.0, 0.08))
    # Push some Gaussians behind the camera so they cull to zero pairs.
    means = params["means"].at[::13, 2].set(-10.0)
    params = dict(params, means=means)
    proj = _project(params, cam)
    b = binning.bin_gaussians(proj, W, H, pair_capacity=1 << 15)
    npairs = int(b.num_pairs)
    assert int(b.overflow) == 0
    counts = np.bincount(np.asarray(b.gauss_ids)[:npairs], minlength=n)
    assert (counts == 0).any()  # some Gaussians bin to no tile

    d_np = np.random.default_rng(0).standard_normal(
        (binning.ATTR_ROWS, 1 << 15)).astype(np.float32)
    # id-sorted cotangents, as the gather VJP produces them: sort the pair
    # cotangents by (original) gaussian id, padding keys past every real id.
    key = np.asarray(b.gauss_ids).copy()
    key[npairs:] = n
    perm = np.argsort(key, kind="stable")
    gid_sorted = jnp.asarray(key[perm])
    d_sorted = jnp.asarray(d_np[:, perm])
    got = np.asarray(binning.segment_reduce(d_sorted, gid_sorted,
                                            b.num_pairs, n, interpret=True))
    # ground truth: per-gaussian sums in float64 (order-independent).
    truth = np.zeros((binning.ATTR_ROWS, n))
    np.add.at(truth.T, key[:npairs], d_np[:, :npairs].T.astype(np.float64))
    np.testing.assert_allclose(got, truth, atol=2e-4)
    assert got.shape == (binning.ATTR_ROWS, n)
    assert np.abs(got[:, counts == 0]).max() == 0.0


def test_binning_matches_numpy_expansion():
    """The Pallas pair-expansion kernel must reproduce a literal numpy
    rect expansion: per-pair tile ids, gaussian ids, and tile ranges."""
    key = jax.random.PRNGKey(9)
    W = H = 64
    cam = T.look_at_camera((0, 0, -2.5), width=W, height=H)
    proj = _project(T.random_gaussians(key, 96), cam)
    b = binning.bin_gaussians(proj, W, H, pair_capacity=4096)
    gx, gy = binning.grid_shape(W, H)

    # numpy reference: depth-sorted gaussians, row-major rect tiles.
    order = np.argsort(np.asarray(proj.depth), kind="stable")
    xmin, ymin, xmax, ymax = (
        np.asarray(v)
        for v in proj_ops.tile_rect(proj.mean2d, proj.radius, W, H))
    ref_tiles, ref_gids = [], []
    for g in order:
        for ty in range(int(ymin[g]), int(ymax[g])):
            for tx in range(int(xmin[g]), int(xmax[g])):
                ref_tiles.append(ty * gx + tx)
                ref_gids.append(int(g))   # ORIGINAL gaussian id
    ref_tiles = np.array(ref_tiles, np.int32)
    ref_gids = np.array(ref_gids, np.int32)
    npairs = int(b.num_pairs)
    assert npairs == len(ref_tiles)
    # tile-sorted pair list and per-tile ranges vs a stable argsort of the
    # reference expansion.
    ref_sort = np.argsort(ref_tiles, kind="stable")
    np.testing.assert_array_equal(np.asarray(b.tile_ids)[:npairs],
                                  ref_tiles[ref_sort])
    np.testing.assert_array_equal(np.asarray(b.gauss_ids)[:npairs],
                                  ref_gids[ref_sort])
    starts = np.asarray(b.tile_start)
    ends = np.asarray(b.tile_end)
    for t in range(gx * gy):
        lo = np.searchsorted(ref_tiles[ref_sort], t, side="left")
        hi = np.searchsorted(ref_tiles[ref_sort], t, side="right")
        assert starts[t] == lo and ends[t] == hi, t


def test_early_exit_multichunk_matches_oracle_with_grads():
    """A tile whose pair list spans several CHUNKs and saturates early
    exercises the while-loop early exit in BOTH kernels: skipped chunks'
    pairs must contribute zero gradient and the zero-donated grad buffer
    must hold exact zeros there (fwd image + all param grads vs oracle)."""
    key = jax.random.PRNGKey(17)
    W = H = 32  # 2x2 tile grid
    cam = T.look_at_camera((0, 0, -2.0), width=W, height=H)
    n = 700  # every gaussian covers the whole grid -> ~700 pairs/tile
    params = T.random_gaussians(key, n, extent=0.05,
                                scale_range=(0.3, 0.6),
                                opacity_range=(0.8, 0.99))
    assert 700 > 2 * rp.CHUNK  # at least three chunks per tile

    def loss(p, backend):
        proj = _project(p, cam)
        if backend == "oracle":
            out = ref_ops.rasterize_reference(proj, jnp.zeros(3), W, H)
        else:
            out = rp.rasterize(proj, jnp.zeros(3), W, H,
                               pair_capacity=4096, interpret=True,
                               exact_grads=True)
        return (jnp.sum(out["render"] ** 2) + jnp.sum(out["invdepth"])
                + jnp.sum(out["final_T"]))

    f_ref = float(loss(params, "oracle"))
    f_pal = float(loss(params, "pallas"))
    np.testing.assert_allclose(f_pal, f_ref, rtol=1e-4)
    g_ref = jax.grad(lambda p: loss(p, "oracle"))(params)
    g_pal = jax.grad(lambda p: loss(p, "pallas"))(params)
    for name in g_ref:
        ref = np.asarray(g_ref[name])
        pal = np.asarray(g_pal[name])
        scale = np.abs(ref).max() + 1e-8
        np.testing.assert_allclose(pal / scale, ref / scale, atol=2e-4,
                                   err_msg=f"grad mismatch for {name}")


def test_capacity_ladder_properties():
    """round_capacity: covering, monotone, 4096-granular, tight padding."""
    import random
    rc = rp.round_capacity
    rng = random.Random(0)
    prev = 0
    for pairs in sorted(rng.randint(4096, 50_000_000) for _ in range(200)):
        c = rc(pairs)
        assert c >= pairs
        assert c % 4096 == 0
        assert c >= prev  # monotone in the request
        prev = c
        if pairs >= 1 << 17:
            # sixteenth-octave rungs: at most ~6.7% padding above 128k
            assert c / pairs <= 1.0 + 1.0 / 15.0 + 1e-9, (pairs, c)
    assert rc(4096) == 4096
