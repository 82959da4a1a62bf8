"""Golden tests for core math: SH constants/eval, quaternions, covariance,
camera matrices, LR schedule. Golden values computed against the public
formulas the reference uses (utils/sh_utils.py, utils/graphics_utils.py,
utils/general_utils.py)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from priordepth_gaussiansplatting_tpu.core import cameras, schedules, sh, transforms


def _eval_sh_scalar(deg, coeffs, d):
    """Independent scalar reimplementation of the standard real-SH expansion."""
    C0 = 0.28209479177387814
    C1 = 0.4886025119029199
    x, y, z = d
    out = C0 * coeffs[0]
    if deg >= 1:
        out += -C1 * y * coeffs[1] + C1 * z * coeffs[2] - C1 * x * coeffs[3]
    if deg >= 2:
        xx, yy, zz = x * x, y * y, z * z
        out += (1.0925484305920792 * x * y * coeffs[4]
                - 1.0925484305920792 * y * z * coeffs[5]
                + 0.31539156525252005 * (2 * zz - xx - yy) * coeffs[6]
                - 1.0925484305920792 * x * z * coeffs[7]
                + 0.5462742152960396 * (xx - yy) * coeffs[8])
    if deg >= 3:
        xx, yy, zz = x * x, y * y, z * z
        out += (-0.5900435899266435 * y * (3 * xx - yy) * coeffs[9]
                + 2.890611442640554 * x * y * z * coeffs[10]
                - 0.4570457994644658 * y * (4 * zz - xx - yy) * coeffs[11]
                + 0.3731763325901154 * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[12]
                - 0.4570457994644658 * x * (4 * zz - xx - yy) * coeffs[13]
                + 1.445305721320277 * z * (xx - yy) * coeffs[14]
                - 0.5900435899266435 * x * (xx - 3 * yy) * coeffs[15])
    return out


@pytest.mark.parametrize("deg", [0, 1, 2, 3])
def test_eval_sh_matches_scalar_formula(deg):
    rng = np.random.RandomState(0)
    n = 17
    coeffs = rng.randn(n, 16, 3).astype(np.float32)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    got = sh.eval_sh(deg, jnp.asarray(coeffs), jnp.asarray(dirs))
    want = np.stack([
        [_eval_sh_scalar(deg, coeffs[i, :, c], dirs[i]) for c in range(3)]
        for i in range(n)
    ])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_sh_rgb_roundtrip():
    rgb = jnp.array([[0.1, 0.5, 0.9]])
    back = sh.sh_to_rgb(sh.rgb_to_sh(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb), atol=1e-6)


def test_quat_to_rotmat_identity_and_orthonormal():
    ident = transforms.quat_to_rotmat(jnp.array([1.0, 0.0, 0.0, 0.0]))
    np.testing.assert_allclose(np.asarray(ident), np.eye(3), atol=1e-6)
    # 90° about z: q = (cos45, 0, 0, sin45)
    q = jnp.array([math.cos(math.pi / 4), 0.0, 0.0, math.sin(math.pi / 4)])
    R = np.asarray(transforms.quat_to_rotmat(q))
    np.testing.assert_allclose(R @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)
    rng = np.random.RandomState(1)
    qs = transforms.normalize_quat(jnp.asarray(rng.randn(32, 4)))
    Rs = np.asarray(transforms.quat_to_rotmat(qs))
    np.testing.assert_allclose(
        Rs @ np.swapaxes(Rs, -1, -2), np.broadcast_to(np.eye(3), (32, 3, 3)),
        atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(Rs), np.ones(32), atol=1e-5)


def test_cov3d_is_rotated_diag_of_squares():
    scale = jnp.array([[2.0, 3.0, 0.5]])
    quat = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    cov = np.asarray(transforms.scaling_rotation_to_cov3d(scale, quat))[0]
    np.testing.assert_allclose(cov, np.diag([4.0, 9.0, 0.25]), atol=1e-5)
    # Invariant under rotation: eigenvalues are squared scales.
    rng = np.random.RandomState(2)
    q = transforms.normalize_quat(jnp.asarray(rng.randn(4)))
    cov = np.asarray(transforms.scaling_rotation_to_cov3d(scale, q[None]))[0]
    eig = np.sort(np.linalg.eigvalsh(cov))
    np.testing.assert_allclose(eig, [0.25, 4.0, 9.0], rtol=5e-3)


def test_strip_unpack_roundtrip():
    rng = np.random.RandomState(3)
    A = rng.randn(5, 3, 3)
    sym = A @ np.swapaxes(A, -1, -2)
    packed = transforms.strip_symmetric(jnp.asarray(sym))
    back = transforms.unpack_symmetric(packed)
    np.testing.assert_allclose(np.asarray(back), sym, rtol=1e-6)


def test_projection_matrix_golden():
    # Golden from the reference getProjectionMatrix formula
    # (utils/graphics_utils.py:51-71) with znear=0.01, zfar=100, fov=60°/45°.
    fovx, fovy = math.radians(60), math.radians(45)
    P = cameras.perspective_projection(fovx, fovy)
    assert P[0, 0] == pytest.approx(1.0 / math.tan(fovx / 2), rel=1e-6)
    assert P[1, 1] == pytest.approx(1.0 / math.tan(fovy / 2), rel=1e-6)
    assert P[2, 2] == pytest.approx(100.0 / (100.0 - 0.01), rel=1e-6)
    assert P[2, 3] == pytest.approx(-(100.0 * 0.01) / (100.0 - 0.01), rel=1e-6)
    assert P[3, 2] == 1.0
    # Maps znear -> 0, zfar -> 1 after perspective divide.
    for z, want in [(0.01, 0.0), (100.0, 1.0)]:
        p = P @ np.array([0, 0, z, 1.0])
        assert p[2] / p[3] == pytest.approx(want, abs=1e-6)


def test_world_to_view_recentring():
    rng = np.random.RandomState(4)
    q = transforms.normalize_quat(jnp.asarray(rng.randn(4)))
    R = np.asarray(transforms.quat_to_rotmat(q))  # camera-to-world rotation
    t = rng.randn(3)
    w2c = cameras.world_to_view(R, t)
    # Column-vector convention: camera center c satisfies w2c @ [c;1] = 0.
    c = np.linalg.inv(w2c)[:3, 3]
    out = w2c @ np.append(c, 1.0)
    np.testing.assert_allclose(out[:3], 0.0, atol=1e-5)
    # With recentring, the new center is (c + translate) * scale.
    tr = np.array([1.0, -2.0, 3.0])
    w2c2 = cameras.world_to_view(R, t, translate=tr, scale=2.0)
    c2 = np.linalg.inv(w2c2)[:3, 3]
    np.testing.assert_allclose(c2, (c + tr) * 2.0, rtol=1e-4, atol=1e-5)


def test_expon_lr_schedule():
    # Endpoints and log-linear midpoint (utils/general_utils.py:29-62).
    f = lambda s: float(schedules.expon_lr(s, 1.6e-4, 1.6e-6, max_steps=30000))
    assert f(0) == pytest.approx(1.6e-4, rel=1e-3)
    assert f(30000) == pytest.approx(1.6e-6, rel=1e-3)
    assert f(15000) == pytest.approx(math.sqrt(1.6e-4 * 1.6e-6), rel=1e-3)
    assert f(-1) == 0.0
    assert float(schedules.expon_lr(10, 0.0, 0.0)) == 0.0
    # Delay ramp: at step 0 with delay, lr = lr_init * delay_mult.
    g = schedules.expon_lr(0, 1e-3, 1e-5, lr_delay_steps=100,
                           lr_delay_mult=0.1, max_steps=1000)
    assert float(g) == pytest.approx(1e-4, rel=1e-3)


def test_schedule_is_jittable():
    fn = jax.jit(lambda s: schedules.expon_lr(s, 1e-3, 1e-5, max_steps=100))
    assert float(fn(jnp.array(50))) > 0
