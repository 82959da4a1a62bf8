"""Quaternion / covariance math for anisotropic 3D Gaussians.

Batched, functional equivalents of the reference's activation helpers
(`utils/general_utils.py:78-110`, `scene/gaussian_model.py:33-48`):
unnormalised quaternion -> rotation matrix, (scale, rotation) -> 3D covariance.

Everything here is (N, ...) batched and jit/vmap-friendly; covariance assembly
is expressed as small batched matmuls that XLA fuses into the projection kernel.
"""

from __future__ import annotations

import jax.numpy as jnp


def normalize_quat(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Normalise (..., 4) quaternions stored as (w, x, y, z)."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) unit quaternion (w, x, y, z) -> (..., 3, 3) rotation matrix.

    Same convention as the reference `build_rotation`
    (`utils/general_utils.py:78-99`): q[0] is the scalar part.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def scaling_rotation_to_cov3d(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) scales (linear, post-activation) + (N, 4) quats -> (N, 3, 3) Σ.

    Σ = R S Sᵀ Rᵀ = L Lᵀ with L = R·diag(s) — the covariance model of
    `scene/gaussian_model.py:34-38`. Returned full symmetric matrix; use
    :func:`strip_symmetric` for the packed 6-vector the rasterizer consumes.
    """
    R = quat_to_rotmat(normalize_quat(quat))
    # Σ_ij = Σ_k s_k² R_ik R_jk expanded elementwise (batched 3x3 matmuls
    # lower poorly on TPU).
    s2 = scale * scale  # (..., 3)
    rows = [R[..., 0, :], R[..., 1, :], R[..., 2, :]]

    def entry(i, j):
        return jnp.sum(s2 * rows[i] * rows[j], axis=-1)

    row0 = jnp.stack([entry(0, 0), entry(0, 1), entry(0, 2)], axis=-1)
    row1 = jnp.stack([entry(0, 1), entry(1, 1), entry(1, 2)], axis=-1)
    row2 = jnp.stack([entry(0, 2), entry(1, 2), entry(2, 2)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) symmetric -> packed (..., 6): xx, xy, xz, yy, yz, zz.

    Layout matches the reference's `strip_lowerdiag`
    (`utils/general_utils.py:62-73`).
    """
    return jnp.stack(
        [
            cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
            cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_symmetric(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`strip_symmetric`."""
    xx, xy, xz, yy, yz, zz = (packed[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Logit — used to store opacity in pre-activation space
    (`utils/general_utils.py:26-27`)."""
    return jnp.log(x / (1.0 - x))
