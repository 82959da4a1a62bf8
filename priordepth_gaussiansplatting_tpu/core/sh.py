"""Real spherical harmonics, degrees 0-4.

TPU-first design: instead of the reference's chain of scalar fused-multiply-adds
(reference `utils/sh_utils.py:57-118`), we materialise the SH *basis vector*
``B(dir) in R^{(deg+1)^2}`` for a batch of directions and contract it against the
coefficient tensor with one einsum. That turns SH evaluation into a tall-skinny
matmul ((N, 16) x (N, 16, 3) contraction) which XLA maps onto the MXU and fuses
with the surrounding projection math, instead of ~50 dependent VPU ops.

Constants are the standard real-SH normalisation constants (PlenOctree
convention, matching the reference renderer's colour model).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Standard real spherical harmonics normalisation constants.
C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)

MAX_SH_DEGREE = 4


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """SH basis values B(dir) for unit directions.

    Args:
      dirs: (..., 3) unit direction vectors.
      degree: static int in [0, 4].

    Returns:
      (..., (degree+1)**2) basis values, so that
      ``color = einsum('...k,...kc->...c', basis, sh_coeffs)``.
    """
    if not 0 <= degree <= MAX_SH_DEGREE:
        raise ValueError(f"SH degree must be in [0, {MAX_SH_DEGREE}], got {degree}")
    shape = dirs.shape[:-1]
    one = jnp.ones(shape, dtype=dirs.dtype)
    cols = [C0 * one]
    if degree >= 1:
        x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
        cols += [-C1 * y, C1 * z, -C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        cols += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if degree >= 3:
        cols += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    if degree >= 4:
        cols += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3.0 * xx - yy),
            C4[2] * xy * (7.0 * zz - 1.0),
            C4[3] * yz * (7.0 * zz - 3.0),
            C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            C4[5] * xz * (7.0 * zz - 3.0),
            C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            C4[7] * xz * (xx - 3.0 * yy),
            C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(cols, axis=-1)


def eval_sh(degree: int, sh_coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colour. Returns (..., 3).

    sh_coeffs is either FLAT (..., 3K) with channel-minor interleaving
    (column 3k+c = coefficient k, channel c — the model-store layout) or
    legacy (..., K, 3).

    TPU layout note: any (N, K, 3) array is physically tiled on its last
    two dims, padding the 3-wide minor dim to 128 lanes — elementwise ops
    on that shape run ~40x slower than on (N, 3K) (measured 25 ms vs ~0 ms
    for a multiply at N=1M). The flat path therefore works entirely in 2-D:
    the basis is expanded to the interleaved columns with an exact 0/1
    matmul, multiplied elementwise, and channel-reduced with another 0/1
    matmul — the einsum's (N,16,3) intermediates (and its ~25 ms VJP) never
    exist.
    """
    k = num_sh_bases(degree)
    basis = sh_basis(dirs, degree)
    if sh_coeffs.ndim == dirs.ndim + 1:  # legacy (..., K, 3)
        return jnp.einsum("...k,...kc->...c", basis, sh_coeffs[..., :k, :])
    import numpy as np
    expand = jnp.asarray(np.kron(np.eye(k, dtype=np.float32),
                                 np.ones((1, 3), np.float32)))   # (k, 3k)
    reduce_ = jnp.asarray(np.tile(np.eye(3, dtype=np.float32),
                                  (k, 1)))                       # (3k, 3)
    hi = jax.lax.Precision.HIGHEST  # 0/1 operands: exact selection/sum
    b3 = jnp.matmul(basis, expand, precision=hi)     # (..., 3k)
    prod = b3 * sh_coeffs[..., :3 * k]
    return jnp.matmul(prod, reduce_, precision=hi)   # (..., 3)


def sh_to_color(degree: int, sh_coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """SH -> clamped RGB as the rasterizer does: eval + 0.5 offset, floor at 0.

    Contract of the reference renderer's colour path
    (`gaussian_renderer/__init__.py:75-80` and the CUDA preprocess).
    """
    return jnp.maximum(eval_sh(degree, sh_coeffs, dirs) + 0.5, 0.0)


def rgb_to_sh(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term's colour mapping (reference `RGB2SH`)."""
    return (rgb - 0.5) / C0


def sh_to_rgb(sh: jnp.ndarray) -> jnp.ndarray:
    return sh * C0 + 0.5
