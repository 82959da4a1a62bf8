"""Adam for the Gaussian pytree: per-group LRs, eps=1e-15, and a sparse
(visible-rows-only) variant.

Replaces the reference's torch Adam + `SparseGaussianAdam` CUDA extension
(`scene/gaussian_model.py:180-214`, SURVEY.md §2.9.1 extras). Because the
parameter store is fixed-capacity, the reference's "optimizer surgery"
(`gaussian_model.py:326-400` — reallocating exp_avg/exp_avg_sq on every
densify) degenerates to masked writes on the moment arrays, done by
models/densify.py through :func:`zero_moments_rows`.

Semantics:
  * dense mode = torch.optim.Adam: bias-corrected, eps inside the sqrt-denom
    sum, per-group LR (eps=1e-15 for Gaussian groups, 1e-8 for exposure,
    matching `training_setup`).
  * sparse mode = SparseGaussianAdam: moments and parameters advance ONLY for
    rows visible in this iteration (radii > 0); no bias correction, matching
    the CUDA `adamUpdate` kernel's running-average form.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams

B1, B2 = 0.9, 0.999
EPS_GAUSS = 1e-15
EPS_EXPOSURE = 1e-8

# Per-gaussian leaves (first axis = capacity); exposure is per-image.
_PER_GAUSSIAN = ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    count: jnp.ndarray  # () int32 — shared step count (dense bias correction)


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     count=jnp.zeros((), jnp.int32))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LearningRates:
    """Per-group learning rates for one step (scalars, possibly traced)."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray
    exposure: jnp.ndarray


def adam_update(params: GaussianParams, grads: GaussianParams,
                state: AdamState, lrs: LearningRates,
                visibility: Optional[jnp.ndarray] = None,
                sparse: bool = False):
    """One Adam step. Returns (new_params, new_state)."""
    count = state.count + 1
    t = count.astype(jnp.float32)
    new_p, new_mu, new_nu = {}, {}, {}
    for name in GaussianParams.__dataclass_fields__:
        p = getattr(params, name)
        g = getattr(grads, name)
        mu = getattr(state.mu, name)
        nu = getattr(state.nu, name)
        lr = getattr(lrs, name)
        eps = EPS_EXPOSURE if name == "exposure" else EPS_GAUSS
        mu_n = B1 * mu + (1.0 - B1) * g
        nu_n = B2 * nu + (1.0 - B2) * g * g
        if sparse and name in _PER_GAUSSIAN:
            # Visible-rows-only running-average update (SparseGaussianAdam).
            vis = visibility.reshape((-1,) + (1,) * (p.ndim - 1))
            mu_n = jnp.where(vis, mu_n, mu)
            nu_n = jnp.where(vis, nu_n, nu)
            step = lr * mu_n / (jnp.sqrt(nu_n) + eps)
            p_n = jnp.where(vis, p - step, p)
        else:
            mu_hat = mu_n / (1.0 - B1 ** t)
            nu_hat = nu_n / (1.0 - B2 ** t)
            p_n = p - lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
        new_p[name], new_mu[name], new_nu[name] = p_n, mu_n, nu_n
    return (GaussianParams(**new_p),
            AdamState(mu=GaussianParams(**new_mu),
                      nu=GaussianParams(**new_nu), count=count))


def zero_moments_rows(state: AdamState, row_mask: jnp.ndarray,
                      only: Optional[tuple] = None) -> AdamState:
    """Zero Adam moments for masked rows — the fixed-capacity equivalent of
    the reference's optimizer surgery on densify/prune/opacity-reset."""
    names = only if only is not None else _PER_GAUSSIAN

    def zero(tree):
        out = {}
        for name in GaussianParams.__dataclass_fields__:
            leaf = getattr(tree, name)
            if name in names:
                m = row_mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
                leaf = jnp.where(m, 0.0, leaf)
            out[name] = leaf
        return GaussianParams(**out)

    return AdamState(mu=zero(state.mu), nu=zero(state.nu), count=state.count)
