"""Densification (clone / split / prune / opacity-reset) on the fixed-capacity
Gaussian store — all inside jit, no shape changes.

Reimplements the reference's adaptive-density control
(`scene/gaussian_model.py:424-506`) with masked scatters instead of tensor
reallocation: free (inactive) slots are assigned to clone/split children via a
stable argsort over the active mask; Adam moments of new/changed rows are
zeroed exactly where the reference's optimizer surgery zeroes them
(`cat_tensors_to_optimizer`, `_prune_optimizer`).

Semantics notes vs the reference:
  * clone/split selection uses grads = Σ‖∇ndc mean2D‖ / visibility-count with
    NaN→0, threshold `max_grad`, size split at `percent_dense·extent`.
  * split draws N=2 samples from the Gaussian itself (rotated scale-stds),
    child scale = scale/(0.8·2); one child reuses the parent's slot.
  * prune: opacity < min_opacity ∪ (when max_screen_size>0)
    max_scale > 0.1·extent. The reference's screen-radius term
    (max_radii2D > max_screen_size) is dead code upstream —
    densification_postfix zeroes max_radii2D immediately before the test
    (gaussian_model.py:422/494) — and implementing the "documented intent"
    instead collapses training (see inline note), so the no-op is matched.
  * when free capacity runs out, lowest-index requests win and the rest are
    dropped (the host trainer regrows capacity and re-jits when occupancy
    crosses a threshold — models/gaussians.grow_capacity).
  * stats (grad accum / denom / max_radii2D) reset to zero for ALL rows after
    a densify round, as `densification_postfix` does.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import transforms
from ..train.optim import AdamState, zero_moments_rows
from .gaussians import GaussianParams, GaussianState

_PER_GAUSSIAN = ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity")


def add_densification_stats(state: GaussianState, screen_grad: jnp.ndarray,
                            radii: jnp.ndarray, width: int,
                            height: int) -> GaussianState:
    """Accumulate per-Gaussian screen gradient norms + visibility counts.

    `screen_grad` is d(loss)/d(mean2D) in PIXEL units (the grad of the
    render()'s `screen_offset`); the reference thresholds NDC-convention
    gradients (pixel grads × half image size — the CUDA backward's
    ddelx_dx=0.5W factor), so we rescale here (`train.py:313-315`,
    `gaussian_model.py:502-506`).
    """
    vis = radii > 0
    g = screen_grad * jnp.asarray([0.5 * width, 0.5 * height],
                                  dtype=screen_grad.dtype)
    norm = jnp.linalg.norm(g, axis=-1)
    return state.replace(
        max_radii2d=jnp.where(vis, jnp.maximum(state.max_radii2d,
                                               radii.astype(jnp.float32)),
                              state.max_radii2d),
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(vis, norm, 0.0),
        denom=state.denom + vis.astype(jnp.float32),
    )


def _scatter_rows(leaf: jnp.ndarray, dst: jnp.ndarray,
                  values: jnp.ndarray) -> jnp.ndarray:
    """leaf[dst[i]] = values[i] for in-range dst; out-of-range dropped."""
    return leaf.at[dst].set(values, mode="drop")


@partial(jax.jit,
         static_argnames=("max_grad", "min_opacity", "extent",
                          "max_screen_size", "percent_dense"),
         donate_argnums=(0, 1))
def densify_and_prune(
    state: GaussianState,
    opt_state: AdamState,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,
    percent_dense: float = 0.01,
):
    """One adaptive-density round. Returns (state, opt_state, info dict)."""
    c = state.capacity
    p = state.params
    active = state.active
    scaling = state.get_scaling()
    max_scale = jnp.max(scaling, axis=-1)
    grads = jnp.where(state.denom > 0,
                      state.xyz_gradient_accum / jnp.maximum(state.denom, 1.0),
                      0.0)

    high_grad = (grads >= max_grad) & active
    clone_mask = high_grad & (max_scale <= percent_dense * extent)
    split_mask = high_grad & (max_scale > percent_dense * extent)

    # Prune (reference order is clone→split→prune, but the criteria only
    # involve pre-densify rows; see module docstring).
    opacity = state.get_opacity()
    prune_mask = (opacity < min_opacity) & active
    if max_screen_size and max_screen_size > 0:
        # NOTE the reference's screen-size prune (big_points_vs) is DEAD
        # CODE: densification_postfix re-creates max_radii2D as zeros
        # (gaussian_model.py:422) right before the `max_radii2D >
        # max_screen_size` test (gaussian_model.py:494), so it never fires.
        # Matching that behavior matters: pruning on the ACCUMULATED radii
        # (the documented intent) death-spirals real scenes — the first
        # post-reset prune culls most of the model (large sky/background
        # splats), survivors grow to cover the loss, get pruned in turn,
        # and the model collapses (observed: 191k -> 3.3k gaussians on the
        # 1024^2 proof scene). Only the world-size prune is live.
        prune_mask |= active & (max_scale > 0.1 * extent)
    clone_mask &= ~prune_mask
    split_mask &= ~prune_mask
    active = active & ~prune_mask

    # --- free-slot allocation (stable: inactive rows first, by index) ---
    free_slots = jnp.argsort(active, stable=True)  # False < True
    n_free = c - jnp.sum(active.astype(jnp.int32))
    clone_rank = jnp.cumsum(clone_mask.astype(jnp.int32)) - 1
    n_clone_req = jnp.sum(clone_mask.astype(jnp.int32))
    split_rank = jnp.cumsum(split_mask.astype(jnp.int32)) - 1 + n_clone_req
    clone_ok = clone_mask & (clone_rank < n_free)
    split_ok = split_mask & (split_rank < n_free)
    oob = jnp.asarray(c, dtype=jnp.int32)
    clone_dst = jnp.where(clone_ok,
                          free_slots[jnp.clip(clone_rank, 0, c - 1)], oob)
    split_dst = jnp.where(split_ok,
                          free_slots[jnp.clip(split_rank, 0, c - 1)], oob)

    # --- split children ---
    n2 = jax.random.normal(key, (2, c, 3))
    rot = transforms.quat_to_rotmat(transforms.normalize_quat(p.rotation))
    offs = jnp.einsum("nij,knj->kni", rot, n2 * scaling[None])  # (2, C, 3)
    child_xyz = p.xyz[None] + offs
    child_scaling = jnp.log(jnp.maximum(scaling / 1.6, 1e-12))

    new_params = {}
    for name in GaussianParams.__dataclass_fields__:
        leaf = getattr(p, name)
        if name not in _PER_GAUSSIAN:
            new_params[name] = leaf
            continue
        # Clone children: verbatim copies into free slots.
        leaf = _scatter_rows(leaf, clone_dst, getattr(p, name))
        if name == "xyz":
            sib = child_xyz[1]
            inplace = child_xyz[0]
        elif name == "scaling":
            sib = child_scaling
            inplace = child_scaling
        else:
            sib = getattr(p, name)
            inplace = None
        # Split sibling into a free slot.
        leaf = _scatter_rows(leaf, split_dst, sib)
        # Split parent replaced in place.
        if inplace is not None:
            m = split_ok.reshape((-1,) + (1,) * (leaf.ndim - 1))
            leaf = jnp.where(m, inplace, leaf)
        new_params[name] = leaf

    new_active = active.at[clone_dst].set(True, mode="drop")
    new_active = new_active.at[split_dst].set(True, mode="drop")

    # Optimizer surgery: zero moments of pruned rows, all new rows, and
    # in-place split parents (the reference removes+re-appends them).
    touched = prune_mask | split_ok
    touched = touched.at[clone_dst].set(True, mode="drop")
    touched = touched.at[split_dst].set(True, mode="drop")
    opt_state = zero_moments_rows(opt_state, touched)

    new_state = state.replace(
        params=GaussianParams(**new_params),
        active=new_active,
        xyz_gradient_accum=jnp.zeros((c,), dtype=jnp.float32),
        denom=jnp.zeros((c,), dtype=jnp.float32),
        max_radii2d=jnp.zeros((c,), dtype=jnp.float32),
    )
    info = {
        "n_cloned": jnp.sum(clone_ok.astype(jnp.int32)),
        "n_split": jnp.sum(split_ok.astype(jnp.int32)),
        "n_pruned": jnp.sum(prune_mask.astype(jnp.int32)),
        "n_dropped": (jnp.sum((clone_mask & ~clone_ok).astype(jnp.int32))
                      + jnp.sum((split_mask & ~split_ok).astype(jnp.int32))),
        "n_active": jnp.sum(new_active.astype(jnp.int32)),
    }
    return new_state, opt_state, info


@partial(jax.jit, donate_argnums=(0, 1))
def reset_opacity(state: GaussianState, opt_state: AdamState,
                  ceiling: float = 0.01):
    """Clamp opacity activation to ≤ `ceiling` and reset its Adam moments
    (`gaussian_model.py:261-265`, every 3000 iters)."""
    op = jax.nn.sigmoid(state.params.opacity)
    new_op = transforms.inverse_sigmoid(
        jnp.clip(jnp.minimum(op, ceiling), 1e-7, 1.0 - 1e-7))
    opt_state = zero_moments_rows(
        opt_state, jnp.ones(state.capacity, dtype=bool), only=("opacity",))
    return state.replace(params=state.params.replace(opacity=new_op)), opt_state


@partial(jax.jit, donate_argnums=(0, 1))
def prune_rows(state: GaussianState, opt_state: AdamState,
               prune_mask: jnp.ndarray):
    """Deactivate arbitrary rows (used by the depth-prior floating-object
    pruner, reference `GaussianOpt.floatingObj_prune` → `prune_points`)."""
    mask = prune_mask & state.active
    opt_state = zero_moments_rows(opt_state, mask)
    return (state.replace(active=state.active & ~mask), opt_state,
            jnp.sum(mask.astype(jnp.int32)))
