"""Glue between the host Trainer and the multi-chip step: sharded state
placement, shard-local densify/opacity-reset wrappers, and shard-aware
capacity regrow.

The reference has no distributed 3DGS path (SURVEY.md §2.11); these hooks
let the SAME `train.py` CLI drive the camera-DP × Gaussian-shard ×
tile-band design (`--n_data/--n_gauss/--tile_shard`) that
`parallel/step.py` implements, so the flagship scaling configuration is a
product surface, not a test fixture.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..models import densify as densify_ops
from ..models import gaussians as gm
from ..models.gaussians import GaussianParams, GaussianState
from ..train import optim
from ..train.step import TrainStepFns
from ..utils.config import OptimizationConfig, PipelineConfig
from . import mesh as mesh_lib
from . import step as pstep


def _permute_rows(state: GaussianState, opt_state: optim.AdamState, perm):
    """Apply a row permutation (perm[dst] = src) to every per-Gaussian leaf
    of the state and the Adam moments. Row order is semantically irrelevant
    (the pair pipeline depth-sorts), so any permutation is loss-preserving."""
    perm = jnp.asarray(perm)

    def take(x):
        return x[perm]

    def take_params(p: GaussianParams) -> GaussianParams:
        return GaussianParams(
            **{k: (take(getattr(p, k)) if k in mesh_lib._PER_GAUSSIAN
                   else getattr(p, k))
               for k in GaussianParams.__dataclass_fields__})

    state = dataclasses.replace(
        state, params=take_params(state.params), active=take(state.active),
        max_radii2d=take(state.max_radii2d),
        xyz_gradient_accum=take(state.xyz_gradient_accum),
        denom=take(state.denom))
    opt_state = optim.AdamState(mu=take_params(opt_state.mu),
                                nu=take_params(opt_state.nu),
                                count=opt_state.count)
    return state, opt_state


def interleave_rows(state: GaussianState, opt_state: optim.AdamState,
                    n_gauss: int):
    """Permute Gaussian rows so active rows spread evenly across shards.

    `create_from_points` packs live rows at the front; sharding that layout
    would fill shard 0 and leave the last shard empty (no free slots for
    shard-local densification, all projection work on one rank). Place
    row i at shard (i mod n_gauss)."""
    c = state.capacity
    if n_gauss <= 1 or c % n_gauss != 0:
        return state, opt_state
    # perm[dst] = src: shard k's slot j takes old row j*n_gauss + k.
    perm = np.concatenate([np.arange(k, c, n_gauss) for k in range(n_gauss)])
    return _permute_rows(state, opt_state, perm)


def compact_rows(state: GaussianState, opt_state: optim.AdamState):
    """Pack active rows at the front (inactive tail preserved in order).

    Restoring a checkpoint into a sharded trainer needs shard-balanced
    actives; compacting first makes the follow-up `interleave_rows` balance
    EXACTLY regardless of where the checkpoint's free slots were (a
    mid-training save has densify holes scattered arbitrarily)."""
    act = np.asarray(state.active)
    perm = np.concatenate([np.flatnonzero(act), np.flatnonzero(~act)])
    return _permute_rows(state, opt_state, perm)


def pad_capacity_to_multiple(state: GaussianState,
                             opt_state: optim.AdamState, n_gauss: int):
    """Round capacity up to a multiple of n_gauss (shard rows must divide
    evenly). Used when restoring a checkpoint whose capacity was chosen
    without a mesh in mind."""
    c = state.capacity
    target = -(-c // n_gauss) * n_gauss
    if target == c:
        return state, opt_state
    state = gm.grow_capacity(state, target)
    extra = target - c

    def padp(p: GaussianParams) -> GaussianParams:
        def pad(x):
            widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        return GaussianParams(
            **{k: (pad(getattr(p, k)) if k in mesh_lib._PER_GAUSSIAN
                   else getattr(p, k))
               for k in GaussianParams.__dataclass_fields__})

    opt_state = optim.AdamState(mu=padp(opt_state.mu), nu=padp(opt_state.nu),
                                count=opt_state.count)
    return state, opt_state


def place_sharded(state: GaussianState, opt_state: optim.AdamState, mesh):
    """device_put the training pytrees with the mesh's shardings."""
    def put(tree, spec_tree):
        # Flatten both sides: the spec pytree's STATIC dataclass fields
        # (spatial_lr_scale etc.) don't match the real state's, so a joint
        # tree.map would reject the treedefs; leaves align positionally.
        specs = jax.tree.leaves(spec_tree,
                                is_leaf=lambda x: isinstance(x, P))
        leaves, treedef = jax.tree.flatten(tree)
        assert len(specs) == len(leaves), (len(specs), len(leaves))
        out = [jax.device_put(x, NamedSharding(mesh, s))
               for x, s in zip(leaves, specs)]
        return jax.tree.unflatten(treedef, out)

    state = put(state, mesh_lib.state_spec())
    opt_state = put(opt_state, mesh_lib.adam_spec())
    return state, opt_state


def grow_sharded(state: GaussianState, opt_state: optim.AdamState, mesh,
                 occupancy_threshold: float = 0.85, factor: int = 2):
    """Shard-aware capacity regrow: each shard's slot range grows in place.

    Plain `grow_capacity` pads at the END of the global array, which would
    hand every new free slot to the LAST shard; here each shard's local
    range is padded so free capacity stays balanced."""
    n_gauss = int(mesh.shape[mesh_lib.GAUSS_AXIS])
    n_active = int(state.num_active)
    if n_active <= occupancy_threshold * state.capacity:
        return state, opt_state, False
    c = state.capacity
    local = c // n_gauss
    new_local = local * factor
    extra = new_local - local

    def grow(x, fill=0.0):
        x = np.asarray(x)
        shaped = x.reshape((n_gauss, local) + x.shape[1:])
        widths = [(0, 0), (0, extra)] + [(0, 0)] * (x.ndim - 1)
        return jnp.asarray(np.pad(shaped, widths, constant_values=fill)
                           .reshape((n_gauss * new_local,) + x.shape[1:]))

    def grow_params(p: GaussianParams, rot_fill: bool) -> GaussianParams:
        out = {}
        for k in GaussianParams.__dataclass_fields__:
            v = getattr(p, k)
            if k not in mesh_lib._PER_GAUSSIAN:
                out[k] = v
            elif k == "rotation" and rot_fill:
                g = np.array(grow(v))  # writable host copy
                g[g.sum(-1) == 0] = [1, 0, 0, 0]
                out[k] = jnp.asarray(g)
            else:
                out[k] = grow(v)
        return GaussianParams(**out)

    state = dataclasses.replace(
        state, params=grow_params(state.params, rot_fill=True),
        active=grow(state.active, fill=False),
        max_radii2d=grow(state.max_radii2d),
        xyz_gradient_accum=grow(state.xyz_gradient_accum),
        denom=grow(state.denom))
    opt_state = optim.AdamState(mu=grow_params(opt_state.mu, rot_fill=False),
                                nu=grow_params(opt_state.nu, rot_fill=False),
                                count=opt_state.count)
    state, opt_state = place_sharded(state, opt_state, mesh)
    return state, opt_state, True


def make_sharded_fns(opt_cfg: OptimizationConfig, pipe_cfg: PipelineConfig,
                     mesh, use_trained_exp: bool = False,
                     tile_shard: bool = False,
                     pair_capacity: int | None = None) -> TrainStepFns:
    """TrainStepFns over the mesh: sharded step + shard-local densify/reset.

    The step takes a CAMERA BATCH (leading axis = data ranks); densify runs
    per Gaussian shard with a rank-folded key (each shard manages its own
    free slots); opacity reset is elementwise and shape-preserving so the
    single-chip implementation is reused directly under shard_map."""
    ad_spec = mesh_lib.adam_spec()

    step = pstep.make_sharded_train_step(
        opt_cfg, pipe_cfg, mesh, use_trained_exp=use_trained_exp,
        tile_shard=tile_shard, pair_capacity=pair_capacity)

    def _dens_local(s, o, k, use_size_threshold):
        k = jax.random.fold_in(k, jax.lax.axis_index(mesh_lib.GAUSS_AXIS))
        max_screen = 20.0 if use_size_threshold else 0.0
        s2, o2, info = densify_ops.densify_and_prune(
            s, o, k, opt_cfg.densify_grad_threshold, 0.005,
            s.spatial_lr_scale, max_screen,
            percent_dense=opt_cfg.percent_dense)
        info = {k2: jax.lax.psum(v, mesh_lib.GAUSS_AXIS)
                for k2, v in info.items()}
        return s2, o2, info

    info_spec = {k: P() for k in ("n_cloned", "n_split", "n_pruned",
                                  "n_dropped", "n_active")}

    def densify(state, opt_state, key, use_size_threshold: bool = False):
        st_spec = mesh_lib.state_spec(state)
        fn = shard_map(
            lambda s, o, k: _dens_local(s, o, k, use_size_threshold),
            mesh=mesh, in_specs=(st_spec, ad_spec, P()),
            out_specs=(st_spec, ad_spec, info_spec), check_rep=False)
        return jax.jit(fn, donate_argnums=(0, 1))(state, opt_state, key)

    def reset_opacity(state, opt_state, ceiling: float = 0.01):
        st_spec = mesh_lib.state_spec(state)
        fn = shard_map(
            lambda s, o: densify_ops.reset_opacity(s, o, ceiling),
            mesh=mesh, in_specs=(st_spec, ad_spec),
            out_specs=(st_spec, ad_spec), check_rep=False)
        return jax.jit(fn, donate_argnums=(0, 1))(state, opt_state)

    return TrainStepFns(step=step, densify=densify,
                        reset_opacity=reset_opacity)
