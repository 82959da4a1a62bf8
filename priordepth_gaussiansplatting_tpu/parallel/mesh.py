"""Device mesh + sharding rules for multi-chip training.

The reference has NO distributed 3DGS path (hard-pinned cuda:0,
SURVEY.md §2.11); this is the TPU-native scaling design:

  mesh axes:
    data  — camera batch data-parallel: each data rank renders its own
            camera(s); parameter gradients are psum'd over ICI.
    gauss — Gaussian-primitive sharding (the TP analog): the fixed-capacity
            parameter store's leading axis is sharded; projection, Adam,
            densification bookkeeping and clone/split/prune all run on the
            local shard; the projected screen-space attributes are
            all-gathered for rasterization (gather VJP = reduce-to-shard).

Multi-host: `jax.distributed.initialize()` before building the mesh; the
mesh spans all devices, `data` laid out over DCN-adjacent axes and `gauss`
within a slice so the per-step all-gather rides ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..models.gaussians import GaussianParams, GaussianState
from ..train.optim import AdamState

DATA_AXIS = "data"
GAUSS_AXIS = "gauss"

# Per-Gaussian leaves (leading axis = capacity) are sharded over GAUSS_AXIS.
_PER_GAUSSIAN = ("xyz", "features_dc", "features_rest", "scaling",
                 "rotation", "opacity")


def make_mesh(n_data: int, n_gauss: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data * n_gauss
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.asarray(devices[:n]).reshape(n_data, n_gauss)
    return Mesh(arr, (DATA_AXIS, GAUSS_AXIS))


def params_spec() -> GaussianParams:
    return GaussianParams(
        **{k: (P(GAUSS_AXIS) if k in _PER_GAUSSIAN else P())
           for k in GaussianParams.__dataclass_fields__})


def state_spec(template: GaussianState | None = None) -> GaussianState:
    """Spec pytree for GaussianState. Pass the real state as `template` so
    the spec's STATIC dataclass fields (spatial_lr_scale, max_sh_degree)
    match — pytree equality includes aux data."""
    kw = {}
    if template is not None:
        kw = dict(spatial_lr_scale=template.spatial_lr_scale,
                  max_sh_degree=template.max_sh_degree)
    return GaussianState(
        params=params_spec(),
        active=P(GAUSS_AXIS), max_radii2d=P(GAUSS_AXIS),
        xyz_gradient_accum=P(GAUSS_AXIS), denom=P(GAUSS_AXIS),
        active_sh_degree=P(), **kw)


def adam_spec() -> AdamState:
    return AdamState(mu=params_spec(), nu=params_spec(), count=P())


def camera_batch_spec(camera_template):
    """Cameras stacked on a leading batch axis, sharded over DATA_AXIS."""
    return jax.tree.map(lambda _: P(DATA_AXIS), camera_template)


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> bool:
    """Join a multi-host run via `jax.distributed.initialize`.

    The TPU-native replacement for the reference's
    `torch.distributed.init_process_group` NCCL setup (ZoeDepth
    `utils/misc.py:262-276`, SURVEY.md §5.8): afterwards `jax.devices()`
    spans every host's chips and the meshes built here lay DATA over the
    DCN-adjacent axis. Arguments default to the standard environment
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID, or the TPU metadata
    autodetection inside jax). Returns True if a multi-process run was
    initialised, False for the single-process case (no env, no args) —
    callers can treat False as "rank 0 of 1". Rank-0 gating (the
    reference's `rank == 0` checks) maps to `jax.process_index() == 0`.
    """
    import os
    if (coordinator_address is None and num_processes is None
            and process_id is None
            and "COORDINATOR_ADDRESS" not in os.environ
            and "JAX_COORDINATOR_ADDRESS" not in os.environ
            and "MEGASCALE_COORDINATOR_ADDRESS" not in os.environ):
        return False
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True
