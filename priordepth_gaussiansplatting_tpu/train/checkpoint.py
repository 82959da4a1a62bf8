"""Persistence: training checkpoints, model snapshots, exposure.json.

Three formats, mirroring the reference (SURVEY.md §5.4):
  1. training checkpoint  — full (GaussianState, AdamState, iteration) pytree
     (reference `torch.save((capture(), iter))`, `train.py:340-342`); here a
     pickled dict of numpy arrays, `chkpnt<iter>.pkl`.
  2. model snapshot       — `point_cloud/iteration_<it>/point_cloud.ply`
     (byte-compatible with SIBR viewers) + `exposure.json`
     (`scene/__init__.py:85-94`). Only ACTIVE rows are exported.
  3. run config           — `cfg_args` (utils/config.py).
"""

from __future__ import annotations

import json
import os
import pickle
import re

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianParams, GaussianState
from ..models import gaussians as gm
from . import optim
from ..data import ply as ply_io


def save_checkpoint(path: str, state: GaussianState, opt_state: optim.AdamState,
                    iteration: int, compact: bool = False) -> None:
    """Pickle the full training state (reference `torch.save((capture(), it))`).

    compact=True stores only the ACTIVE rows (gathered on-device before the
    host pull): a capacity-2M store with 400k live rows shrinks ~5×, which
    matters when the device→host link is slow (remote-TPU tunnels measure
    ~16 MB/s). `load_checkpoint` re-pads to the recorded capacity.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if compact:
        idx = jnp.asarray(np.flatnonzero(np.asarray(state.active)))

        def take(p: GaussianParams) -> dict:
            d = dataclass_to_dict(p)
            return {k: (v if k == "exposure" else jnp.take(v, idx, axis=0))
                    for k, v in d.items()}

        row = lambda x: jnp.take(x, idx, axis=0)
        state_d = {"params": take(state.params),
                   "max_radii2d": row(state.max_radii2d),
                   "xyz_gradient_accum": row(state.xyz_gradient_accum),
                   "denom": row(state.denom),
                   "active_sh_degree": state.active_sh_degree}
        opt_d = {"mu": take(opt_state.mu), "nu": take(opt_state.nu),
                 "count": opt_state.count}
    else:
        state_d = {"params": dataclass_to_dict(state.params),
                   "active": state.active,
                   "max_radii2d": state.max_radii2d,
                   "xyz_gradient_accum": state.xyz_gradient_accum,
                   "denom": state.denom,
                   "active_sh_degree": state.active_sh_degree}
        opt_d = {"mu": dataclass_to_dict(opt_state.mu),
                 "nu": dataclass_to_dict(opt_state.nu),
                 "count": opt_state.count}
    payload = {
        "iteration": iteration,
        "spatial_lr_scale": state.spatial_lr_scale,
        "max_sh_degree": state.max_sh_degree,
        "state": jax.tree.map(np.asarray, state_d),
        "opt": jax.tree.map(np.asarray, opt_d),
    }
    if compact:
        payload["compact_capacity"] = state.capacity
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f)
    os.replace(tmp, path)


def _flat_features(d: dict) -> dict:
    """Back-compat: reshape legacy (N, K, 3) feature leaves to the flat
    (N, 3K) model-store layout (see models/gaussians.py)."""
    out = dict(d)
    for k in ("features_dc", "features_rest"):
        v = np.asarray(out[k])
        if v.ndim == 3:
            out[k] = v.reshape(v.shape[0], -1)
    return out


def load_checkpoint(path: str):
    with open(path, "rb") as f:
        p = pickle.load(f)
    s = p["state"]
    if "compact_capacity" in p:
        cap = int(p["compact_capacity"])
        n = int(np.asarray(s["params"]["xyz"]).shape[0])

        def padrow(x, fill=0.0):
            x = np.asarray(x)
            widths = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
            return np.pad(x, widths, constant_values=fill)

        # Padding rows need finite activations (unit quats, tiny scales —
        # same fills as gm.create_from_points/grow_capacity): an all-zero
        # quaternion normalises to NaN and poisons the whole state through
        # the first gradient step.
        PARAM_FILLS = {"scaling": np.log(1e-6), "opacity": -6.0}

        def padp(d: dict, param_fills: bool) -> dict:
            out = {}
            for k, v in d.items():
                if k == "exposure":
                    out[k] = v
                elif param_fills and k == "rotation":
                    pad = np.zeros((cap - n, 4), np.asarray(v).dtype)
                    pad[:, 0] = 1.0
                    out[k] = np.concatenate([np.asarray(v), pad])
                else:
                    out[k] = padrow(v, PARAM_FILLS.get(k, 0.0)
                                    if param_fills else 0.0)
            return out

        s = {"params": padp(s["params"], True),
             "active": np.arange(cap) < n,
             "max_radii2d": padrow(s["max_radii2d"]),
             "xyz_gradient_accum": padrow(s["xyz_gradient_accum"]),
             "denom": padrow(s["denom"]),
             "active_sh_degree": s["active_sh_degree"]}
        o = p["opt"]
        p = dict(p)
        p["opt"] = {"mu": padp(o["mu"], False), "nu": padp(o["nu"], False),
                    "count": o["count"]}
    state = GaussianState(
        params=GaussianParams(**{k: jnp.asarray(v)
                                 for k, v in _flat_features(
                                     s["params"]).items()}),
        active=jnp.asarray(s["active"]),
        max_radii2d=jnp.asarray(s["max_radii2d"]),
        xyz_gradient_accum=jnp.asarray(s["xyz_gradient_accum"]),
        denom=jnp.asarray(s["denom"]),
        active_sh_degree=jnp.asarray(s["active_sh_degree"]),
        spatial_lr_scale=p["spatial_lr_scale"],
        max_sh_degree=p["max_sh_degree"])
    o = p["opt"]
    opt_state = optim.AdamState(
        mu=GaussianParams(**{k: jnp.asarray(v)
                             for k, v in _flat_features(o["mu"]).items()}),
        nu=GaussianParams(**{k: jnp.asarray(v)
                             for k, v in _flat_features(o["nu"]).items()}),
        count=jnp.asarray(o["count"]))
    return state, opt_state, p["iteration"]


def dataclass_to_dict(params: GaussianParams) -> dict:
    return {k: getattr(params, k) for k in GaussianParams.__dataclass_fields__}


def save_model_snapshot(model_path: str, iteration: int, state: GaussianState,
                        image_names=None) -> None:
    """PLY + exposure.json, active rows only (reference `scene.save`)."""
    out_dir = os.path.join(model_path, "point_cloud",
                           f"iteration_{iteration}")
    os.makedirs(out_dir, exist_ok=True)
    active = np.asarray(state.active)
    p = state.params
    ply_io.save_gaussian_ply(
        os.path.join(out_dir, "point_cloud.ply"),
        np.asarray(p.xyz)[active], np.asarray(p.features_dc)[active],
        np.asarray(p.features_rest)[active], np.asarray(p.opacity)[active],
        np.asarray(p.scaling)[active], np.asarray(p.rotation)[active])
    if image_names:
        exposures = {name: np.asarray(p.exposure[i]).tolist()
                     for name, i in image_names.items()
                     if i < p.exposure.shape[0]}
        with open(os.path.join(model_path, "exposure.json"), "w") as f:
            json.dump(exposures, f, indent=2)


def load_model_snapshot(model_path: str, iteration: int = -1,
                        max_sh_degree: int = 3,
                        capacity: int | None = None) -> GaussianState:
    """Load a saved PLY snapshot into a GaussianState (reference `load_ply`
    + `searchForMaxIteration`, `utils/system_utils.py:26-28`)."""
    pc_dir = os.path.join(model_path, "point_cloud")
    if iteration == -1:
        iters = [int(m.group(1)) for d in os.listdir(pc_dir)
                 if (m := re.match(r"iteration_(\d+)$", d))]
        iteration = max(iters)
    ply_path = os.path.join(pc_dir, f"iteration_{iteration}",
                            "point_cloud.ply")
    d = ply_io.load_gaussian_ply(ply_path)
    n = d["xyz"].shape[0]
    if capacity is None:
        capacity = int(2 ** np.ceil(np.log2(max(n, 1024))))
    if capacity < n:
        capacity = n

    def pad(x, fill=0.0):
        widths = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.asarray(np.pad(x, widths, constant_values=fill))

    params = GaussianParams(
        xyz=pad(d["xyz"]),
        features_dc=pad(d["features_dc"]),
        features_rest=pad(d["features_rest"]),
        scaling=pad(d["scaling"], np.log(1e-6)),
        rotation=jnp.asarray(np.concatenate(
            [d["rotation"],
             np.tile(np.array([[1, 0, 0, 0]], np.float32),
                     (capacity - n, 1))])),
        opacity=pad(d["opacity"], -6.0),
        exposure=jnp.tile(jnp.eye(3, 4)[None], (1, 1, 1)),
    )
    zeros = lambda: jnp.zeros((capacity,), jnp.float32)
    return GaussianState(
        params=params, active=jnp.arange(capacity) < n,
        max_radii2d=zeros(), xyz_gradient_accum=zeros(), denom=zeros(),
        active_sh_degree=jnp.asarray(max_sh_degree, jnp.int32),
        spatial_lr_scale=1.0, max_sh_degree=max_sh_degree)


def maybe_grow(state: GaussianState, opt_state: optim.AdamState,
               occupancy_threshold: float = 0.85, factor: int = 2):
    """Host-side capacity regrow when the store is nearly full."""
    n_active = int(state.num_active)
    if n_active <= occupancy_threshold * state.capacity:
        return state, opt_state, False
    new_cap = state.capacity * factor
    state = gm.grow_capacity(state, new_cap)

    def grow_params(p: GaussianParams) -> GaussianParams:
        extra = new_cap - p.xyz.shape[0]

        def padp(x):
            widths = [(0, extra)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)

        return GaussianParams(
            **{k: (padp(getattr(p, k)) if k != "exposure"
                   else getattr(p, k))
               for k in GaussianParams.__dataclass_fields__})

    opt_state = optim.AdamState(mu=grow_params(opt_state.mu),
                                nu=grow_params(opt_state.nu),
                                count=opt_state.count)
    return state, opt_state, True
