#!/usr/bin/env python
"""Per-step collective-traffic model for the sharded train step.

VERDICT r04 #7: the 8-device dryrun proves sharded == unsharded, but
nothing MEASURED the tile-shard path's cost model, and no pod exists in
this environment to time real ICI. The provable proxy is collective
VOLUME: lower the full sharded train step (shard_map emits manual
collectives) on a virtual CPU mesh at a realistic shape and sum the bytes
each collective moves per step, per op kind. This is
hardware-independent — the same HLO is what a pod would execute — so the
table in docs/DISTRIBUTED.md stays honest without multi-chip hardware.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
      python tools/collective_probe.py [capacity] [width] [height]
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS; force the CPU client (same
# workaround as tests/conftest.py) so the virtual 8-device mesh exists.
jax.config.update("jax_platforms", "cpu")

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1,
                "f16": 2, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "u64": 8}

_COLLECTIVES = ("all-gather", "all-reduce", "reduce-scatter",
                "all-to-all", "collective-permute")

# `f32[8,256]{1,0}` (layout braces optional) — the result shape that
# prefixes each op in optimized HLO text.
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(dtype: str, dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dtype, 4)


def collective_bytes(hlo_text: str) -> dict:
    """Sum result bytes per collective kind from optimized HLO text.

    Optimized (post-SPMD) HLO has one line per op with the result shape up
    front (`%x = f32[2097152]{0} all-gather(...)`) and single-participant
    collectives already elided, so result bytes are an honest per-step
    traffic model (all-gather result = bytes landing on each rank;
    all-reduce result = reduced bytes each rank ends with).
    """
    out = {k: {"count": 0, "bytes": 0} for k in _COLLECTIVES}
    for line in hlo_text.splitlines():
        ls = line.strip()
        for kind in _COLLECTIVES:
            if re.search(rf"\b{kind}(?:-start|-done)?\(", ls):
                if kind + "-done(" in ls:
                    break  # counted at the -start op
                m = _SHAPE_RE.search(ls.split("=")[0] if "=" in ls else ls)
                # result may be a tuple `(f32[...], f32[...])` — sum all
                head = ls.split(kind)[0]
                shapes = _SHAPE_RE.findall(head)
                b = sum(_shape_bytes(d, n) for d, n in shapes)
                del m
                out[kind]["count"] += 1
                out[kind]["bytes"] += b
                break
    return out


def build_and_measure(n_data: int, n_gauss: int, tile_shard: bool,
                      capacity: int, width: int, height: int,
                      pair_capacity: int) -> dict:
    from priordepth_gaussiansplatting_tpu.models import gaussians as gm
    from priordepth_gaussiansplatting_tpu.parallel import integrate as par
    from priordepth_gaussiansplatting_tpu.parallel import mesh as mesh_lib
    from priordepth_gaussiansplatting_tpu.parallel import step as pstep
    from priordepth_gaussiansplatting_tpu.train import optim
    from priordepth_gaussiansplatting_tpu.utils import testing as T
    from priordepth_gaussiansplatting_tpu.utils.config import (
        OptimizationConfig, PipelineConfig)

    mesh = mesh_lib.make_mesh(n_data, n_gauss)
    rng = np.random.RandomState(0)
    n_pts = min(capacity, 4096)
    state = gm.create_from_points(
        rng.uniform(-0.8, 0.8, (n_pts, 3)).astype(np.float32),
        rng.rand(n_pts, 3).astype(np.float32),
        num_images=n_data, capacity=capacity)
    opt_state = optim.init_adam(state.params)
    state, opt_state = par.interleave_rows(state, opt_state, n_gauss)

    cams = []
    for i in range(n_data):
        cam = T.look_at_camera((0, 0, -2.5), width=width, height=height,
                               exposure_id=0)
        img = jnp.zeros((3, height, width), jnp.float32)
        cams.append(dataclasses.replace(cam, image=img))
    cam_batch = pstep.stack_cameras(cams)

    fns = par.make_sharded_fns(
        OptimizationConfig(), PipelineConfig(backend="pallas"), mesh,
        tile_shard=tile_shard, pair_capacity=pair_capacity)
    lowered = fns.step.lower(state, opt_state, cam_batch,
                             jnp.asarray(100), jax.random.PRNGKey(0),
                             jnp.zeros(3))
    return collective_bytes(lowered.compile().as_text())


def main(argv):
    capacity = int(argv[0]) if argv else 1 << 20
    width = int(argv[1]) if len(argv) > 1 else 1600
    height = int(argv[2]) if len(argv) > 2 else 1066
    from priordepth_gaussiansplatting_tpu.ops import rasterize_pallas as rp
    pair_capacity = rp.round_capacity(int(capacity * 2.62))

    configs = [
        ("DP 8x1", 8, 1, False),
        ("gauss 1x8", 1, 8, False),
        ("gauss 1x8 tile_shard", 1, 8, True),
        ("hybrid 4x2 tile_shard", 4, 2, True),
    ]
    rows = {}
    for label, nd, ng, ts in configs:
        res = build_and_measure(nd, ng, ts, capacity, width, height,
                                pair_capacity)
        rows[label] = res
        total = sum(v["bytes"] for v in res.values())
        parts = ", ".join(f"{k}:{v['count']}x/{v['bytes'] / 1e6:.1f}MB"
                          for k, v in res.items() if v["count"])
        print(f"{label:24s} total {total / 1e6:8.1f} MB/step   {parts}",
              flush=True)
    out = {"capacity": capacity, "width": width, "height": height,
           "pair_capacity": pair_capacity, "configs": rows}
    path = os.path.join(REPO, "docs", "COLLECTIVES.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
