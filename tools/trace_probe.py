#!/usr/bin/env python
"""Profile the full fwd+bwd bench step with jax.profiler and aggregate
device op times from the chrome trace — one compile (cache-shared with
bench.py), exact per-op attribution.

Usage: python tools/trace_probe.py [n_gaussians]
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def main(argv):
    n = int(argv[0]) if argv else 1_000_000
    w, h = 1600, 1066

    from priordepth_gaussiansplatting_tpu.core import transforms
    from priordepth_gaussiansplatting_tpu.ops import binning
    from priordepth_gaussiansplatting_tpu.ops import projection as proj_ops
    from priordepth_gaussiansplatting_tpu.ops import rasterize_pallas as rp
    from priordepth_gaussiansplatting_tpu.utils import testing as T

    print(f"backend={jax.default_backend()} n={n}", flush=True)
    key = jax.random.PRNGKey(0)
    cam = T.look_at_camera((0, 0, -2.5), width=w, height=h)
    params = T.random_gaussians(key, n, extent=1.0,
                                scale_range=(0.001, 0.004))
    target = jax.random.uniform(jax.random.PRNGKey(1), (3, h, w))

    def project(p):
        cov3d = transforms.scaling_rotation_to_cov3d(p["scales"], p["quats"])
        return proj_ops.project_gaussians(
            p["means"], cov3d, p["opacities"], p["sh"], 3,
            cam.world_view, cam.full_proj, cam.cam_center,
            w, h, cam.tan_fovx, cam.tan_fovy, antialiasing=True)

    probe_cap = rp.default_pair_capacity(n)
    _, aux = jax.jit(lambda p: binning.bin_sorted_pairs(
        project(p), w, h, probe_cap))(params)
    p_cap = rp.round_capacity(int(int(aux["num_rect"]) * 1.05))
    v_cap = rp.round_capacity(int(int(aux["num_valid"]) * 1.05))
    print(f"rect={int(aux['num_rect'])} valid={int(aux['num_valid'])} "
          f"p_cap={p_cap} v_cap={v_cap}", flush=True)

    def loss_fn(p):
        out = rp.rasterize(project(p), jnp.zeros(3), w, h,
                           pair_capacity=p_cap, valid_capacity=v_cap)
        return (jnp.mean((out["render"] - target) ** 2)
                + 0.01 * jnp.mean(out["invdepth"]))

    def step(p, s):
        g = jax.grad(loss_fn)(p)
        s2 = sum(jnp.ravel(x)[-1].astype(jnp.float32)
                 for x in jax.tree.leaves(g))
        p2 = jax.tree.map(lambda x: x + (s2 * 1e-38).astype(x.dtype), p)
        return p2, s2

    step = jax.jit(step)

    # warm up / compile outside the trace
    p, s = params, jnp.float32(0.0)
    for _ in range(2):
        p, s = step(p, s)
    float(s)
    print("warmed up; tracing...", flush=True)

    trace_dir = "/tmp/pdgs_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        p2, s2 = params, jnp.float32(0.0)
        for _ in range(3):
            p2, s2 = step(p2, s2)
        float(s2)

    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    print(f"trace files: {files}", flush=True)
    if not files:
        print("NO TRACE produced (tunnel may not support profiling)")
        return 1
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)

    # Aggregate device-lane complete events by name.
    by_name = defaultdict(float)
    cnt = defaultdict(int)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    dev_pids = {pid for pid, nm in pid_names.items()
                if "TPU" in nm or "/device" in nm.lower()}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        by_name[name] += ev.get("dur", 0)
        cnt[name] += 1
    total = sum(by_name.values())
    print(f"\n{'op':<72} {'ms/step':>9} {'n':>5}  %")
    for name, us in sorted(by_name.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{name[:72]:<72} {us / 1e3 / 3:9.2f} {cnt[name]:>5} "
              f"{100 * us / max(total, 1):5.1f}")
    print(f"\ndevice total ~= {total / 1e3 / 3:.1f} ms/step "
          f"(pids={sorted(pid_names.items())[:8]})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
