#!/usr/bin/env python
"""On-chip shard_map overhead: unsharded step vs mesh(1,1) sharded step.

VERDICT r04 #7's on-chip half: with one real chip, the measurable part of
the distributed design is what the shard_map machinery itself costs when
the mesh is trivial — the sharded program must not tax the single-chip
path. Times both jitted train steps on the same synthetic state/camera
and reports ms/step + the ratio.

Usage: PYTHONPATH=. python tools/mesh_overhead_probe.py [n_gauss] [size]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv):
    n = int(argv[0]) if argv else 200_000
    size = int(argv[1]) if len(argv) > 1 else 1024

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(REPO, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from priordepth_gaussiansplatting_tpu.models import gaussians as gm
    from priordepth_gaussiansplatting_tpu.ops import rasterize_pallas as rp
    from priordepth_gaussiansplatting_tpu.parallel import integrate as par
    from priordepth_gaussiansplatting_tpu.parallel import mesh as mesh_lib
    from priordepth_gaussiansplatting_tpu.parallel import step as pstep
    from priordepth_gaussiansplatting_tpu.train import optim
    from priordepth_gaussiansplatting_tpu.train import step as step_lib
    from priordepth_gaussiansplatting_tpu.utils import testing as T
    from priordepth_gaussiansplatting_tpu.utils.config import (
        OptimizationConfig, PipelineConfig)

    rng = np.random.RandomState(0)
    state = gm.create_from_points(
        rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32),
        rng.rand(n, 3).astype(np.float32),
        num_images=1, capacity=2 * n)
    opt_state = optim.init_adam(state.params)
    cam = T.look_at_camera((0, 0, -2.5), width=size, height=size,
                           exposure_id=0)
    img = jnp.asarray(rng.rand(3, size, size).astype(np.float32))
    cam = dataclasses.replace(cam, image=img)
    pair_cap = rp.round_capacity(8 * n)

    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(backend="pallas")
    bg = jnp.zeros(3)
    key = jax.random.PRNGKey(0)

    def chain(stepf, st, ot, camx, iters):
        def one(st, ot):
            s, o = jax.tree.map(jnp.array, st), jax.tree.map(jnp.array, ot)
            jax.block_until_ready((s, o))
            t0 = time.time()
            for i in range(iters):
                s, o, m = stepf(s, o, camx, jnp.asarray(100 + i), key, bg)
            jax.block_until_ready(m["loss"])
            return time.time() - t0
        one(st, ot); one(st, ot)  # warm compile + dispatch
        t2 = min(one(st, ot) for _ in range(2))
        return t2 / iters

    fns_u = step_lib.make_train_step(opt_cfg, pipe_cfg,
                                     pair_capacity=pair_cap)
    t_unshard = chain(fns_u.step, state, opt_state, cam, 6)

    mesh = mesh_lib.make_mesh(1, 1)
    st_m, ot_m = par.interleave_rows(state, opt_state, 1)
    st_m, ot_m = par.place_sharded(st_m, ot_m, mesh)
    cam_b = pstep.stack_cameras([cam])
    fns_m = par.make_sharded_fns(opt_cfg, pipe_cfg, mesh,
                                 pair_capacity=pair_cap)
    t_mesh = chain(fns_m.step, st_m, ot_m, cam_b, 6)

    out = {"n_gauss": n, "size": size,
           "unsharded_ms": round(t_unshard * 1e3, 2),
           "mesh11_ms": round(t_mesh * 1e3, 2),
           "overhead_pct": round((t_mesh / t_unshard - 1) * 100, 2)}
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
