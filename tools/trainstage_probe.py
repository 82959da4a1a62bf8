#!/usr/bin/env python
"""Decompose the FULL train step's cost beyond the rasterizer
(VERDICT r03 #3: bench 15 Mray/s vs train-step ~4.9 Mray/s — where do the
other two thirds go?).

Times a ladder of jitted programs on the real chip, each adding one stage
of train/step.py's work, and differences them:

  A  rasterizer fwd+bwd       (render + mean loss, grads to all params)
  B  + L1+SSIM composite loss (the reference 0.8*L1 + 0.2*(1-SSIM))
  C  full train step          (Adam + overflow/NaN guards + densify stats
                               + metric vector)
  iso_ssim   SSIM fwd+bwd alone at the probe resolution
  iso_adam   adam_update alone at the full capacity
  iso_stats  add_densification_stats alone at the full capacity

Differences are attributable: SSIM+L1 = B-A, optimizer+stats+guards = C-B.
The isolated rows sanity-check the differences.

Usage: trainstage_probe.py [n_active] [capacity] [size]
(defaults 400k / 2M / 1024 — the r03 proof's steady-state shape)
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


def chain_time(step, init, iters=8):
    """Median-free two-length chain timing (cancels host round trip).

    Each run starts from a FRESH device copy of `init` — the full train
    step donates its inputs, so reusing the original pytree across runs
    would hand deleted buffers to the second run."""
    import jax
    import jax.numpy as jnp

    def run(k):
        x = jax.tree.map(jnp.array, init)
        jax.block_until_ready(x)
        t0 = time.time()
        for _ in range(k):
            x = step(x)
        jax.block_until_ready(x)
        return time.time() - t0

    run(1)  # compile
    lo = run(2)
    hi = run(iters + 2)
    return max(hi - lo, 1e-9) / iters


def main(argv):
    cpu = "--cpu" in argv
    argv = [a for a in argv if a != "--cpu"]
    n_active = int(argv[0]) if argv else 400_000
    capacity = int(argv[1]) if len(argv) > 1 else 1 << 21
    size = int(argv[2]) if len(argv) > 2 else 1024

    import jax
    import jax.numpy as jnp

    if cpu:
        # The axon plugin ignores JAX_PLATFORMS env; this is the only
        # reliable way to keep a sanity run off the (single-client) chip.
        jax.config.update("jax_platforms", "cpu")

    try:
        jax.config.update("jax_compilation_cache_dir", ".jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from priordepth_gaussiansplatting_tpu.models import densify as dops
    from priordepth_gaussiansplatting_tpu.models.gaussians import (
        GaussianParams, GaussianState)
    from priordepth_gaussiansplatting_tpu.ops import losses
    from priordepth_gaussiansplatting_tpu.ops import rasterize_pallas as rp
    from priordepth_gaussiansplatting_tpu.ops import binning
    from priordepth_gaussiansplatting_tpu.ops.render import render
    from priordepth_gaussiansplatting_tpu.train import optim
    from priordepth_gaussiansplatting_tpu.train import step as step_lib
    from priordepth_gaussiansplatting_tpu.utils import testing as T
    from priordepth_gaussiansplatting_tpu.utils.config import (
        OptimizationConfig, PipelineConfig)

    rng = np.random.RandomState(0)
    k = 16  # SH bases for degree 3

    def pad(x, fill=0.0):
        out = np.full((capacity,) + x.shape[1:], fill, np.float32)
        out[:n_active] = x
        return jnp.asarray(out)

    # A proof-run-like population: small anisotropic splats in the view.
    xyz = rng.uniform(-1, 1, (n_active, 3)).astype(np.float32)
    params = GaussianParams(
        xyz=pad(xyz),
        features_dc=pad(rng.rand(n_active, 3).astype(np.float32) * 0.5),
        features_rest=pad(np.zeros((n_active, (k - 1) * 3), np.float32)),
        scaling=pad(np.log(rng.uniform(0.001, 0.004, (n_active, 3))
                           .astype(np.float32)), np.log(1e-6)),
        rotation=pad(np.tile(np.array([[1, 0, 0, 0]], np.float32),
                             (n_active, 1))).at[:, 0].set(1.0),
        opacity=pad(np.full((n_active, 1), 0.5, np.float32), -6.0),
        exposure=jnp.eye(3, 4)[None],
    )
    state = GaussianState(
        params=params, active=jnp.arange(capacity) < n_active,
        max_radii2d=jnp.zeros(capacity), xyz_gradient_accum=jnp.zeros(capacity),
        denom=jnp.zeros(capacity),
        active_sh_degree=jnp.asarray(3, jnp.int32),
        spatial_lr_scale=1.0, max_sh_degree=3)
    opt_state = optim.init_adam(state.params)

    cam = T.look_at_camera((0, 0, -2.5), width=size, height=size)
    cam = dataclasses.replace(
        cam, image=jnp.asarray(rng.rand(3, size, size).astype(np.float32)))
    bg = jnp.zeros(3)
    opt_cfg = OptimizationConfig()
    pipe_cfg = PipelineConfig(backend="pallas", antialiasing=True)

    # Size the pair capacities once, like the trainer does.
    out = jax.jit(lambda s: render(cam, s, bg, antialiasing=True,
                                   backend="pallas"))(state)
    p_cap = rp.round_capacity(int(out["num_pairs"]) * 2 + binning.EXP_K)
    print(f"probe: n_active={n_active} capacity={capacity} size={size} "
          f"pairs={int(out['num_pairs'])} p_cap={p_cap}", flush=True)

    def render_loss(params_, off):
        st = state.replace(params=params_)
        o = render(cam, st, bg, antialiasing=True, backend="pallas",
                   screen_offset=off, pair_capacity=p_cap)
        return jnp.mean(o["render"]), o

    # --- A: rasterizer fwd+bwd ---
    @jax.jit
    def stepA(p):
        g = jax.grad(lambda pp: render_loss(
            pp, jnp.zeros((capacity, 2)))[0])(p)
        s = sum(jnp.ravel(x)[-1].astype(jnp.float32)
                for x in jax.tree.leaves(g))
        return jax.tree.map(lambda x: x + (s * 1e-30).astype(x.dtype), p)

    tA = chain_time(stepA, state.params)

    # --- B: + composite loss ---
    @jax.jit
    def stepB(p):
        def lf(pp):
            _, o = render_loss(pp, jnp.zeros((capacity, 2)))
            img = o["render"]
            ll1 = losses.l1_loss(img, cam.image)
            sv = losses.ssim(img, cam.image)
            return 0.8 * ll1 + 0.2 * (1.0 - sv)
        g = jax.grad(lf)(p)
        s = sum(jnp.ravel(x)[-1].astype(jnp.float32)
                for x in jax.tree.leaves(g))
        return jax.tree.map(lambda x: x + (s * 1e-30).astype(x.dtype), p)

    tB = chain_time(stepB, state.params)

    # --- C: the real full train step ---
    fns = step_lib.make_train_step(opt_cfg, pipe_cfg, pair_capacity=p_cap)
    key = jax.random.PRNGKey(0)

    def stepC(carry):
        st, op = carry
        st, op, _ = fns.step(st, op, cam, jnp.asarray(1000), key, bg)
        return (st, op)

    tC = chain_time(stepC, (state, opt_state))

    # --- isolated stages ---
    lrs = step_lib.learning_rates(jnp.asarray(1000), opt_cfg, 1.0)

    @jax.jit
    def iso_adam(carry):
        p, o = carry
        grads = jax.tree.map(lambda x: x * 1e-8, p)
        return optim.adam_update(p, grads, o, lrs,
                                 visibility=state.active, sparse=False)

    t_adam = chain_time(iso_adam, (state.params, opt_state))

    @jax.jit
    def iso_stats(st):
        st2 = dops.add_densification_stats(
            st, jnp.zeros((capacity, 2)), st.max_radii2d, size, size)
        return st2

    t_stats = chain_time(iso_stats, state)

    img0 = jnp.asarray(rng.rand(3, size, size).astype(np.float32))

    @jax.jit
    def iso_ssim(x):
        g = jax.grad(lambda im: losses.ssim(im, cam.image))(x)
        return x + g * 1e-30

    t_ssim = chain_time(iso_ssim, img0)

    rows = {
        "A_rasterizer_fwd_bwd_ms": tA * 1e3,
        "B_plus_composite_loss_ms": tB * 1e3,
        "C_full_train_step_ms": tC * 1e3,
        "ssim_l1_attributed_ms": (tB - tA) * 1e3,
        "optimizer_stats_attributed_ms": (tC - tB) * 1e3,
        "iso_ssim_ms": t_ssim * 1e3,
        "iso_adam_ms": t_adam * 1e3,
        "iso_densify_stats_ms": t_stats * 1e3,
        "implied_full_step_it_per_s": 1.0 / tC,
        "implied_rays_per_s": size * size / tC,
    }
    for kk, v in rows.items():
        print(f"  {kk:36s} {v:10.2f}", flush=True)
    print(json.dumps({"n_active": n_active, "capacity": capacity,
                      "size": size, **{kk: round(v, 3)
                                       for kk, v in rows.items()}}))


if __name__ == "__main__":
    main(sys.argv[1:])
