"""The r05 numeric helpers: round_bf16 (RTNE + straight-through grad +
NaN preservation) and the compositor's _plog/_pexp/_cumprod_incl.

These exist because the 2026-08 TPU runtime (a) elides f32->bf16->f32
double-casts in XLA, and (b) ships ~1.1e-4-error log / ~5e-6-error exp
approximations — docs/PERF.md 'r05: the runtime's transcendentals
degraded'. The helpers must be exact AND differentiable where the
training path needs them.
"""

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from priordepth_gaussiansplatting_tpu.ops.projection import round_bf16
from priordepth_gaussiansplatting_tpu.ops.rasterize_pallas import (
    _cumprod_incl, _pexp, _plog)


def test_round_bf16_matches_rtne():
    rng = np.random.RandomState(0)
    x = (rng.randn(1 << 16).astype(np.float32)
         * np.logspace(-20, 20, 1 << 16).astype(np.float32))
    ref = x.astype(ml_dtypes.bfloat16).astype(np.float32)
    got = np.asarray(jax.jit(round_bf16)(jnp.asarray(x)))
    np.testing.assert_array_equal(got, ref)


def test_round_bf16_preserves_nonfinite():
    x = jnp.asarray([np.nan, np.inf, -np.inf, 1.0], jnp.float32)
    y = np.asarray(jax.jit(round_bf16)(x))
    assert np.isnan(y[0]) and y[1] == np.inf and y[2] == -np.inf


def test_round_bf16_straight_through_gradient():
    # The bitcast chain's autodiff gradient is zero; the custom_jvp must
    # restore the double-cast's straight-through derivative of 1 — the
    # r04 flat-loss regression in one assert.
    g = jax.grad(lambda v: jnp.sum(round_bf16(v) * jnp.arange(1.0, 5.0)))(
        jnp.ones(4) * 1.234)
    np.testing.assert_allclose(np.asarray(g), [1.0, 2.0, 3.0, 4.0])


def test_plog_accuracy_and_exact_zero():
    y = np.concatenate([np.linspace(0.01, 1.0, (1 << 14) - 1),
                        [1.0]]).astype(np.float32)
    got = np.asarray(jax.jit(_plog)(jnp.asarray(y))).astype(np.float64)
    ref = np.log(y.astype(np.float64))
    assert np.abs(got - ref).max() < 5e-7
    assert got[-1] == 0.0  # masked lanes (a_eff=0) must stay exact


def test_pexp_accuracy_and_deep_underflow():
    x = np.linspace(-16, 0, 1 << 14).astype(np.float32)
    got = np.asarray(jax.jit(_pexp)(jnp.asarray(x))).astype(np.float64)
    ref = np.exp(x.astype(np.float64))
    assert (np.abs(got - ref) / ref).max() < 5e-7
    # Opaque-chunk log-sums reach ~-600; the exponent bit-scale must not
    # wrap (it produced inf pre-clamp).
    deep = np.asarray(jax.jit(_pexp)(jnp.asarray([-600.0], jnp.float32)))
    assert np.isfinite(deep).all() and deep[0] < 2e-38


def test_cumprod_incl_matches_cumprod():
    rng = np.random.RandomState(1)
    x = 1.0 - rng.rand(256, 128).astype(np.float32) * 0.99
    got = np.asarray(jax.jit(_cumprod_incl)(jnp.asarray(x)))
    ref = np.cumprod(x.astype(np.float64), axis=1)
    # Deep products underflow f32 (0.01^128 ~ 1e-256); everything at
    # compositing-relevant magnitudes (T >= T_EPS = 1e-4, with margin)
    # must match to float noise.
    m = ref > 1e-20
    np.testing.assert_allclose(got[m], ref[m], rtol=2e-6)
