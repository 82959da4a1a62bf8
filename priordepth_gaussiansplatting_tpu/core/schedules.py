"""Learning-rate schedules, jit-traceable.

The exponential (log-linear) decay with optional sine warm-up delay is the
schedule the reference applies to Gaussian positions and exposures
(`utils/general_utils.py:29-62`, `scene/gaussian_model.py:203-226`). Here it is
a pure function of a traced step so the whole train step stays inside one jit.
"""

from __future__ import annotations

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float,
             lr_delay_steps: int = 0, lr_delay_mult: float = 1.0,
             max_steps: int = 1_000_000):
    """Log-linear interpolation lr_init -> lr_final over max_steps.

    Returns 0 for negative steps or when both endpoints are 0 (the reference's
    "disabled parameter" convention). `step` may be a traced array.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, dtype=jnp.float32))
    step = jnp.asarray(step, dtype=jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)
