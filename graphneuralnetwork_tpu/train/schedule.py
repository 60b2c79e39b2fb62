"""LR schedules replicating the reference's optimizer_utils.

``warmup_poly_schedule`` is the warmup → poly(0.9) decay LambdaLR the
reference copies into every model dir (HAN/train_utils/optimizer_utils.py:
5-24): factor ramps linearly from ``warmup_factor`` to 1 over
``warmup_steps``, then decays as ((1 - p)/(1 - p_warmup))^power.
"""

from __future__ import annotations

import optax


def warmup_poly_schedule(
    base_lr: float,
    total_steps: int,
    warmup_steps: int = 0,
    warmup_factor: float = 1e-3,
    power: float = 0.9,
):
    def schedule(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.float32(max(warmup_steps, 0))
        total = jnp.float32(max(total_steps, 1))
        alpha = jnp.where(warm > 0, step / jnp.maximum(warm, 1.0), 1.0)
        warm_f = warmup_factor * (1.0 - alpha) + alpha
        frac = (1.0 - step / total) / jnp.maximum(1.0 - warm / total, 1e-8)
        decay_f = jnp.maximum(frac, 0.0) ** power
        return base_lr * jnp.where(step < warm, warm_f, decay_f)

    return schedule


def constant_schedule(base_lr: float):
    return optax.constant_schedule(base_lr)
