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


def make_optimizer(
    name: str,
    lr: float,
    weight_decay: float = 0.0,
    total_steps: int = 0,
    warmup_steps: int = 0,
    momentum: float = 0.0,
):
    """Build the reference's optimizers by name.

    ``"sgd"`` is SGD(momentum) under the warmup→poly(0.9) schedule — the
    exact training recipe the reference uses for GAT/HAN/SAGE
    (GAT/train_eval.py:9-33,54 builds SGD + create_lr_scheduler;
    HAN/train_utils/optimizer_utils.py:5-24). ``"adamw"`` is the TPU-fast
    alternative the CLI defaults to. SGD defaults match torch's
    (momentum=0); weight decay matches torch semantics (L2 added to the
    gradient before the lr scale, i.e. optax.add_decayed_weights).
    """
    if name == "adamw":
        return optax.adamw(lr, weight_decay=weight_decay)
    if name == "sgd":
        sched = (warmup_poly_schedule(lr, total_steps, warmup_steps)
                 if total_steps > 0 else constant_schedule(lr))
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.sgd(sched, momentum=momentum))
        return optax.chain(*parts)
    raise ValueError(f"unknown optimizer {name!r} (sgd|adamw)")
