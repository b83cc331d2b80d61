"""LR schedules (reference training/scheduler.py:13-64): step-wise cosine /
const / const-with-cooldown, each with linear warmup `base_lr*(step+1)/warmup`.
Implemented as pure functions of the step index for optax inject_hyperparams.
"""

from __future__ import annotations

import jax.numpy as jnp


def warmup_lr(base_lr: float, step, warmup: int):
    return base_lr * (step + 1) / max(warmup, 1)


def cosine_lr(base_lr: float, warmup: int, total_steps: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr(base_lr, step, warmup)
        e = step - warmup
        es = max(total_steps - warmup, 1)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * e / es)) * base_lr
        return jnp.where(step < warmup, warm, cos)

    return schedule


def const_lr(base_lr: float, warmup: int):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        return jnp.where(step < warmup, warmup_lr(base_lr, step, warmup), base_lr)

    return schedule


def const_lr_cooldown(
    base_lr: float,
    warmup: int,
    total_steps: int,
    cooldown_steps: int,
    cooldown_power: float = 1.0,
    cooldown_end_lr: float = 0.0,
):
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = warmup_lr(base_lr, step, warmup)
        start_cooldown = total_steps - cooldown_steps
        e = step - start_cooldown
        decay = (1 - (e / cooldown_steps)) ** cooldown_power
        cool = decay * (base_lr - cooldown_end_lr) + cooldown_end_lr
        return jnp.where(
            step < warmup, warm, jnp.where(step < start_cooldown, base_lr, cool)
        )

    return schedule


def get_schedule(name: str, base_lr: float, warmup: int, total_steps: int,
                 cooldown_steps: int = 0, cooldown_power: float = 1.0,
                 cooldown_end_lr: float = 0.0):
    if name in ("cosine", "cosine_lr"):
        return cosine_lr(base_lr, warmup, total_steps)
    if name in ("const", "const_lr"):
        return const_lr(base_lr, warmup)
    if name in ("const-cooldown", "const_lr_cooldown"):
        return const_lr_cooldown(base_lr, warmup, total_steps, cooldown_steps,
                                 cooldown_power, cooldown_end_lr)
    raise ValueError(name)
