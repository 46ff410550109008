"""Learning-rate schedules covering both reference stacks.

* A-variant half-cosine with warmup (``xllm/util/lr_sched.py:24-37``).
* M-variant HF-style factory (``models/lr_schedulers.py:246-302``):
  constant / constant_with_warmup / linear / cosine (+num_cycles) /
  cosine_with_min_lr / polynomial.

All return ``optax``-compatible ``step -> lr`` callables.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax.numpy as jnp

__all__ = ["half_cosine_with_warmup", "get_scheduler"]

Schedule = Callable


def half_cosine_with_warmup(base_lr: float, warmup_steps: int,
                            total_steps: int, min_lr: float = 0.0) -> Schedule:
    """A-variant: linear warmup then half cosine to ``min_lr``."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        warm = base_lr * step / jnp.maximum(warmup_steps, 1)
        denom = jnp.maximum(total_steps - warmup_steps, 1)
        prog = (step - warmup_steps) / denom
        cos = min_lr + (base_lr - min_lr) * 0.5 * (1 + jnp.cos(math.pi * prog))
        return jnp.where(step < warmup_steps, warm, cos)

    return fn


def get_scheduler(name: str, base_lr: float, warmup_steps: int = 0,
                  total_steps: Optional[int] = None, num_cycles: float = 0.5,
                  min_lr_scale: float = 0.0, power: float = 1.0) -> Schedule:
    """HF-style factory mirroring ``models/lr_schedulers.py:246-302``."""

    def warmup(step):
        return jnp.clip(jnp.asarray(step, jnp.float32)
                        / jnp.maximum(warmup_steps, 1), None, 1.0)

    if name == "constant":
        return lambda step: jnp.asarray(base_lr, jnp.float32)
    if name == "constant_with_warmup":
        return lambda step: base_lr * warmup(step)
    if total_steps is None:
        raise ValueError(f"schedule {name} needs total_steps")

    def progress(step):
        step = jnp.asarray(step, jnp.float32)
        denom = jnp.maximum(total_steps - warmup_steps, 1)
        return jnp.clip((step - warmup_steps) / denom, 0.0, 1.0)

    if name == "linear":
        return lambda step: base_lr * warmup(step) * (1.0 - progress(step))
    if name == "cosine":
        return lambda step: base_lr * warmup(step) * jnp.maximum(
            0.0, 0.5 * (1.0 + jnp.cos(math.pi * 2.0 * num_cycles
                                      * progress(step))))
    if name == "cosine_with_min_lr":
        def fn(step):
            cos = 0.5 * (1.0 + jnp.cos(math.pi * 2.0 * num_cycles
                                       * progress(step)))
            scaled = min_lr_scale + (1.0 - min_lr_scale) * jnp.maximum(0.0, cos)
            return base_lr * warmup(step) * scaled
        return fn
    if name == "polynomial":
        return lambda step: base_lr * warmup(step) * (
            (1.0 - progress(step)) ** power)
    raise ValueError(f"unknown schedule: {name}")
