"""EMA shadow parameters (``MMaDA-Parallel-M/models/training_utils.py:61-296``).

The reference's ``EMA`` keeps torch shadow tensors with warmup-ramped decay
``min(decay, (1 + step) / (10 + step))`` (inv_gamma/power form); here it is
a pure pytree update compiled into the train loop when enabled.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["EMAConfig", "ema_init", "ema_update"]


@dataclasses.dataclass(frozen=True)
class EMAConfig:
    decay: float = 0.9999
    min_decay: float = 0.0
    update_after_step: int = 0
    inv_gamma: float = 1.0
    power: float = 2.0 / 3.0


def ema_init(params: Any) -> Any:
    return jax.tree_util.tree_map(jnp.array, params)


def get_decay(cfg: EMAConfig, step: jax.Array) -> jax.Array:
    """Warmup-ramped decay (``models/training_utils.py:150-172``)."""
    s = jnp.maximum(step - cfg.update_after_step - 1, 0).astype(jnp.float32)
    value = 1.0 - (1.0 + s / cfg.inv_gamma) ** (-cfg.power)
    value = jnp.clip(value, cfg.min_decay, cfg.decay)
    return jnp.where(s <= 0, 0.0, value)


def ema_update(cfg: EMAConfig, ema_params: Any, params: Any,
               step: jax.Array) -> Any:
    d = get_decay(cfg, step)
    return jax.tree_util.tree_map(
        lambda e, p: d * e + (1.0 - d) * p.astype(e.dtype), ema_params, params)
