"""Seeding and determinism controls.

Mirrors ``MMaDA-Parallel-M/models/training_utils.py:27-58``
(``set_seed`` / ``enable_full_determinism``) and A's ``setup_seed``
(``utils/generation_utils.py:84-89``) for the host-side RNGs; device-side
randomness in this framework is already explicit (``jax.random`` keys
threaded through every sampler/trainer), which is the stronger guarantee.
"""

from __future__ import annotations

import os
import random

import numpy as np

__all__ = ["set_seed", "enable_full_determinism"]


def set_seed(seed: int):
    """Seed every host RNG in play (python, numpy, torch if present)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch
        torch.manual_seed(seed)
    except ImportError:
        pass


def enable_full_determinism(seed: int):
    """set_seed + deterministic XLA reductions.

    ``--xla_gpu_deterministic_ops`` has no TPU analogue; TPU kernels are
    deterministic given fixed shapes, so seeding + static shapes (which this
    framework enforces everywhere) already yields bit-reproducible runs.
    """
    set_seed(seed)
    os.environ.setdefault("TF_DETERMINISTIC_OPS", "1")
