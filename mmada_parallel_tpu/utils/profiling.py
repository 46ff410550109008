"""Profiling and timing helpers.

The reference has only wall-clock prints and a Triton microbench
(``inference.py:162``, ``omni_attention.py:159-240``); here:

* :func:`trace` — ``jax.profiler`` trace context writing a TensorBoard-
  loadable profile (xplane) directory;
* :func:`time_fn` — steady-state timing with compile-run separation and a
  host-transfer sync (``block_until_ready`` alone has been observed not to
  block under tunneled TPU transports);
* :class:`StepTimer` — per-step wall-clock meter for training loops.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax

__all__ = ["trace", "time_fn", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _sync(out):
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    # force one scalar host transfer for transports with async block
    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def time_fn(fn: Callable, *args, iters: int = 5, warmup: int = 1,
            **kwargs) -> Dict[str, float]:
    """``{compile_s, mean_s, min_s}`` for a jitted callable."""
    t0 = time.time()
    out = fn(*args, **kwargs)
    _sync(out)
    compile_s = time.time() - t0
    for _ in range(max(warmup - 1, 0)):
        _sync(fn(*args, **kwargs))
    times = []
    for _ in range(iters):
        t0 = time.time()
        _sync(fn(*args, **kwargs))
        times.append(time.time() - t0)
    return {"compile_s": compile_s, "mean_s": float(np.mean(times)),
            "min_s": float(np.min(times))}


class StepTimer:
    def __init__(self):
        self._last = time.time()
        self.data_s = 0.0
        self.step_s = 0.0

    def data_done(self):
        now = time.time()
        self.data_s = now - self._last
        self._last = now

    def step_done(self) -> Dict[str, float]:
        now = time.time()
        self.step_s = now - self._last
        self._last = now
        return {"data_time": self.data_s, "step_time": self.step_s}
