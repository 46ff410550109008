"""Flat ``.npz`` persistence for param pytrees.

A dependency-light sibling of the orbax ``training/checkpoint.py`` path
for small artifacts that want a single portable file: the capability-demo
fixture cache (``tests/conftest.py``) keys trained tiny-model params by a
source-code hash so test sessions skip retraining, and the examples use
it as an optional ``param_store``.

Leaves are stored under their ``jax.tree_util.keystr`` path.  bfloat16
leaves are stored as float32 (``np.savez`` cannot hold bf16; the upcast
is exact) and cast back to the template leaf's dtype on load, so a
round-trip is bit-exact for bf16/f32 trees.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

__all__ = ["save_params", "load_params"]


def save_params(path: str, params: Any) -> None:
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for key_path, leaf in flat:
        a = np.asarray(leaf)
        if a.dtype.name == "bfloat16":
            a = a.astype(np.float32)
        arrays[jax.tree_util.keystr(key_path)] = a
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_params(path: str, template: Any) -> Any:
    """Rebuild ``template``'s pytree structure from ``path``; every leaf
    is cast to the template leaf's dtype.  Raises ``KeyError`` if the
    file does not cover the template (shape/key drift -> retrain)."""
    with np.load(path) as z:
        stored = {k: z[k] for k in z.files}

    def pick(key_path, leaf):
        a = stored[jax.tree_util.keystr(key_path)]
        if a.shape != leaf.shape:
            raise KeyError(f"shape drift at {jax.tree_util.keystr(key_path)}"
                           f": stored {a.shape} vs template {leaf.shape}")
        import jax.numpy as jnp
        return jnp.asarray(a, dtype=leaf.dtype)

    return jax.tree_util.tree_map_with_path(pick, template)
