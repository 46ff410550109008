"""Bidirectional attention op with swappable backends.

The reference dispatches between flash-attn CUDA kernels and torch SDPA
(``MMaDA-Parallel-A/model/modeling_llada.py:581-588,643-679``), always with
``is_causal=False``.  Here the same role is played by:

* ``xla``    — einsum attention with fp32 softmax; XLA fuses it well and it
  runs everywhere (CPU test meshes included).
* ``pallas`` — the TPU flash-attention kernel in
  :mod:`mmada_parallel_tpu.ops.flash_attention` (non-causal, additive-bias
  aware, online softmax, never materializes the [L, L] score matrix in HBM).
* ``auto``   — pallas on TPU when the shapes qualify, else xla.

All backends take ``[B, L, H, hd]`` q and ``[B, L, KV, hd]`` k/v (GQA folded
in, replacing ``repeat_interleave`` at ``modeling_llada.py:662-668``) and an
optional ``[B, 1, L, L]`` additive bias.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention"]


def _xla_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   bias: Optional[jax.Array]) -> jax.Array:
    B, L, H, D = q.shape
    KV = k.shape[2]
    if H != KV:
        rep = H // KV
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    scale = D ** -0.5
    # [B, H, Lq, Lk] scores in fp32 for a stable softmax
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v)


def dot_product_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                          bias: Optional[jax.Array] = None,
                          impl: str = "auto") -> jax.Array:
    """Bidirectional scaled dot-product attention, ``[B, L, H, hd]`` out."""
    if impl == "xla":
        return _xla_attention(q, k, v, bias)
    if impl in ("auto", "pallas"):
        on_tpu = jax.devices()[0].platform == "tpu"
        if impl == "pallas" or on_tpu:
            try:
                from mmada_parallel_tpu.ops.flash_attention import flash_attention
                return flash_attention(q, k, v, bias=bias)
            except (ImportError, NotImplementedError):
                if impl == "pallas":
                    raise
        return _xla_attention(q, k, v, bias)
    raise ValueError(f"unknown attention impl: {impl}")
