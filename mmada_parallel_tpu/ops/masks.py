"""Omni task-attention masks — the FlexAttention component, TPU-style.

The reference builds per-task block masks with torch FlexAttention +
Triton compilation (``MMaDA-Parallel-M/training/omni_attention.py:22-135``):
t2i (causal with a bidirectional image span), mmu (causal with a full
prefix), plain causal, and a mixed-batch composition keyed on batch index.

Here each mask is a pure function producing a ``[B, 1, L, L]`` additive
bias (or bool mask) that XLA folds into the attention kernel; the Pallas
flash kernel consumes the same spec as static per-block skip information.
Dense [L, L] bias at the reference's sequence lengths (~1.3k-5k) is a few
MB — on TPU the win is block-level skipping in the kernel, not mask
compilation.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["causal_mask", "t2i_mask", "mmu_mask", "mixed_mask",
           "pairwise_padding_mask", "ragged_positions", "to_bias"]


def pairwise_padding_mask(attn_mask: jax.Array) -> jax.Array:
    """``[B, L] bool -> [B, 1, L, L]`` (``modeling_xllmx_dimoo.py:56-62``)."""
    pair = attn_mask[:, :, None] & attn_mask[:, None, :]
    return pair[:, None, :, :]


def ragged_positions(attn_mask: jax.Array) -> jax.Array:
    """``[B, L] bool -> [B, L]`` RoPE position ids for ragged batches.

    Each real token gets its rank among the row's real tokens
    (``cumsum(mask)-1``), i.e. exactly the position it would have in its
    unpadded single-row sequence, wherever the pads sit.  Pad positions get
    a clamped position; their rows/cols are killed by the pairwise bias.
    """
    pos = jnp.cumsum(attn_mask.astype(jnp.int32), axis=-1) - 1
    return jnp.maximum(pos, 0)


def to_bias(mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """bool mask (True = attend) -> additive bias (0 / -1e30)."""
    return jnp.where(mask, 0.0, -1e30).astype(dtype)


def causal_mask(L: int) -> jax.Array:
    """``q >= kv`` (``omni_attention.py:50-52``); ``[1, 1, L, L]``."""
    q = jnp.arange(L)[:, None]
    kv = jnp.arange(L)[None, :]
    return (q >= kv)[None, None]


def t2i_mask(L: int, image_spans: Sequence[Tuple[int, int]],
             pad_ends: Optional[jax.Array] = None) -> jax.Array:
    """Causal-with-bidirectional-image-spans (``omni_attention.py:54-71``).

    ``image_spans``: [(begin, end), ...) bidirectional windows.
    ``pad_ends``: optional ``[B, L]`` per-position left-pad boundary (the
    reference's ``pad_ends[b, kv]``); keys left of it are masked except the
    diagonal.  Returns ``[B or 1, 1, L, L]`` bool.
    """
    q = jnp.arange(L)[:, None]
    kv = jnp.arange(L)[None, :]
    full_begin = jnp.arange(L)
    full_end = jnp.arange(L)
    for b, e in image_spans:
        idx = jnp.arange(L)
        inside = (idx >= b) & (idx < e)
        full_begin = jnp.where(inside, b, full_begin)
        full_end = jnp.where(inside, e, full_end)
    full = (kv < full_end[:, None]) & (kv >= full_begin[:, None])  # [Lq, Lkv]
    if pad_ends is None:
        causal = q >= kv
        return (causal | full)[None, None]
    # padded variant: causal restricted to non-pad keys, diagonal kept
    not_pad = ~(kv[None] < pad_ends[:, None, :])          # [B, Lq?, L]
    causal = (not_pad & (q >= kv)[None]) | (q == kv)[None]
    return (causal | full[None])[:, None]


def mmu_mask(L: int, prefix_end: int) -> jax.Array:
    """Causal OR full-prefix (``omni_attention.py:74-76``)."""
    q = jnp.arange(L)[:, None]
    kv = jnp.arange(L)[None, :]
    return ((q >= kv) | (kv < prefix_end))[None, None]


def mixed_mask(L: int, batch_size_t2i: int, batch_size_lm: int,
               batch_size_mmu: int, image_spans: Sequence[Tuple[int, int]],
               mmu_prefix_end: int,
               pad_ends: Optional[jax.Array] = None) -> jax.Array:
    """Per-row task mask for a concat ``[t2i | lm | mmu]`` batch
    (``omni_attention.py:85-100``); ``[B, 1, L, L]`` bool."""
    B = batch_size_t2i + batch_size_lm + batch_size_mmu
    t2i = t2i_mask(L, image_spans,
                   pad_ends[:batch_size_t2i] if pad_ends is not None else None)
    if t2i.shape[0] == 1:
        t2i = jnp.broadcast_to(t2i, (batch_size_t2i, 1, L, L))
    lm = jnp.broadcast_to(causal_mask(L), (batch_size_lm, 1, L, L))
    mmu = jnp.broadcast_to(mmu_mask(L, mmu_prefix_end),
                           (batch_size_mmu, 1, L, L))
    return jnp.concatenate([t2i, lm, mmu], axis=0)
