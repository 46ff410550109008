"""Omni task-attention masks — the FlexAttention component, TPU-style.

The reference builds per-task block masks with torch FlexAttention +
Triton compilation (``MMaDA-Parallel-M/training/omni_attention.py:22-135``):
t2i (causal with a bidirectional image span), mmu (causal with a full
prefix), plain causal, and a mixed-batch composition keyed on batch index.

Two consumption forms, both from the same spec:

* **dense** — each mask function produces a ``[B, 1, L, L]`` additive
  bias (or bool mask) that XLA folds into the attention kernel; a dense
  [L, L] bias at the reference's sequence lengths (~1.3k-5k) is a few MB.
* **prefix-skip** — every one of the reference's task masks is a per-row
  PREFIX mask: ``allowed(q, kv) == kv < bound(q)`` with
  ``bound(q) = max(q+1, prefix_end, span_end(q))`` (causal base, mmu
  full-prefix, t2i bidirectional image spans — unions of a causal
  triangle with left-anchored rectangles are always contiguous
  prefixes).  :func:`prefix_bounds` / :func:`mixed_prefix_bounds` emit
  the ``[B, L]`` int32 bound array, and the fused Pallas kernel's
  ``flash_attention_rope_prefix`` variant
  (:mod:`mmada_parallel_tpu.ops.rope_attention`) skips whole K blocks
  past each q block's max bound — the FlexAttention block-skip
  counterpart (``omni_attention.py:17-123``), TPU-style.  Measured
  (``artifacts/masked_attention_bench.json``): the skip wins 1.1-1.15x
  at seq 5120 and loses at seq ~1.2k, so ``rope_attention_prefix``'s
  auto mode uses it only for long sequences.
  ``tests/test_prefix_attention.py`` pins ``dense == kv < bounds`` for
  every family, so the two forms cannot drift.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = ["causal_mask", "t2i_mask", "mmu_mask", "mixed_mask",
           "pairwise_padding_mask", "ragged_positions", "to_bias",
           "prefix_bounds", "mixed_prefix_bounds"]


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


def prefix_bounds(L: int, prefix_end: int = 0,
                  image_spans: Sequence[Tuple[int, int]] = ()) -> jax.Array:
    """Per-row exclusive kv bound ``[L]`` int32 of a prefix-family task
    mask: ``dense[q, kv] == kv < bounds[q]``.

    ``prefix_end=0, no spans`` = causal; ``prefix_end=p`` = mmu;
    ``image_spans`` = t2i.  Consumed by
    ``rope_attention.flash_attention_rope_prefix`` (block-skip) and by
    the dense paths via ``kv < bounds`` — one spec, two executions.
    """
    q = jnp.arange(L, dtype=jnp.int32)
    hi = q + 1                                   # causal base
    if prefix_end:
        hi = jnp.maximum(hi, prefix_end)
    for b, e in image_spans:
        inside = (q >= b) & (q < e)
        hi = jnp.where(inside, jnp.maximum(hi, e), hi)
    return hi


def mixed_prefix_bounds(L: int, batch_size_t2i: int, batch_size_lm: int,
                        batch_size_mmu: int,
                        image_spans: Sequence[Tuple[int, int]],
                        mmu_prefix_end: int) -> jax.Array:
    """``[B, L]`` per-row bounds for the concat ``[t2i | lm | mmu]``
    batch — the prefix-skip form of :func:`mixed_mask` (unpadded)."""
    rows = ([prefix_bounds(L, 0, image_spans)] * batch_size_t2i
            + [prefix_bounds(L)] * batch_size_lm
            + [prefix_bounds(L, mmu_prefix_end)] * batch_size_mmu)
    return jnp.stack(rows, axis=0)


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
