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

import functools
from typing import Optional

import jax
import jax.numpy as jnp

__all__ = ["dot_product_attention", "rope_attention",
           "rope_attention_prefix", "rope_attention_qonly"]


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


@functools.lru_cache(maxsize=None)
def _flash_diff_fn(interpret: bool = False):
    """BLHD Pallas flash forward with an XLA-recompute backward.

    ``pallas_call`` is not reverse-differentiable (Pallas AD asserts — a
    bare ``jax.grad`` through the kernel fails on TPU), so training through
    the fast path needs an explicit VJP: the backward recomputes attention
    with the einsum path (whose grads XLA derives and fuses) — the standard
    flash-attention recompute-in-backward trade, with XLA doing the bwd
    kernel instead of a hand-written one."""

    @jax.custom_vjp
    def f(q, k, v, bias):
        from mmada_parallel_tpu.ops.flash_attention import flash_attention
        return flash_attention(q, k, v, bias=bias, interpret=interpret)

    def fwd(q, k, v, bias):
        return f(q, k, v, bias), (q, k, v, bias)

    def bwd(res, g):
        q, k, v, bias = res
        _, vjp = jax.vjp(_xla_attention, q, k, v, bias)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


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
                return _flash_diff_fn()(q, k, v, bias)
            except (ImportError, NotImplementedError):
                if impl == "pallas":
                    raise
        return _xla_attention(q, k, v, bias)
    raise ValueError(f"unknown attention impl: {impl}")


# ---------------------------------------------------------------------------
# Packed-layout attention with fused RoPE (the TPU fast path)
# ---------------------------------------------------------------------------


def _packed_reference(q, k, v, sin, cos, bias, H: int, KV: int):
    """The packed chain spelled out in XLA: reshape -> fp32 rope -> einsum
    attention -> reshape.  Semantics oracle for the fused kernel and the
    backward implementation of its custom VJP."""
    from mmada_parallel_tpu.ops.rope_attention import apply_rope
    B, L, HD = q.shape
    D = HD // H
    q4 = q.reshape(B, L, H, D)
    k4 = k.reshape(B, k.shape[1], KV, D)
    v4 = v.reshape(B, v.shape[1], KV, D)
    q4, k4 = apply_rope(q4, k4, sin, cos, True)
    return _xla_attention(q4, k4, v4, bias).reshape(B, L, HD)


@functools.lru_cache(maxsize=None)
def _packed_diff_fn(H: int, KV: int, interpret: bool = False):
    @jax.custom_vjp
    def f(q, k, v, sin, cos, bias):
        # Always route through custom_partitioning: on a multi-chip mesh
        # GSPMD shards the kernel (batch by data axes, heads by the TP lane
        # shard) instead of all-gathering around an opaque custom call, and
        # on one device the wrapper lowers to the bare kernel.  The ambient
        # device count is NOT a reliable gate — AOT topology compiles (the
        # v5e-8 census) trace with a single local device while targeting 8.
        from mmada_parallel_tpu.ops.rope_attention import (
            partitioned_flash_rope)
        fn = partitioned_flash_rope(H, KV, bias is not None,
                                    sin.ndim == 3, interpret)
        args = (q, k, v, sin, cos) + ((bias,) if bias is not None else ())
        return fn(*args)

    def fwd(q, k, v, sin, cos, bias):
        return f(q, k, v, sin, cos, bias), (q, k, v, sin, cos, bias)

    def bwd(res, g):
        q, k, v, sin, cos, bias = res
        _, vjp = jax.vjp(
            lambda *a: _packed_reference(*a, H=H, KV=KV),
            q, k, v, sin, cos, bias)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def rope_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   sin: jax.Array, cos: jax.Array,
                   bias: Optional[jax.Array] = None, *,
                   n_heads: int, n_kv_heads: Optional[int] = None,
                   full_precision: bool = True,
                   impl: str = "auto") -> jax.Array:
    """RoPE + bidirectional attention on *packed* ``[B, L, H*hd]`` q/k/v.

    The packed layout is what the projection GEMMs naturally produce; on TPU
    both the 4-D reshape and the BLHD->BHLD transpose around the plain flash
    kernel are physical retilings worth ~1.3-2 ms/layer at the 8B edit shape
    (README "Performance analysis").  When the shape qualifies (TPU, head_dim
    a lane multiple, MHA, fp32 rope, modest L) this dispatches to the fused
    Pallas kernel in :mod:`mmada_parallel_tpu.ops.rope_attention`; otherwise
    it runs the unpacked chain so every backend/shape keeps working.

    ``sin``/``cos``: fp32 Neox tables ``[L, hd]`` or ``[B, L, hd]`` (ragged
    positions).  Differentiable on every path (the kernel carries an
    XLA-recompute custom VJP)."""
    B, L, HD = q.shape
    H = n_heads
    KV = n_kv_heads if n_kv_heads is not None else H
    D = HD // H
    if impl in ("auto", "pallas"):
        on_tpu = jax.devices()[0].platform == "tpu"
        # VMEM bound: the single-full-K-pass kernel keeps [L, G*D] K/V blocks
        # + an f32 [block_q, L] score row resident; ~4k keys is the safe cap.
        if (on_tpu and full_precision and D % 128 == 0 and H == KV
                and k.shape[1] <= 4096):
            return _packed_diff_fn(H, KV)(q, k, v, sin, cos, bias)
    from mmada_parallel_tpu.ops.rope_attention import apply_rope
    q4 = q.reshape(B, L, H, D)
    k4 = k.reshape(B, k.shape[1], KV, D)
    v4 = v.reshape(B, v.shape[1], KV, D)
    q4, k4 = apply_rope(q4, k4, sin, cos, full_precision)
    return dot_product_attention(q4, k4, v4, bias,
                                 impl=impl).reshape(B, L, HD)


# ---------------------------------------------------------------------------
# Prefix-masked packed attention (the FlexAttention block-skip counterpart)
# ---------------------------------------------------------------------------


def _prefix_dense_bias(kv_hi: jax.Array, Lk: int) -> jax.Array:
    """``[B, Lq]`` bounds -> the equivalent dense bool mask
    ``[B, 1, Lq, Lk]`` (the oracle/backward/CPU form).

    Bounds are clamped to ``[1, Lk]`` exactly like the Pallas kernel
    (``masks.prefix_bounds`` always emits >= 1 — the causal base), so a
    hand-built bound-0 row means "attend to token 0" on EVERY path
    rather than NaNs on one and numbers on the other."""
    cols = jnp.arange(Lk, dtype=jnp.int32)
    hi = jnp.clip(kv_hi.astype(jnp.int32), 1, Lk)
    return (cols[None, None, :] < hi[:, :, None])[:, None]


@functools.lru_cache(maxsize=None)
def _packed_prefix_diff_fn(H: int, KV: int, interpret: bool = False):
    """Prefix-skip Pallas forward + XLA-recompute backward (the backward
    rebuilds the dense mask from the bounds; the flash trade as in
    :func:`_packed_diff_fn`)."""

    @jax.custom_vjp
    def f(q, k, v, sin, cos, kv_hi):
        from mmada_parallel_tpu.ops.rope_attention import (
            flash_attention_rope_prefix)
        return flash_attention_rope_prefix(q, k, v, sin, cos, kv_hi,
                                           n_heads=H, n_kv_heads=KV,
                                           interpret=interpret)

    def fwd(q, k, v, sin, cos, kv_hi):
        return f(q, k, v, sin, cos, kv_hi), (q, k, v, sin, cos, kv_hi)

    def bwd(res, g):
        q, k, v, sin, cos, kv_hi = res
        bias = _prefix_dense_bias(kv_hi, k.shape[1])
        from mmada_parallel_tpu.ops.masks import to_bias
        _, vjp = jax.vjp(
            lambda q_, k_, v_, s_, c_: _packed_reference(
                q_, k_, v_, s_, c_, to_bias(bias), H=H, KV=KV),
            q, k, v, sin, cos)
        return vjp(g) + (None,)

    f.defvjp(fwd, bwd)
    return f


def rope_attention_prefix(q: jax.Array, k: jax.Array, v: jax.Array,
                          sin: jax.Array, cos: jax.Array,
                          kv_hi: jax.Array, *, n_heads: int,
                          n_kv_heads: Optional[int] = None,
                          full_precision: bool = True,
                          impl: str = "auto") -> jax.Array:
    """Task-masked packed attention from a per-row kv-bound spec
    (``masks.prefix_bounds``) — the TPU counterpart of the reference's
    FlexAttention+Triton block-mask path (``omni_attention.py:17-123``).

    Measured on a v5e chip (``tools/bench_masked_attention.py`` →
    ``artifacts/masked_attention_bench.json``): the block-skip kernel
    wins only where the L² term dominates — 1.11-1.15x at the A-train
    seq-5120 shape — and LOSES 0.80-0.85x at seq ~1.2k (the reference's
    own flex-bench shape and the M-interleave shape), where the packed
    dense-bias kernel's single full-K dot beats chunked online-softmax
    and attention is < 1 ms/call either way.  ``auto`` therefore runs
    the skip kernel only for ``L >= 4096`` on TPU and otherwise
    materializes the equivalent dense bias into the standard chain
    (``impl="pallas"`` forces the skip kernel; semantics are identical
    everywhere: ``kv < kv_hi[b, q]``).
    """
    B, L, HD = q.shape
    H = n_heads
    KV = n_kv_heads if n_kv_heads is not None else H
    D = HD // H
    if impl in ("auto", "pallas"):
        on_tpu = jax.devices()[0].platform == "tpu"
        eligible = full_precision and D % 128 == 0
        if impl == "pallas":
            # forcing the skip kernel must not silently measure the
            # dense path instead
            if not eligible:
                raise ValueError(
                    "impl='pallas' requires full_precision=True and "
                    f"head_dim % 128 == 0 (got full_precision="
                    f"{full_precision}, head_dim={D})")
            if not on_tpu:
                raise ValueError(
                    "impl='pallas' needs a TPU backend; for CPU testing "
                    "call flash_attention_rope_prefix(..., "
                    "interpret=True) directly")
            return _packed_prefix_diff_fn(H, KV)(q, k, v, sin, cos, kv_hi)
        if on_tpu and L >= 4096 and eligible:
            return _packed_prefix_diff_fn(H, KV)(q, k, v, sin, cos, kv_hi)
    from mmada_parallel_tpu.ops.masks import to_bias
    bias = to_bias(_prefix_dense_bias(kv_hi, k.shape[1]))
    return rope_attention(q, k, v, sin, cos, bias, n_heads=H,
                          n_kv_heads=KV, full_precision=full_precision,
                          impl=impl)


# ---------------------------------------------------------------------------
# Packed attention with pre-rotated K (the feature-cache hot path)
# ---------------------------------------------------------------------------


def _packed_qonly_reference(q, k, v, sin_q, cos_q, bias, H: int, KV: int,
                            full_precision: bool = True):
    """Unfused chain for the pre-rotated-K case: reshape -> fp32 rope on q
    only -> einsum attention -> reshape.  Oracle + custom-VJP backward."""
    from mmada_parallel_tpu.ops.rope_attention import rope_tensor
    B, Lq, HD = q.shape
    D = HD // H
    q4 = rope_tensor(q.reshape(B, Lq, H, D), sin_q, cos_q, full_precision)
    k4 = k.reshape(B, k.shape[1], KV, D)
    v4 = v.reshape(B, v.shape[1], KV, D)
    return _xla_attention(q4, k4, v4, bias).reshape(B, Lq, HD)


@functools.lru_cache(maxsize=None)
def _packed_qonly_diff_fn(H: int, KV: int, interpret: bool = False,
                          bare: bool = False):
    @jax.custom_vjp
    def f(q, k, v, sin_q, cos_q, bias):
        if bare:
            # per-shard call with NO custom_partitioning wrapper: inside
            # shard_map partitioning is already manual, and the AOT
            # topology compile client cannot emit the partitioning
            # callback ("Custom emitter for CustomSPMDPartitioning not
            # found") — the bare Mosaic kernel it CAN compile, which is
            # what lets the v5e-8 ring census carry the production
            # attention kernel instead of the einsum stand-in
            from mmada_parallel_tpu.ops.rope_attention import (
                flash_attention_rope_qonly)
            return flash_attention_rope_qonly(
                q, k, v, sin_q, cos_q, bias=bias, n_heads=H,
                n_kv_heads=KV, interpret=interpret)
        # routed through custom_partitioning for the same reason as the
        # main packed path (see _packed_diff_fn)
        from mmada_parallel_tpu.ops.rope_attention import (
            partitioned_flash_rope_qonly)
        fn = partitioned_flash_rope_qonly(H, KV, bias is not None,
                                          sin_q.ndim == 3, interpret)
        args = (q, k, v, sin_q, cos_q) + \
            ((bias,) if bias is not None else ())
        return fn(*args)

    def fwd(q, k, v, sin_q, cos_q, bias):
        return f(q, k, v, sin_q, cos_q, bias), (q, k, v, sin_q, cos_q, bias)

    def bwd(res, g):
        q, k, v, sin_q, cos_q, bias = res
        _, vjp = jax.vjp(
            lambda *a: _packed_qonly_reference(*a, H=H, KV=KV),
            q, k, v, sin_q, cos_q, bias)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def rope_attention_qonly(q: jax.Array, k: jax.Array, v: jax.Array,
                         sin_q: jax.Array, cos_q: jax.Array,
                         bias: Optional[jax.Array] = None, *,
                         n_heads: int, n_kv_heads: Optional[int] = None,
                         full_precision: bool = True,
                         impl: str = "auto",
                         bare: bool = False) -> jax.Array:
    """Packed attention where K/V arrive PRE-ROTATED (the feature cache
    stores post-RoPE K, ``models/llada.py``): q gets the fp32 rotation at
    its true positions (``sin_q``/``cos_q``: ``[Lq, hd]`` or per-row
    ``[B, Lq, hd]``), K/V are the full packed caches ``[B, Lk, KV*hd]``.
    Dispatches to the fused kernel on qualifying TPU shapes, otherwise
    runs the unpacked q-rope chain over :func:`dot_product_attention`
    (which keeps the BLHD flash kernel for GQA / long-cache shapes and
    preserves ``impl="pallas"``'s raise-on-unavailable semantics).

    ``impl="pallas"`` forces the fused path on qualifying shapes even when
    the DEFAULT backend is not TPU — the AOT topology census compiles for
    a v5e target from a CPU-platform process, where the ambient-platform
    gate would wrongly route to the einsum stand-in.  ``bare=True`` (for
    callers already inside ``shard_map``, e.g. the ring-TP block) skips
    the ``custom_partitioning`` wrapper: partitioning there is manual,
    and the compile-only client cannot emit the partitioning callback."""
    B, Lq, HD = q.shape
    H = n_heads
    KV = n_kv_heads if n_kv_heads is not None else H
    D = HD // H
    if impl in ("auto", "pallas"):
        on_tpu = jax.devices()[0].platform == "tpu"
        if ((on_tpu or impl == "pallas") and full_precision
                and D % 128 == 0 and H == KV and k.shape[1] <= 4096):
            return _packed_qonly_diff_fn(H, KV, bare=bare)(
                q, k, v, sin_q, cos_q, bias)
    from mmada_parallel_tpu.ops.rope_attention import rope_tensor
    q4 = rope_tensor(q.reshape(B, Lq, H, D), sin_q, cos_q, full_precision)
    k4 = k.reshape(B, k.shape[1], KV, D)
    v4 = v.reshape(B, v.shape[1], KV, D)
    return dot_product_attention(q4, k4, v4, bias,
                                 impl=impl).reshape(B, Lq, HD)
