"""Packed-layout Pallas flash attention with fused RoPE.

The round-2 analysis (README "Performance analysis") measured ~1.3-2 ms/layer
of pure layout movement around the BLHD flash kernel: the projection GEMMs
produce ``[B, L, H*D]``, and both the ``[B,L,H*D] -> [B,L,H,D]`` reshape and
the ``BLHD -> BHLD`` transpose are physical retilings on TPU (an (8,128)
tiling over the last two axes changes meaning at every step), which XLA
cannot fuse through the opaque kernel call.

This kernel removes the relayouts entirely by keeping the *packed*
``[B, L, H*D]`` layout end to end — head ``h`` is the 128-lane slice
``[h*D, (h+1)*D)``, which is tile-aligned for ``D % 128 == 0`` — and fusing
the Neox-style RoPE rotation (``models/llada.py:_apply_rope``, fp32 math)
into the kernel prologue:

* grid ``(B, n_groups, n_q)`` — ``G`` heads per grid step; the K/V blocks'
  index maps are constant across the innermost ``n_q`` sweep, so Pallas
  fetches them once per (batch, group);
* K's rotation is computed once per (batch, group) into VMEM scratch at
  ``qi == 0`` and reused across all q blocks (the innermost two grid axes
  are "arbitrary" = sequential, which makes the reuse sound);
* a single full-K pass per head (no online-softmax rescale chain): scores
  ``[block_q, L_k]`` live only in VMEM/registers;
* optional additive bias ``[B, 1, L_q, L_k]`` (padding/task masks from
  :mod:`mmada_parallel_tpu.ops.masks`) streams ``[block_q, L_k]`` blocks;
* GQA folds into a lane slice of a full-KV block (q head ``h`` reads kv
  lanes ``(h // rep) * D``), as the BLHD kernel does via its index maps.

Measured on v5e at the A-variant edit shape (L=2424, H=32, D=128), against
the previous chain (reshape -> fp32 RoPE -> BLHD flash -> reshape), bitwise
identical outputs: B=2 3.99 ms vs 5.94 ms, B=1 3.27 ms vs 3.88 ms per call.

Replaces (tpu-natively) the reference's flash-attn/SDPA dispatch with the
rotary embedding applied outside (``MMaDA-Parallel-A/model/modeling_llada.py:
412-435,643-679``); always bidirectional (``is_causal=False``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention_rope", "flash_attention_rope_qonly",
           "flash_attention_rope_prefix", "apply_rope", "rope_tensor",
           "partitioned_flash_rope", "partitioned_flash_rope_qonly"]

NEG_INF = -1e30


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def rope_tensor(t: jax.Array, sin: jax.Array, cos: jax.Array,
                full_precision: bool) -> jax.Array:
    """Neox RoPE on one ``[B, L, H, hd]`` tensor (fp32 rotation per
    ``modeling_llada.py:412-435`` when ``full_precision``).

    ``sin``/``cos`` are ``[L, hd]`` (shared positions) or ``[B, L, hd]``
    (per-row positions — ragged serving batches, cache ``sel_pos``
    gathers).  This is the SINGLE SOURCE of the rope math: ``apply_rope``,
    the fused kernel's in-kernel rows variant, the packed cache rotation
    (``models/llada.py``) and the qonly fallback all route through or
    mirror it."""
    og = t.dtype
    tf = t.astype(jnp.float32) if full_precision else t
    if sin.ndim == 2:
        sin, cos = sin[None], cos[None]
    s = sin[:, :, None, :].astype(tf.dtype)
    c = cos[:, :, None, :].astype(tf.dtype)
    return (tf * c + _rotate_half(tf) * s).astype(og)


def apply_rope(q: jax.Array, k: jax.Array, sin: jax.Array, cos: jax.Array,
               full_precision: bool):
    """:func:`rope_tensor` applied to a q/k pair (same positions)."""
    return (rope_tensor(q, sin, cos, full_precision),
            rope_tensor(k, sin, cos, full_precision))


def _rope_rows(x: jax.Array, sin: jax.Array, cos: jax.Array) -> jax.Array:
    """fp32 Neox rotate-half on ``[rows, D]`` (matches ``_apply_rope``)."""
    D = x.shape[-1]
    xf = x.astype(jnp.float32)
    x1 = xf[:, : D // 2]
    x2 = xf[:, D // 2:]
    rot = jnp.concatenate([-x2, x1], axis=1)
    return (xf * cos + rot * sin).astype(x.dtype)


def _kernel(q_ref, k_ref, v_ref, sq_ref, cq_ref, sk_ref, ck_ref, bias_ref,
            o_ref, krot_scr, *, scale, kv_len, G, D, rep, rope_k=True):
    qi = pl.program_id(2)
    g = pl.program_id(1)
    Lpk = k_ref.shape[1]
    bq = q_ref.shape[1]

    if rope_k:
        @pl.when(qi == 0)
        def _rope_k():
            sk = sk_ref[0, :, :] if sk_ref.ndim == 3 else sk_ref[:, :]
            ck = ck_ref[0, :, :] if ck_ref.ndim == 3 else ck_ref[:, :]
            if rep == 1:
                for h in range(G):
                    krot_scr[:, h * D:(h + 1) * D] = _rope_rows(
                        k_ref[0, :, h * D:(h + 1) * D], sk, ck)
            else:
                # full-KV block: rotate every kv head once
                n_kv = krot_scr.shape[1] // D
                for h in range(n_kv):
                    krot_scr[:, h * D:(h + 1) * D] = _rope_rows(
                        k_ref[0, :, h * D:(h + 1) * D], sk, ck)

    sq = sq_ref[0, :, :] if sq_ref.ndim == 3 else sq_ref[:, :]
    cq = cq_ref[0, :, :] if cq_ref.ndim == 3 else cq_ref[:, :]
    if bias_ref is None and kv_len != Lpk:
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, Lpk), 1)
    for h in range(G):
        q = _rope_rows(q_ref[0, :, h * D:(h + 1) * D], sq, cq)
        if rep == 1:
            kh, vh = h, h
            k = (krot_scr[:, kh * D:(kh + 1) * D] if rope_k
                 else k_ref[0, :, kh * D:(kh + 1) * D])
            v = v_ref[0, :, vh * D:(vh + 1) * D]
        else:
            # global q head -> kv head, dynamic lane offset (D-aligned)
            kv = (g * G + h) // rep
            k = (krot_scr[:, pl.dslice(kv * D, D)] if rope_k
                 else k_ref[0, :, pl.dslice(kv * D, D)])
            v = v_ref[0, :, pl.dslice(kv * D, D)]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if bias_ref is not None:
            s = s + bias_ref[0, 0, :, :].astype(jnp.float32)
        elif kv_len != Lpk:
            s = jnp.where(col < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp(s - m)
        # l >= 1 always: the max-scoring column gives exp(0) = 1, even on a
        # fully-masked row (finite NEG_INF), whose output is then mean(v) —
        # exactly what the XLA softmax reference produces for such rows.
        l = jnp.sum(p, axis=1, keepdims=True)
        o = jax.lax.dot_general(p.astype(v.dtype), v,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[0, :, h * D:(h + 1) * D] = (o / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "heads_per_step", "block_q",
                     "interpret"))
def flash_attention_rope(q: jax.Array, k: jax.Array, v: jax.Array,
                         sin: jax.Array, cos: jax.Array,
                         bias: Optional[jax.Array] = None,
                         *, n_heads: int, n_kv_heads: Optional[int] = None,
                         heads_per_step: int = 2, block_q: int = 128,
                         interpret: bool = False) -> jax.Array:
    """``[B, L, H*D] x [B, L, KV*D] -> [B, L, H*D]`` pre-RoPE in, attn out.

    ``sin``/``cos`` are the fp32 Neox tables ``[L, D]`` (shared positions) or
    ``[B, L, D]`` (per-row positions, the ragged serving path).  ``bias`` is
    an optional additive ``[B, 1, L, L]``.  Rotation is applied to q and k
    inside the kernel in fp32 exactly as ``models/llada.py:_apply_rope``
    with ``rope_full_precision=True``.

    ``heads_per_step`` (G) trades VMEM for pipeline occupancy; G=2 measured
    best on v5e (G=8 exceeds the 16 MB scoped-VMEM limit at L≈2.4k).
    """
    Lq, Lk = q.shape[1], k.shape[1]
    f32 = jnp.float32
    sin_q, cos_q = sin.astype(f32), cos.astype(f32)
    if Lq == Lk:
        sin_k, cos_k = sin_q, cos_q
    elif sin.ndim == 2:
        # distinct lengths from one table: q covers the first Lq positions
        sin_q, cos_q = sin_q[:Lq], cos_q[:Lq]
        sin_k, cos_k = sin.astype(f32)[:Lk], cos.astype(f32)[:Lk]
    else:
        raise ValueError("ragged sin/cos require Lq == Lk; use "
                         "flash_attention_rope_qonly for subset-q")
    return _launch(q, k, v, sin_q, cos_q, sin_k, cos_k, bias,
                   H=n_heads,
                   KV=n_kv_heads if n_kv_heads is not None else n_heads,
                   heads_per_step=heads_per_step, block_q=block_q,
                   rope_k=True, interpret=interpret)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "heads_per_step", "block_q",
                     "interpret"))
def flash_attention_rope_qonly(q: jax.Array, k: jax.Array, v: jax.Array,
                               sin_q: jax.Array, cos_q: jax.Array,
                               bias: Optional[jax.Array] = None,
                               *, n_heads: int,
                               n_kv_heads: Optional[int] = None,
                               heads_per_step: int = 2, block_q: int = 128,
                               interpret: bool = False) -> jax.Array:
    """Packed attention with PRE-ROTATED k/v — the feature-cache hot path.

    The per-layer cache (``models/llada.py:llada_hidden_with_cache``)
    stores post-RoPE K, so partial steps only rotate the recomputed q rows:
    ``sin_q``/``cos_q`` are the fp32 tables at q's TRUE absolute positions
    — ``[Lq, D]`` (shared) or ``[B, Lq, D]`` (per-row ``sel_pos`` gathers,
    the usual case).  ``q`` is ``[B, Lq, H*D]`` with any ``Lq``; ``k``/``v``
    are the full packed caches ``[B, Lk, KV*D]``.
    """
    return _launch(q, k, v, sin_q.astype(jnp.float32),
                   cos_q.astype(jnp.float32), None, None, bias,
                   H=n_heads,
                   KV=n_kv_heads if n_kv_heads is not None else n_heads,
                   heads_per_step=heads_per_step, block_q=block_q,
                   rope_k=False, interpret=interpret)


def _prefix_kernel(q_ref, k_ref, v_ref, sq_ref, cq_ref, sk_ref, ck_ref,
                   hi_ref, o_ref, krot_scr, *, scale, G, D, rep, block_k):
    """Prefix-masked online-softmax variant: per q block, K/V are consumed
    in ``block_k`` chunks only up to the block's max per-row kv bound —
    chunks past it are SKIPPED (never touch the MXU).  K sits fully in
    VMEM per (batch, group) exactly like :func:`_kernel` (fetched once
    across the inner q sweep), so the skip saves compute, the dominant
    cost, with no extra DMA."""
    qi = pl.program_id(2)
    g = pl.program_id(1)
    bq = q_ref.shape[1]
    n_kv = krot_scr.shape[1] // D

    @pl.when(qi == 0)
    def _rope_k():
        sk = sk_ref[0, :, :] if sk_ref.ndim == 3 else sk_ref[:, :]
        ck = ck_ref[0, :, :] if ck_ref.ndim == 3 else ck_ref[:, :]
        for h in range(n_kv):
            krot_scr[:, h * D:(h + 1) * D] = _rope_rows(
                k_ref[0, :, h * D:(h + 1) * D], sk, ck)

    sq = sq_ref[0, :, :] if sq_ref.ndim == 3 else sq_ref[:, :]
    cq = cq_ref[0, :, :] if cq_ref.ndim == 3 else cq_ref[:, :]
    # bounds ride transposed [Lp_q, B] (TPU tiling needs the q dim on the
    # sublane axis); select this block's batch column by masked reduce —
    # a lane-dim dynamic slice would need 128-alignment Mosaic can't prove
    b = pl.program_id(0)
    hi_all = hi_ref[:, :]                              # [bq, B] int32
    bsel = jax.lax.broadcasted_iota(jnp.int32, hi_all.shape, 1) == b
    hi_col = jnp.max(jnp.where(bsel, hi_all, 0), axis=1,
                     keepdims=True)                    # [bq, 1], bounds >= 1
    n_chunks = (jnp.max(hi_col) + block_k - 1) // block_k  # traced bound
    col0 = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
    for h in range(G):
        q = _rope_rows(q_ref[0, :, h * D:(h + 1) * D], sq, cq)
        if rep == 1:
            k_lanes = v_lanes = pl.dslice(h * D, D)
        else:
            kv = (g * G + h) // rep
            k_lanes = v_lanes = pl.dslice(kv * D, D)

        def chunk(ki, carry, q=q, k_lanes=k_lanes, v_lanes=v_lanes):
            m, l, acc = carry
            rows = pl.dslice(ki * block_k, block_k)
            ks = krot_scr[rows, k_lanes]
            vs = v_ref[0, rows, v_lanes]
            s = jax.lax.dot_general(
                q, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            s = jnp.where(col0 + ki * block_k < hi_col, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_new = acc * alpha + jax.lax.dot_general(
                p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return m_new, l_new, acc_new

        m, l, acc = jax.lax.fori_loop(
            0, n_chunks, chunk,
            (jnp.full((bq, 1), NEG_INF, jnp.float32),
             jnp.zeros((bq, 1), jnp.float32),
             jnp.zeros((bq, D), jnp.float32)))
        # bounds are >= 1 by construction (causal base), so l >= exp(0);
        # the guard only protects all-pad q blocks, which are sliced off
        o_ref[0, :, h * D:(h + 1) * D] = (
            acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("n_heads", "n_kv_heads", "heads_per_step", "block_q",
                     "block_k", "interpret"))
def flash_attention_rope_prefix(q: jax.Array, k: jax.Array, v: jax.Array,
                                sin: jax.Array, cos: jax.Array,
                                kv_hi: jax.Array,
                                *, n_heads: int,
                                n_kv_heads: Optional[int] = None,
                                heads_per_step: int = 2,
                                block_q: int = 128, block_k: int = 1024,
                                interpret: bool = False) -> jax.Array:
    """Prefix-masked packed attention with block-level K skipping — the
    FlexAttention-block-skip counterpart for the reference's task masks
    (``omni_attention.py:17-123``; all of causal/mmu/t2i are per-row
    prefix masks, see :mod:`mmada_parallel_tpu.ops.masks`).

    ``kv_hi``: ``[B, Lq]`` int32 exclusive per-row kv bound
    (``masks.prefix_bounds`` / ``mixed_prefix_bounds``); semantics match
    the dense bias ``kv < kv_hi[b, q]`` exactly.  Everything else as
    :func:`flash_attention_rope`.  Work scales with the MASKED area:
    causal runs ~half the score/value FLOPs of the dense-bias kernel.
    """
    f32 = jnp.float32
    B, Lq, HD = q.shape
    H = n_heads
    KV = n_kv_heads if n_kv_heads is not None else H
    D = HD // H
    if HD % H or H % KV:
        raise ValueError("bad head counts for packed layout")
    if kv_hi.shape != (B, Lq):
        raise ValueError(f"kv_hi must be [B={B}, Lq={Lq}] per-row bounds, "
                         f"got {kv_hi.shape}")
    rep = H // KV
    Lk = k.shape[1]
    scale = D ** -0.5
    G = min(heads_per_step, H)
    while H % G:
        G -= 1

    block_q = min(block_q, max(128, 1 << (Lq - 1).bit_length()))
    # clamp to the 128-padded key length: block_k >= Lk = ONE chunk (a
    # single bounds-masked dot, no skip — still no [L, L] bias in HBM)
    block_k = min(max(128, block_k - block_k % 128), -(-Lk // 128) * 128)
    Lp_q = -(-Lq // block_q) * block_q
    Lp_k = -(-Lk // block_k) * block_k

    def vmem_bytes(g):
        # K+V blocks (double-buffered across grid steps) + krot scratch +
        # the f32 K-side rope tables; measured: G=2 @ Lp_k 5120 = 17.9 MB
        # against the 16 MB scoped limit, G=1 = 11.7 MB (fits)
        lanes = g * D if rep == 1 else KV * D
        kv_bytes = 2 * 2 * Lp_k * lanes * k.dtype.itemsize
        return (kv_bytes + Lp_k * lanes * k.dtype.itemsize
                + 2 * Lp_k * D * 4)
    while G > 1 and rep == 1 and vmem_bytes(G) > 14 * 2 ** 20:
        G -= 1
        while H % G:
            G -= 1
    nG = H // G
    if Lp_q != Lq:
        q = jnp.pad(q, ((0, 0), (0, Lp_q - Lq), (0, 0)))
    if Lp_k != Lk:
        k = jnp.pad(k, ((0, 0), (0, Lp_k - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Lp_k - Lk), (0, 0)))
    # clamp to the true key length (K pad columns excluded), floor 1 so
    # padded q rows stay numerically defined (sliced off afterwards);
    # transposed [Lp_q, B] — TPU tiling wants the q dim on sublanes
    hi = jnp.clip(kv_hi.astype(jnp.int32), 1, Lk)
    if Lp_q != Lq:
        hi = jnp.pad(hi, ((0, 0), (0, Lp_q - Lq)), constant_values=1)
    hi = hi.T

    sin_q, cos_q = sin.astype(f32), cos.astype(f32)
    if Lq == Lk:
        sin_k, cos_k = sin_q, cos_q
    elif sin.ndim == 2:
        sin_q, cos_q = sin_q[:Lq], cos_q[:Lq]
        sin_k, cos_k = sin.astype(f32)[:Lk], cos.astype(f32)[:Lk]
    else:
        raise ValueError("ragged sin/cos require Lq == Lk")

    def pad_table(t, Lp, Lt):
        pad = ((0, 0), (0, Lp - Lt), (0, 0)) if t.ndim == 3 else \
            ((0, Lp - Lt), (0, 0))
        return jnp.pad(t, pad) if Lp != Lt else t

    shared = sin_k is sin_q and Lp_q == Lp_k
    sin_q = pad_table(sin_q, Lp_q, Lq)
    cos_q = pad_table(cos_q, Lp_q, Lq)
    if shared:
        sin_k, cos_k = sin_q, cos_q
    else:
        sin_k = pad_table(sin_k, Lp_k, Lk)
        cos_k = pad_table(cos_k, Lp_k, Lk)

    n_q = Lp_q // block_q
    grid = (B, nG, n_q)
    kv_lanes = G * D if rep == 1 else KV * D

    def kv_index(b, g, qi):
        return (b, 0, g) if rep == 1 else (b, 0, 0)

    def table_spec(t, blk, imap3, imap2):
        return pl.BlockSpec((1,) + blk, imap3) if t.ndim == 3 else \
            pl.BlockSpec(blk, imap2)

    sq_spec = table_spec(sin_q, (block_q, D),
                         lambda b, g, qi: (b, qi, 0),
                         lambda b, g, qi: (qi, 0))
    sk_spec = table_spec(sin_k, (Lp_k, D),
                         lambda b, g, qi: (b, 0, 0),
                         lambda b, g, qi: (0, 0))
    in_specs = [
        pl.BlockSpec((1, block_q, G * D), lambda b, g, qi: (b, qi, g)),
        pl.BlockSpec((1, Lp_k, kv_lanes), kv_index),
        pl.BlockSpec((1, Lp_k, kv_lanes), kv_index),
        sq_spec, sq_spec,
        sk_spec, sk_spec,
        pl.BlockSpec((block_q, B), lambda b, g, qi: (qi, 0)),
    ]
    out = pl.pallas_call(
        functools.partial(_prefix_kernel, scale=scale, G=G, D=D, rep=rep,
                          block_k=block_k),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, G * D),
                               lambda b, g, qi: (b, qi, g)),
        out_shape=jax.ShapeDtypeStruct((B, Lp_q, HD), q.dtype),
        scratch_shapes=[pltpu.VMEM((Lp_k, kv_lanes), k.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(q, k, v, sin_q, cos_q, sin_k, cos_k, hi)
    if Lp_q != Lq:
        out = out[:, :Lq]
    return out


def _launch(q, k, v, sin_q, cos_q, sin_k, cos_k, bias, *, H, KV,
            heads_per_step, block_q, rope_k, interpret):
    B, Lq, HD = q.shape
    D = HD // H
    if HD % H:
        raise ValueError("packed width must be a multiple of n_heads")
    if H % KV:
        raise ValueError("n_heads must be a multiple of n_kv_heads")
    rep = H // KV
    Lk = k.shape[1]
    scale = D ** -0.5
    G = min(heads_per_step, H)
    while H % G:
        G -= 1
    nG = H // G

    block_q = min(block_q, max(128, 1 << (Lq - 1).bit_length()))
    Lp_q = -(-Lq // block_q) * block_q
    Lp_k = -(-Lk // 128) * 128
    if Lp_q != Lq:
        q = jnp.pad(q, ((0, 0), (0, Lp_q - Lq), (0, 0)))
    if Lp_k != Lk:
        k = jnp.pad(k, ((0, 0), (0, Lp_k - Lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Lp_k - Lk), (0, 0)))
    if bias is not None and (Lp_q != Lq or Lp_k != Lk):
        bias = jnp.pad(bias,
                       ((0, 0), (0, 0), (0, Lp_q - Lq), (0, Lp_k - Lk)),
                       constant_values=NEG_INF)

    def pad_table(t, Lp, Lt):
        pad = ((0, 0), (0, Lp - Lt), (0, 0)) if t.ndim == 3 else \
            ((0, Lp - Lt), (0, 0))
        return jnp.pad(t, pad) if Lp != Lt else t

    k_shares_q_table = rope_k and sin_k is sin_q and Lp_q == Lp_k
    sin_q = pad_table(sin_q, Lp_q, Lq)
    cos_q = pad_table(cos_q, Lp_q, Lq)
    if rope_k:
        if k_shares_q_table:
            sin_k, cos_k = sin_q, cos_q
        else:
            sin_k = pad_table(sin_k, Lp_k, Lk)
            cos_k = pad_table(cos_k, Lp_k, Lk)
    else:
        # never read by the kernel; minimal arrays keep the arity fixed
        sin_k = cos_k = jnp.zeros((8, D), jnp.float32)

    n_q = Lp_q // block_q
    grid = (B, nG, n_q)
    kv_lanes = G * D if rep == 1 else KV * D

    def kv_index(b, g, qi):
        return (b, 0, g) if rep == 1 else (b, 0, 0)

    def table_spec(t, blk, imap3, imap2):
        return pl.BlockSpec((1,) + blk, imap3) if t.ndim == 3 else \
            pl.BlockSpec(blk, imap2)

    sq_spec = table_spec(sin_q, (block_q, D),
                         lambda b, g, qi: (b, qi, 0),
                         lambda b, g, qi: (qi, 0))
    sk_blk = (Lp_k, D) if rope_k else (8, D)
    sk_spec = table_spec(sin_k, sk_blk,
                         lambda b, g, qi: (b, 0, 0),
                         lambda b, g, qi: (0, 0))

    in_specs = [
        pl.BlockSpec((1, block_q, G * D), lambda b, g, qi: (b, qi, g)),
        pl.BlockSpec((1, Lp_k, kv_lanes), kv_index),
        pl.BlockSpec((1, Lp_k, kv_lanes), kv_index),
        sq_spec, sq_spec,
        sk_spec, sk_spec,
    ]
    args = [q, k, v, sin_q, cos_q, sin_k, cos_k]
    kw = dict(scale=scale, kv_len=Lk, G=G, D=D, rep=rep, rope_k=rope_k)
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, 1, block_q, Lp_k),
                                     lambda b, g, qi: (b, 0, qi, 0)))
        args.append(bias)
        kern = functools.partial(_kernel, **kw)
    else:
        kern = functools.partial(
            lambda qr, kr, vr, sq, cq, sk, ck, o, scr, **kw_: _kernel(
                qr, kr, vr, sq, cq, sk, ck, None, o, scr, **kw_), **kw)

    # scratch holds the rotated K block; without k-rotation it is unused
    # (kept 1-row so the kernel arity is static)
    scr_rows = Lp_k if rope_k else 8
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, G * D),
                               lambda b, g, qi: (b, qi, g)),
        out_shape=jax.ShapeDtypeStruct((B, Lp_q, HD), q.dtype),
        scratch_shapes=[pltpu.VMEM((scr_rows, kv_lanes), k.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)
    if Lp_q != Lq:
        out = out[:, :Lq]
    return out


# ---------------------------------------------------------------------------
# GSPMD partitioning (the multi-chip TP path)
# ---------------------------------------------------------------------------


def _axis_count(mesh, axes) -> int:
    if axes is None:
        return 1
    if isinstance(axes, (tuple, list)):
        n = 1
        for a in axes:
            n *= mesh.shape[a]
        return n
    return mesh.shape[axes]


def _build_partitioned_rope(kernel, H: int, KV: int, has_bias: bool,
                            ragged: bool, interpret: bool, qonly: bool):
    """Shared ``custom_partitioning`` scaffolding for the two kernel
    flavors (full rope vs q-only): identical infer/partition logic; only
    the wrapped kernel and the Shardy factor bookkeeping differ (q-only
    has a distinct kv sequence length, so its kv/bias maps carry a
    separate ``m`` factor)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(*args):
        q, k, v, sin, cos = args[:5]
        bias = args[5] if has_bias else None
        return kernel(q, k, v, sin, cos, bias, n_heads=H, n_kv_heads=KV,
                      interpret=interpret)

    fsa = custom_partitioning(impl)

    def _spec_entry(sharding, i):
        spec = getattr(sharding, "spec", None)
        if spec is None or len(spec) <= i:
            return None
        return spec[i]

    def infer(mesh, arg_shapes, result_shape):
        qs = arg_shapes[0].sharding
        batch = _spec_entry(qs, 0)
        lane = _spec_entry(qs, 2)
        if H % _axis_count(mesh, lane) or KV % _axis_count(mesh, lane):
            lane = None
        return NamedSharding(mesh, P(batch, None, lane))

    def partition(mesh, arg_shapes, result_shape):
        qs = arg_shapes[0].sharding
        batch = _spec_entry(qs, 0)
        lane = _spec_entry(qs, 2)
        tp = _axis_count(mesh, lane)
        if tp > 1 and (H % tp or KV % tp):
            lane, tp = None, 1
        lH, lKV = H // tp, KV // tp
        qkv_sh = NamedSharding(mesh, P(batch, None, lane))

        def rope_sh(shape):
            return NamedSharding(
                mesh,
                P(batch, None, None) if len(shape) == 3 else P(None, None))

        arg_sh = [qkv_sh, qkv_sh, qkv_sh,
                  rope_sh(arg_shapes[3].shape), rope_sh(arg_shapes[4].shape)]
        if has_bias:
            arg_sh.append(NamedSharding(mesh, P(batch, None, None, None)))

        def lower(*args):
            q, k, v, sin, cos = args[:5]
            bias = args[5] if has_bias else None
            return kernel(q, k, v, sin, cos, bias, n_heads=lH,
                          n_kv_heads=lKV, interpret=interpret)

        return mesh, lower, qkv_sh, tuple(arg_sh)

    # Shardy propagation rule (einsum-like): batch `b` and packed lanes
    # `x` are shardable passthrough factors; sequence and rope-table dims
    # must be replicated (the kernel consumes the full sequence).  The
    # legacy callbacks above serve the GSPMD partitioner when Shardy is
    # off.  GQA: q's packed lanes (H*D) and k/v's (KV*D) are different
    # sizes, so they need distinct factors; MHA shares one so lane
    # sharding propagates.  q-only: k/v carry their own sequence factor
    # ``m`` (Lk != Lq), and the bias is [B, 1, Lq, Lk] = ``b c l m``.
    rope_map = "b s e" if ragged else "s e"
    kv_seq = "m" if qonly else "l"
    kv_map = f"b {kv_seq} " + ("x" if H == KV else "y")
    ops = ["b l x", kv_map, kv_map, rope_map, rope_map]
    if has_bias:
        ops.append("b c l m" if qonly else "b c m n")
    rule_str = ", ".join(ops) + " -> b l x"
    seq_repl = ("l", "m", "s", "e") if qonly else ("l", "s", "e")
    bias_repl = ("c",) if qonly else ("c", "m", "n")
    need_repl = seq_repl + (bias_repl if has_bias else ()) + \
        (("y",) if H != KV else ())
    from jax._src.custom_partitioning_sharding_rule import (
        str_to_sdy_sharding_rule)
    rule = str_to_sdy_sharding_rule(rule_str,
                                    need_replication_factors=need_repl)
    fsa.def_partition(partition=partition,
                      infer_sharding_from_operands=infer,
                      sharding_rule=rule)
    return fsa


@functools.lru_cache(maxsize=None)
def partitioned_flash_rope(n_heads: int, n_kv_heads: int, has_bias: bool,
                           ragged: bool = False,
                           interpret: bool = False):
    """:func:`flash_attention_rope` wrapped in ``custom_partitioning`` so
    GSPMD can shard it instead of treating the ``pallas_call`` as an opaque
    custom call (which would force replicated operands — an all-gather of
    every q/k/v under the TP mesh, exactly the collective the Megatron
    sharding avoids by keeping attention head-local).

    Attention is independent per head and per batch row, so the rule is:
    shard batch by q's batch spec, heads by q's lane spec (head ``h`` is
    lane slice ``h*D``, so a lane shard = a contiguous head shard whenever
    the TP degree divides the head counts), and run the kernel per shard
    with the *local* head count.  sin/cos are replicated ([L, D] tables) or
    batch-sharded ([B, L, D] ragged); bias is batch-sharded.  Falls back to
    replicated heads when the lane sharding does not divide evenly.

    This is the GSPMD counterpart of the reference's explicit
    tensor-parallel attention sharding (`finetune.py:54-61` fairscale
    scaffolding); here the partitioner calls back into the same kernel with
    smaller ``n_heads``.
    """
    return _build_partitioned_rope(flash_attention_rope, n_heads,
                                   n_kv_heads, has_bias, ragged, interpret,
                                   qonly=False)


@functools.lru_cache(maxsize=None)
def partitioned_flash_rope_qonly(n_heads: int, n_kv_heads: int,
                                 has_bias: bool, ragged: bool = False,
                                 interpret: bool = False):
    """:func:`flash_attention_rope_qonly` under the same GSPMD
    ``custom_partitioning`` rule as :func:`partitioned_flash_rope` —
    without it, multi-chip cached serving would all-gather the lane-sharded
    q and the full packed k/v caches around the opaque kernel every layer.

    Operands: ``(q [B,Lq,H*D], k [B,Lk,KV*D], v, sin_q, cos_q[, bias])``.
    """
    return _build_partitioned_rope(flash_attention_rope_qonly, n_heads,
                                   n_kv_heads, has_bias, ragged, interpret,
                                   qonly=True)
