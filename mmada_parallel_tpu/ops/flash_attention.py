"""Pallas TPU flash attention — bidirectional, bias-aware, GQA-native.

The TPU replacement for the reference's flash-attn CUDA kernel and SDPA
dispatch (``MMaDA-Parallel-A/model/modeling_llada.py:581-588,643-679``;
always ``is_causal=False`` for the masked-diffusion model).

Design (classic TPU online-softmax flash):

* grid ``(B, H, nQ, nK)`` — the key-block axis is innermost, so the running
  max ``m``, normalizer ``l`` and output accumulator live in VMEM scratch
  across the nK sweep of one (batch, head, q-block);
* q/k/v blocks stream HBM -> VMEM via BlockSpecs (double-buffered by the
  Pallas pipeline); the [L, L] score matrix never exists in HBM;
* GQA is folded into the k/v index maps (q head h reads kv head
  ``h // (H // KV)``) instead of materializing ``repeat_interleave`` copies
  (``modeling_llada.py:662-668``);
* the optional additive bias ``[B, 1, L, L]`` streams block-wise (padding
  masks, task masks from :mod:`mmada_parallel_tpu.ops.masks`).

The wrapper pads sequence length to the block size with -1e30 key bias, so
any L works.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_attention"]

NEG_INF = -1e30


def _kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr,
            *, scale: float, n_k: int, block_k: int, kv_len: int):
    ki = pl.program_id(3)

    @pl.when(ki == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0, :, :]                      # [BQ, D]
    k = k_ref[0, 0, :, :]                      # [BK, D]
    v = v_ref[0, 0, :, :]                      # [BK, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale      # [BQ, BK]
    if bias_ref is not None:
        s = s + bias_ref[0, 0, :, :].astype(jnp.float32)
    elif kv_len % block_k:
        # key padding handled in-kernel (no HBM bias materialization)
        col = ki * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(col < kv_len, s, NEG_INF)

    m_prev = m_scr[:]                           # [BQ, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)                      # [BQ, BK]
    alpha = jnp.exp(m_prev - m_new)             # [BQ, 1]

    l_scr[:] = l_scr[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_scr[:] = m_new

    @pl.when(ki == n_k - 1)
    def _finish():
        l = l_scr[:]
        l = jnp.where(l == 0.0, 1.0, l)  # fully-masked row -> zeros
        o_ref[0, 0, :, :] = (acc_scr[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_q", "block_k", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    bias: Optional[jax.Array] = None,
                    block_q: int = 128, block_k: Optional[int] = None,
                    interpret: bool = False) -> jax.Array:
    """``[B, L, H, hd] x [B, L, KV, hd] -> [B, L, H, hd]``, non-causal.

    Default blocking is narrow-q x full-K: on v5e a (128, full-L) sweep
    measured 85-105 TFLOP/s vs ~58 for square 512x512 blocks (K/V stream
    once per q block; the single-pass softmax needs no rescale chain).
    ``block_k=None`` -> the padded sequence length, capped at 8192 to bound
    VMEM (K+V+scores ~8 MB at the cap).

    ``interpret=True`` runs the kernel in the Pallas interpreter (exact, any
    backend) — the CPU test path.  ``q`` and ``k/v`` sequence lengths may
    differ (rectangular attention, used by the feature-cache partial
    recompute)."""
    B, Lq, H, D = q.shape
    Lk = k.shape[1]
    KV = k.shape[2]
    if H % KV:
        raise ValueError("n_heads must be a multiple of n_kv_heads")
    rep = H // KV
    scale = D ** -0.5

    block_q = min(block_q, max(128, 1 << (Lq - 1).bit_length()))
    if block_k is None:
        block_k = min(-(-Lk // 128) * 128, 8192)
    block_k = min(block_k, max(128, 1 << (Lk - 1).bit_length()))
    Lp_q = -(-Lq // block_q) * block_q
    Lp_k = -(-Lk // block_k) * block_k

    needs_pad = Lp_q != Lq or Lp_k != Lk
    if bias is not None and needs_pad:
        # fold key padding into the user bias; query padding rows are
        # garbage we slice off at the end
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, Lp_q - Lq), (0, Lp_k - Lk)),
                       constant_values=NEG_INF)
    # without a user bias, key padding is masked in-kernel by an iota
    # compare against the true kv length — no [Lq, Lk] bias materialization
    if needs_pad:
        q = jnp.pad(q, ((0, 0), (0, Lp_q - Lq), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, Lp_k - Lk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, Lp_k - Lk), (0, 0), (0, 0)))

    # TPU tiling wants the (sequence, head_dim) axes last -> BHLD layout
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    n_q = Lp_q // block_q
    n_k = Lp_k // block_k
    grid = (B, H, n_q, n_k)

    in_specs = [
        pl.BlockSpec((1, 1, block_q, D), lambda b, h, qi, ki: (b, h, qi, 0)),
        pl.BlockSpec((1, 1, block_k, D),
                     lambda b, h, qi, ki, rep=rep: (b, h // rep, ki, 0)),
        pl.BlockSpec((1, 1, block_k, D),
                     lambda b, h, qi, ki, rep=rep: (b, h // rep, ki, 0)),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec((1, 1, block_q, block_k),
                                     lambda b, h, qi, ki: (b, 0, qi, ki)))
        args.append(bias)
        kernel = functools.partial(_kernel, scale=scale, n_k=n_k,
                                   block_k=block_k, kv_len=Lk)
    else:
        kernel = functools.partial(
            lambda qr, kr, vr, o, m, l, a, **kw: _kernel(
                qr, kr, vr, None, o, m, l, a, **kw),
            scale=scale, n_k=n_k, block_k=block_k, kv_len=Lk)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, block_q, D),
                               lambda b, h, qi, ki: (b, h, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Lp_q, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
    out = out.transpose(0, 2, 1, 3)  # back to BLHD
    if Lp_q != Lq:
        out = out[:, :Lq]
    return out
