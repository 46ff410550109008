"""LLaDA masked-diffusion transformer backbone, TPU-native.

A functional JAX re-design of the reference's OLMo-lineage ``LLaDAModel``
(``MMaDA-Parallel-A/model/modeling_llada.py``, llama-block flavor
``LLaDALlamaBlock`` at ``:856-972``): bidirectional (non-causal) attention,
GQA, neox-style RoPE, RMSNorm, SwiGLU-gated MLP (``silu(ff_proj(x)) *
up_proj(x)``), united text+image vocab head.

TPU-first design decisions (vs. a torch port):

* **Pure functions over a parameter pytree.**  Parameters for all layers are
  stacked along a leading layer axis and the block stack runs as one
  ``jax.lax.scan`` — one compiled block program regardless of depth, fast
  XLA compiles, and a natural place for ``jax.checkpoint`` (activation
  rematerialisation replaces the reference's FSDP checkpoint_wrapper,
  ``finetune.py:342-352``).
* **Sharding as metadata.** :func:`param_shardings` returns a
  ``PartitionSpec`` pytree over mesh axes ``('fsdp', 'tensor')`` — GSPMD
  inserts the all-gathers/reduce-scatters that FSDP/fairscale do by hand in
  the reference (``finetune.py:371-413``).
* **Attention is a swappable op** (:mod:`mmada_parallel_tpu.ops.attention`):
  XLA SDPA reference path and a Pallas flash kernel, both bidirectional,
  replacing flash-attn/SDPA dispatch (``modeling_llada.py:581-588,643-679``).
* **Static shapes.** Padding is expressed as a ``[B, L]`` bool mask folded
  into the attention bias, replacing the ragged-list repadding of
  ``modeling_xllmx_dimoo.py:53-62``.

Checkpoint compatibility: parameter names/shapes map 1:1 onto the HF
checkpoint tree (see :mod:`mmada_parallel_tpu.models.convert`).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from mmada_parallel_tpu.ops.attention import (rope_attention,
                                              rope_attention_qonly)
from mmada_parallel_tpu.ops.rope_attention import apply_rope

__all__ = [
    "LLaDAConfig",
    "init_llada_params",
    "llada_forward",
    "param_shardings",
    "count_params",
]


@dataclasses.dataclass(frozen=True)
class LLaDAConfig:
    """Architecture hyperparameters.

    Field semantics follow ``model/configuration_llada.py:130-384``; only the
    fields exercised by the released checkpoints are kept (both released 8B
    models use the llama block type with RMSNorm + RoPE + SiLU gating).
    """

    d_model: int = 4096
    n_heads: int = 32
    n_kv_heads: Optional[int] = None          # None -> n_heads (MHA)
    n_layers: int = 32
    mlp_hidden_size: Optional[int] = None     # None -> mlp_ratio * d_model
    mlp_ratio: int = 4
    vocab_size: int = 126464
    embedding_size: Optional[int] = None      # None -> vocab_size
    max_sequence_length: int = 8192           # RoPE table bound (informative)
    rope_theta: float = 500000.0
    rope_full_precision: bool = True
    rms_norm_eps: float = 1e-5
    layer_norm_type: str = "rms"              # "rms" | "gemma_rms" | "default"
    include_bias: bool = False
    include_qkv_bias: bool = False
    block_type: str = "llama"                 # "llama" | "sequential"
    activation_type: str = "silu"             # "silu" | "gelu" | "relu" | "swiglu"
    weight_tying: bool = False
    input_emb_norm: bool = False
    scale_logits: bool = False
    attention_layer_norm: bool = False        # q/k norm (unused by 8B ckpts)
    init_fn: str = "normal"                   # "normal" | "mitchell" | "kaiming_normal" | "fan_in" | "full_megatron"
    init_std: float = 0.02
    init_cutoff_factor: Optional[float] = None
    mask_token_id: int = 126336
    eos_token_id: int = 126081
    pad_token_id: int = 126081
    # --- TPU execution policy (not part of the checkpoint contract) ---
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16
    # activation rematerialisation, mirroring the reference's
    # ActivationCheckpointingStrategy enum (configuration_llada.py:386-430):
    # "none" | "whole_layer" | "one_in_two" | "one_in_three" | "one_in_four"
    remat: str = "none"
    attention_impl: str = "auto"              # "auto" | "xla" | "pallas"

    @property
    def effective_n_kv_heads(self) -> int:
        return self.n_kv_heads if self.n_kv_heads is not None else self.n_heads

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def hidden_size(self) -> int:
        # Reference: mlp_hidden_size or mlp_ratio * d_model (modeling_llada.py:536-538)
        return (self.mlp_hidden_size if self.mlp_hidden_size is not None
                else self.mlp_ratio * self.d_model)

    @property
    def emb_size(self) -> int:
        return self.embedding_size if self.embedding_size is not None else self.vocab_size

    @property
    def act_output_multiplier(self) -> float:
        # SwiGLU consumes 2x and emits 1x (modeling_llada.py:482-489)
        return 0.5 if self.activation_type == "swiglu" else 1.0

    def validate(self) -> None:
        if self.d_model % self.n_heads:
            raise ValueError("d_model must be a multiple of n_heads")
        if self.n_heads % self.effective_n_kv_heads:
            raise ValueError("n_heads must be a multiple of n_kv_heads")

    @classmethod
    def tiny(cls, **overrides) -> "LLaDAConfig":
        """A CPU-testable config preserving every structural feature."""
        base = dict(d_model=64, n_heads=4, n_kv_heads=2, n_layers=2,
                    mlp_hidden_size=128, vocab_size=512, rope_theta=10000.0,
                    max_sequence_length=512, mask_token_id=3,
                    param_dtype=jnp.float32, compute_dtype=jnp.float32)
        base.update(overrides)
        return cls(**base)

    @classmethod
    def llada_8b(cls, **overrides) -> "LLaDAConfig":
        """The released MMaDA-Parallel-A/M backbone shape.

        d_model 4096 / 32 layers / 32 heads / mlp 12288, united vocab
        126356+8192 (A) — from the checkpoint config distributed with
        ``tyfeld/MMaDA-Parallel-A`` (config.json mirrors
        ``configuration_llada.py`` defaults overridden at load).
        """
        base = dict(d_model=4096, n_heads=32, n_kv_heads=32, n_layers=32,
                    mlp_hidden_size=12288, vocab_size=126464,
                    embedding_size=134656, rope_theta=500000.0,
                    max_sequence_length=8192)
        base.update(overrides)
        return cls(**base)


# ---------------------------------------------------------------------------
# Initialization
# ---------------------------------------------------------------------------


def init_llada_params(key: jax.Array, cfg: LLaDAConfig) -> Dict[str, Any]:
    """Initialize a parameter pytree.

    Init schemes mirror ``init_weights`` (``modeling_llada.py:80-155``):
    ``normal`` (std=init_std, optional truncation cutoff, residual outputs
    scaled by ``1/sqrt(2*n_layers)``), ``mitchell`` (``1/sqrt(d_in)`` with
    per-layer decay), ``kaiming_normal`` (``sqrt(2/fan_in)``), ``fan_in``,
    and ``full_megatron`` (role-keyed stds).
    Block parameters are stacked on a leading ``[n_layers, ...]`` axis.
    """
    cfg.validate()
    d, h = cfg.d_model, cfg.hidden_size
    kvd = cfg.effective_n_kv_heads * cfg.head_dim
    L = cfg.n_layers
    keys = jax.random.split(key, 8)
    pd = cfg.param_dtype
    std0 = cfg.init_std
    resid_div = math.sqrt(2 * L)

    def trunc(k, shape, std, cutoff):
        if cutoff is None:
            return (std * jax.random.normal(k, shape)).astype(pd)
        return (std * jax.random.truncated_normal(k, -cutoff, cutoff,
                                                  shape)).astype(pd)

    def nrm(k, shape, role: str = "in"):
        """role: in | out_attn | out_resid | emb | final.

        ``out_resid`` is the block ``ff_out`` (the only ``_is_residual``
        module, ``modeling_llada.py:574``); under ``normal`` init it gets the
        extra ``1/sqrt(2*n_layers)`` scaling (``:153-155``); under
        ``full_megatron`` both out roles share the scaled std.
        """
        d_in = shape[-2] if len(shape) >= 2 else d
        if cfg.init_fn == "normal":
            w = trunc(k, shape, std0, cfg.init_cutoff_factor)
            if role == "out_resid":
                w = w / resid_div
            return w.astype(pd)
        if cfg.init_fn == "mitchell":
            std = 1.0 / math.sqrt(d_in)
            w = trunc(k, shape, std, 3.0)
            if role in ("out_attn", "out_resid") and len(shape) == 3:
                # per-layer decay 1/sqrt(2*(layer_id+1)) (modeling_llada.py:107-110)
                decay = 1.0 / jnp.sqrt(2.0 * (jnp.arange(L) + 1.0))
                w = (w * decay[:, None, None].astype(w.dtype))
            return w.astype(pd)
        if cfg.init_fn == "kaiming_normal":
            # torch kaiming_normal_(nonlinearity="relu"), mode=fan_in
            # (modeling_llada.py:111-112): std = sqrt(2 / fan_in).  torch
            # fan_in is weight.size(1): embedding dim for wte, input
            # features for (d_in, d_out)-layout projections.
            fan = shape[-1] if role == "emb" else d_in
            return (math.sqrt(2.0 / fan)
                    * jax.random.normal(k, shape)).astype(pd)
        if cfg.init_fn == "fan_in":
            return trunc(k, shape, 1.0 / math.sqrt(d_in), None)
        if cfg.init_fn == "full_megatron":
            cut = cfg.init_cutoff_factor if cfg.init_cutoff_factor else 3.0
            std = {"in": std0, "out_attn": std0 / resid_div,
                   "out_resid": std0 / resid_div, "emb": std0,
                   "final": d ** -0.5}[role]
            return trunc(k, shape, std, cut)
        raise ValueError(f"unknown init_fn: {cfg.init_fn}")

    if cfg.block_type == "llama":
        blocks = {
            "attn_norm": jnp.ones((L, d), pd),
            "ff_norm": jnp.ones((L, d), pd),
            "q_proj": nrm(keys[1], (L, d, d)),
            "k_proj": nrm(keys[2], (L, d, kvd)),
            "v_proj": nrm(keys[3], (L, d, kvd)),
            "attn_out": nrm(keys[4], (L, d, d), "out_attn"),
            "ff_proj": nrm(keys[5], (L, d, h)),
            "up_proj": nrm(keys[6], (L, d, h)),
            "ff_out": nrm(keys[7], (L, h, d), "out_resid"),
        }
        if cfg.include_qkv_bias:
            blocks["q_bias"] = jnp.zeros((L, d), pd)
            blocks["k_bias"] = jnp.zeros((L, kvd), pd)
            blocks["v_bias"] = jnp.zeros((L, kvd), pd)
    elif cfg.block_type == "sequential":
        # fused qkv + plain-or-SwiGLU MLP (modeling_llada.py:766-853)
        ff_out_in = int(cfg.act_output_multiplier * h)
        blocks = {
            "attn_norm": jnp.ones((L, d), pd),
            "ff_norm": jnp.ones((L, d), pd),
            "att_proj": nrm(keys[1], (L, d, d + 2 * kvd)),
            "attn_out": nrm(keys[4], (L, d, d), "out_attn"),
            "ff_proj": nrm(keys[5], (L, d, h)),
            "ff_out": nrm(keys[7], (L, ff_out_in, d), "out_resid"),
        }
        if cfg.include_qkv_bias:
            blocks["att_proj_bias"] = jnp.zeros((L, d + 2 * kvd), pd)
    else:
        raise ValueError(f"unknown block_type: {cfg.block_type}")

    params: Dict[str, Any] = {
        "wte": nrm(keys[0], (cfg.emb_size, d), "emb"),
        "ln_f": jnp.ones((d,), pd),
        "blocks": blocks,
    }
    if not cfg.weight_tying:
        params["head"] = nrm(jax.random.split(keys[0])[1], (d, cfg.emb_size),
                             "final")
    return params


def count_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------


def _rms_norm(x: jax.Array, weight: jax.Array, eps: float,
              gemma: bool = False) -> jax.Array:
    """RMSNorm with fp32 statistics (``modeling_llada.py:301-329``)."""
    og = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    x = xf.astype(og)
    if gemma:
        return x * (1 + weight).astype(og)
    return x * weight.astype(og)


def _layer_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Plain LayerNorm, no bias (``modeling_llada.py:270-299`` with the
    default ``include_bias=False``); fp32 statistics."""
    og = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return xf.astype(og) * weight.astype(og)


def _norm(x: jax.Array, weight: jax.Array, cfg: "LLaDAConfig") -> jax.Array:
    if cfg.layer_norm_type == "default":
        return _layer_norm(x, weight)
    return _rms_norm(x, weight, cfg.rms_norm_eps,
                     cfg.layer_norm_type == "gemma_rms")


def _rope_sin_cos(seq_len: int, head_dim: int, theta: float) -> Tuple[jax.Array, jax.Array]:
    """Neox-style RoPE tables ``[L, head_dim]`` in fp32.

    ``positions = cat((freqs, freqs))`` as in ``modeling_llada.py:391-400``.
    """
    inv_freq = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float32) / head_dim))
    t = jnp.arange(seq_len, dtype=jnp.float32)
    freqs = jnp.outer(t, jnp.asarray(inv_freq))          # [L, hd/2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)       # [L, hd]
    return jnp.sin(emb), jnp.cos(emb)


# fp32 Neox rotation, single-sourced with the fused-rope Pallas kernel
# (ops/rope_attention.py); cache/partial paths below call these directly.
_apply_rope = apply_rope


def _activation(x: jax.Array, kind: str) -> jax.Array:
    if kind == "silu":
        return jax.nn.silu(x)
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "swiglu":
        # x, gate = chunk(2); silu(gate) * x  (modeling_llada.py:482-486)
        a, gate = jnp.split(x, 2, axis=-1)
        return jax.nn.silu(gate) * a
    raise ValueError(f"unknown activation: {kind}")


def _pmm(x: jax.Array, w: Any) -> jax.Array:
    """Param matmul: dense (bf16/f32) or W8A8 int8 when ``w`` is a
    quantized-weight dict (:mod:`mmada_parallel_tpu.ops.quant`) — the
    dispatch keeps scan-over-stacked-layers, cached forwards, and the head
    on one code path."""
    if isinstance(w, dict):
        from mmada_parallel_tpu.ops.quant import int8_matmul
        return int8_matmul(x, w["w_q"], w["scale"])
    return x @ w.astype(x.dtype)


def _block(x: jax.Array, lp: Dict[str, jax.Array], cfg: LLaDAConfig,
           sin: jax.Array, cos: jax.Array,
           attn_bias: Optional[jax.Array]) -> jax.Array:
    """One transformer block, bidirectional attention.

    ``llama`` flavor (``modeling_llada.py:907-972``): separate q/k/v,
    ``ff_out(silu(ff_proj(h)) * up_proj(h))`` gating.
    ``sequential`` flavor (``:766-853``): fused ``att_proj`` qkv split +
    ``ff_out(act(ff_proj(h)))`` (SwiGLU halves the hidden dim).
    """
    B, L, D = x.shape
    nh, nkv, hd = cfg.n_heads, cfg.effective_n_kv_heads, cfg.head_dim
    cdt = x.dtype

    h = _norm(x, lp["attn_norm"], cfg)
    if cfg.block_type == "sequential":
        qkv = _pmm(h, lp["att_proj"])
        if "att_proj_bias" in lp:
            qkv = qkv + lp["att_proj_bias"].astype(cdt)
        kvd = nkv * hd
        q = qkv[..., :D]
        k = qkv[..., D:D + kvd]
        v = qkv[..., D + kvd:]
    else:
        q = _pmm(h, lp["q_proj"])
        k = _pmm(h, lp["k_proj"])
        v = _pmm(h, lp["v_proj"])
        if "q_bias" in lp:
            q = q + lp["q_bias"].astype(cdt)
            k = k + lp["k_bias"].astype(cdt)
            v = v + lp["v_bias"].astype(cdt)

    # q/k/v stay in the packed [B, L, H*hd] projection layout: on TPU the
    # fused-rope Pallas kernel consumes it directly (no BLHD relayouts);
    # elsewhere rope_attention runs the unpacked reshape->rope->attn chain.
    att = rope_attention(q, k, v, sin, cos, bias=attn_bias,
                         n_heads=nh, n_kv_heads=nkv,
                         full_precision=cfg.rope_full_precision,
                         impl=cfg.attention_impl)
    x = x + _pmm(att, lp["attn_out"])

    h = _norm(x, lp["ff_norm"], cfg)
    if cfg.block_type == "sequential":
        act = _activation(_pmm(h, lp["ff_proj"]), cfg.activation_type)
        x = x + _pmm(act, lp["ff_out"])
    else:
        gate = jax.nn.silu(_pmm(h, lp["ff_proj"]))
        up = _pmm(h, lp["up_proj"])
        x = x + _pmm(gate * up, lp["ff_out"])
    return x


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def llada_hidden(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Backbone only: ``[B, L] ids -> [B, L, d_model]`` final hidden states
    (post ``ln_f``).

    ``attn_mask`` is an optional ``[B, L]`` bool padding mask (True = real
    token); it becomes the pairwise additive bias the reference builds in
    ``modeling_xllmx_dimoo.py:56-62``.  Attention is always bidirectional
    (``is_causal=False`` everywhere, ``modeling_llada.py:658,672-679``).

    ``position_ids`` is an optional ``[B, L]`` int RoPE position per token.
    Ragged batches padded mid-sequence pass ``cumsum(attn_mask)-1`` (each
    real token's rank among real tokens) so every request sees exactly the
    positions of its unpadded single-row run — the reference's batch path
    (right-padding at the tail, ``modeling_xllmx_dimoo.py:53-62``) gets the
    same invariance for free, this generalizes it to padding anywhere.

    The head is split out (:func:`llada_head`) so samplers can project only
    the positions/vocab-slices they consume — the reference materializes the
    full ``[B, L, 134k]`` logits every denoise step, which on TPU wastes both
    MXU flops and HBM (~1.4 GB bf16 at L=5.4k).
    """
    cdt = cfg.compute_dtype
    B, L = input_ids.shape

    # mode="clip": an out-of-range id yields the last embedding row instead of
    # undefined XLA gather results (observed as NaN logits on TPU).
    x = jnp.take(params["wte"], input_ids, axis=0, mode="clip").astype(cdt)
    if cfg.input_emb_norm:
        x = x * jnp.asarray(math.sqrt(cfg.d_model), cdt)

    sin, cos = _rope_sin_cos(L, cfg.head_dim, cfg.rope_theta)
    if position_ids is not None:
        sin = jnp.take(sin, position_ids, axis=0)  # [B, L, hd]
        cos = jnp.take(cos, position_ids, axis=0)

    attn_bias = None
    if attn_mask is not None:
        pair = attn_mask[:, :, None] & attn_mask[:, None, :]
        attn_bias = jnp.where(pair[:, None, :, :], 0.0, -1e30).astype(jnp.float32)

    body_fn = partial(_block, cfg=cfg, sin=sin, cos=cos, attn_bias=attn_bias)

    group = {"none": 0, "whole_layer": 1, "one_in_two": 2,
             "one_in_three": 3, "one_in_four": 4}.get(cfg.remat)
    if group is None:
        raise ValueError(f"unknown remat strategy: {cfg.remat}")
    if group > 1 and cfg.n_layers % group != 0:
        raise ValueError(
            f"remat={cfg.remat!r} needs n_layers divisible by {group} "
            f"(got {cfg.n_layers}); use 'whole_layer' instead")

    if group <= 1:
        if group == 1:
            body_fn = jax.checkpoint(body_fn)

        def scan_body(carry, layer_params):
            return body_fn(carry, layer_params), None

        x, _ = jax.lax.scan(scan_body, x, params["blocks"])
    else:
        # one_in_k: checkpoint only every k-th layer boundary — scan over
        # layer *groups* of size k with the group body rematerialized
        # (the k inner layers recompute in backward, saving 1/k of the
        # activation memory the whole-layer strategy would keep).
        grouped = jax.tree_util.tree_map(
            lambda p: p.reshape((cfg.n_layers // group, group) + p.shape[1:]),
            params["blocks"])

        @jax.checkpoint
        def group_body_fn(carry, group_params):
            def inner(c, lp):
                return body_fn(c, lp), None
            out, _ = jax.lax.scan(inner, carry, group_params)
            return out

        def scan_groups(carry, gp):
            return group_body_fn(carry, gp), None

        x, _ = jax.lax.scan(scan_groups, x, grouped)

    return _norm(x, params["ln_f"], cfg)


def llada_head(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    hidden: jax.Array,
    vocab_slice: Optional[Tuple[int, int]] = None,
    logits_dtype: Any = jnp.float32,
) -> jax.Array:
    """Vocab projection: ``[..., d_model] -> [..., V]`` logits.

    ``vocab_slice=(start, size)`` projects onto a static slice of the vocab —
    e.g. only the 8192 codebook logits for image CFG steps
    (``parallel_generator.py:239-244`` slices after computing the full head;
    here the [d_model, 8192] sub-matmul is all that runs).
    """
    head = params["head"] if not cfg.weight_tying else params["wte"].T
    if isinstance(head, dict):  # W8A8 quantized head (ops/quant.py)
        from mmada_parallel_tpu.ops.quant import int8_matmul
        w_q, scale = head["w_q"], head["scale"]
        if vocab_slice is not None:
            start, size = vocab_slice
            w_q = jax.lax.slice_in_dim(w_q, start, start + size, axis=1)
            scale = jax.lax.slice_in_dim(scale, start, start + size, axis=1)
        logits = int8_matmul(hidden, w_q, scale, out_dtype=logits_dtype)
    else:
        if vocab_slice is not None:
            start, size = vocab_slice
            head = jax.lax.slice_in_dim(head, start, start + size, axis=1)
        logits = jnp.einsum("...d,dv->...v", hidden,
                            head.astype(hidden.dtype),
                            preferred_element_type=logits_dtype)
    if cfg.scale_logits:
        logits = logits * (1.0 / math.sqrt(cfg.d_model))
    return logits.astype(logits_dtype)


def llada_forward(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    attn_mask: Optional[jax.Array] = None,
    logits_dtype: Any = jnp.float32,
) -> jax.Array:
    """Full-sequence forward: ``[B, L] ids -> [B, L, emb_size] logits``."""
    hidden = llada_hidden(params, cfg, input_ids, attn_mask)
    return llada_head(params, cfg, hidden, logits_dtype=logits_dtype)


# ---------------------------------------------------------------------------
# Feature-cached partial forward (the reference's use_cache machinery,
# modeling_llada.py:593-600,929-940 — per-block k/v caches with a
# `to_compute_mask` subset recompute)
# ---------------------------------------------------------------------------


def _rope_packed(t: jax.Array, sin: jax.Array, cos: jax.Array,
                 n_heads: int, full_precision: bool) -> jax.Array:
    """Neox rotation on a *packed* ``[B, L, H*hd]`` tensor (per-head lane
    slices) via a transient 4-D view of the single-source ``rope_tensor``."""
    from mmada_parallel_tpu.ops.rope_attention import rope_tensor
    B, L, HD = t.shape
    hd = HD // n_heads
    t4 = t.reshape(B, L, n_heads, hd)
    return rope_tensor(t4, sin, cos, full_precision).reshape(B, L, HD)


def llada_hidden_with_cache(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full forward that also returns the per-layer k/v feature cache
    (``{"k": [n_layers, B, L, KV*hd], "v": ...}`` — PACKED lane layout, so
    partial steps feed it straight to the fused kernel with no retiling)
    for subsequent partial steps."""
    if cfg.block_type != "llama":
        raise NotImplementedError("feature cache supports llama blocks only")
    cdt = cfg.compute_dtype
    B, L = input_ids.shape
    nh, nkv, hd = cfg.n_heads, cfg.effective_n_kv_heads, cfg.head_dim
    x = jnp.take(params["wte"], input_ids, axis=0, mode="clip").astype(cdt)
    sin, cos = _rope_sin_cos(L, cfg.head_dim, cfg.rope_theta)

    def body(carry, lp):
        x = carry
        h = _norm(x, lp["attn_norm"], cfg)
        q = _pmm(h, lp["q_proj"])
        k = _pmm(h, lp["k_proj"])
        v = _pmm(h, lp["v_proj"])
        # the cache stores POST-rope k: rope depends only on the absolute
        # position, so partial steps need to rope only the recomputed
        # positions instead of the whole cache every layer (the reference
        # re-applies rope per use, modeling_llada.py:716-722 — pure cost)
        kr = _rope_packed(k, sin, cos, nkv, cfg.rope_full_precision)
        att = rope_attention_qonly(q, kr, v, sin, cos,
                                   n_heads=nh, n_kv_heads=nkv,
                                   full_precision=cfg.rope_full_precision,
                                   impl=cfg.attention_impl)
        x = x + _pmm(att, lp["attn_out"])
        h = _norm(x, lp["ff_norm"], cfg)
        gate = jax.nn.silu(_pmm(h, lp["ff_proj"]))
        up = _pmm(h, lp["up_proj"])
        x = x + _pmm(gate * up, lp["ff_out"])
        return x, {"k": kr, "v": v}

    x, cache = jax.lax.scan(body, x, params["blocks"])
    x = _norm(x, params["ln_f"], cfg)
    return x, cache


def llada_hidden_partial(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    sel_ids: jax.Array,        # [B, n] token ids at the selected positions
    sel_pos: jax.Array,        # [B, n] absolute positions
    cache: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Partial recompute: run only ``n`` selected tokens through the stack,
    attending to the (updated) full k/v cache.

    Returns ``(hidden_sel [B, n, d], updated cache)``.  RoPE uses the true
    absolute positions of the selected tokens (the reference's ``q_mask``
    path, ``modeling_llada.py:425-435``).
    """
    cdt = cfg.compute_dtype
    B, n = sel_ids.shape
    L = cache["k"].shape[2]
    nh, nkv, hd = cfg.n_heads, cfg.effective_n_kv_heads, cfg.head_dim

    x = jnp.take(params["wte"], sel_ids, axis=0, mode="clip").astype(cdt)
    sin_full, cos_full = _rope_sin_cos(L, cfg.head_dim, cfg.rope_theta)
    sin_sel = jnp.take(sin_full, sel_pos, axis=0)      # [B, n, hd]
    cos_sel = jnp.take(cos_full, sel_pos, axis=0)

    # TPU scatters serialize; express the cache update as one small int
    # scatter ([B, L]) plus per-layer GATHER + select, which vectorize.
    bidx = jnp.arange(B)[:, None]
    inv = jnp.zeros((B, L), jnp.int32).at[bidx, sel_pos].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (B, n)))
    is_sel = jnp.zeros((B, L), bool).at[bidx, sel_pos].set(True)

    def merge(new_compact, cached):
        # new_compact [B, n, KV*hd] packed; gather to [B, L, .] then select
        expanded = jnp.take_along_axis(
            new_compact, inv[:, :, None], axis=1, mode="clip")
        return jnp.where(is_sel[:, :, None], expanded, cached)

    def body(carry, xs):
        x = carry
        lp, layer_cache = xs
        h = _norm(x, lp["attn_norm"], cfg)
        q = _pmm(h, lp["q_proj"])                      # [B, n, H*hd] packed
        k_new = _pmm(h, lp["k_proj"])
        v_new = _pmm(h, lp["v_proj"])
        kr_new = _rope_packed(k_new, sin_sel, cos_sel, nkv,
                              cfg.rope_full_precision)
        k_full = merge(kr_new, layer_cache["k"])
        v_full = merge(v_new, layer_cache["v"])

        # q's rotation fuses into the kernel at the true absolute positions
        att = rope_attention_qonly(q, k_full, v_full, sin_sel, cos_sel,
                                   n_heads=nh, n_kv_heads=nkv,
                                   full_precision=cfg.rope_full_precision,
                                   impl=cfg.attention_impl)
        x = x + _pmm(att, lp["attn_out"])
        h = _norm(x, lp["ff_norm"], cfg)
        gate = jax.nn.silu(_pmm(h, lp["ff_proj"]))
        up = _pmm(h, lp["up_proj"])
        x = x + _pmm(gate * up, lp["ff_out"])
        return x, {"k": k_full, "v": v_full}

    x, new_cache = jax.lax.scan(body, x, (params["blocks"], cache))
    x = _norm(x, params["ln_f"], cfg)
    return x, new_cache


# ---------------------------------------------------------------------------
# Sharding metadata
# ---------------------------------------------------------------------------


def param_shardings(cfg: LLaDAConfig, fsdp_axis: str = "fsdp",
                    tensor_axis: str = "tensor") -> Dict[str, Any]:
    """``PartitionSpec`` pytree mirroring :func:`init_llada_params`.

    Tensor parallelism shards attention heads and MLP hidden dim (the
    classic Megatron split the reference only scaffolds,
    ``finetune.py:54-61``); FSDP shards the remaining large axis.  The
    united vocab head — the memory hot spot at 8B x 134k vocab — is sharded
    over ``tensor`` on the vocab axis so per-shard softmax stays local.
    """
    fs, tp = fsdp_axis, tensor_axis
    if cfg.block_type == "sequential":
        blocks = {
            "attn_norm": P(None, None),
            "ff_norm": P(None, None),
            "att_proj": P(None, fs, tp),
            "attn_out": P(None, tp, fs),
            "ff_proj": P(None, fs, tp),
            "ff_out": P(None, tp, fs),
        }
        if cfg.include_qkv_bias:
            blocks["att_proj_bias"] = P(None, tp)
    else:
        blocks = {
            "attn_norm": P(None, None),
            "ff_norm": P(None, None),
            "q_proj": P(None, fs, tp),
            "k_proj": P(None, fs, tp),
            "v_proj": P(None, fs, tp),
            "attn_out": P(None, tp, fs),
            "ff_proj": P(None, fs, tp),
            "up_proj": P(None, fs, tp),
            "ff_out": P(None, tp, fs),
        }
        if cfg.include_qkv_bias:
            blocks["q_bias"] = P(None, tp)
            blocks["k_bias"] = P(None, tp)
            blocks["v_bias"] = P(None, tp)
    specs = {
        "wte": P(tp, fs),
        "ln_f": P(None),
        "blocks": blocks,
    }
    if not cfg.weight_tying:
        # vocab over BOTH axes, d_model replicated: the head GEMM contracts
        # d_model, so a d-sharded head (P(fs, tp)) makes GSPMD psum the
        # full per-shard logits over fsdp (~700 MB f32 at 8B dims) and
        # all-gather them again in the backward.  P(None, (fs, tp)) keeps
        # the same per-chip weight memory (vocab / (fsdp*tensor)) with NO
        # head collectives: logits stay vocab-sharded, the head gradient
        # lands pre-sharded, and the CE reductions psum only [B, L].
        specs["head"] = P(None, (fs, tp))
    return specs
