"""W8A8 int8 quantized inference path (opt-in).

The v5e MXU runs int8 at 2x bf16 throughput (394 TOPS vs 197 TFLOP/s);
measured on-chip: a [2424,4096]x[4096,12288] GEMM sustains 366 TOP/s int8
vs 178 TFLOP/s bf16, and 331 effective with on-the-fly activation
quantization + rescale fused around it (see README "Performance analysis").

Scheme: symmetric per-output-channel int8 weights (static, quantized once
at load) x symmetric per-token dynamic int8 activations — the standard
W8A8 recipe (LLM.int8()/SmoothQuant family) without outlier splitting;
the diffusion sampler's logits consumers (argmax, top-k, softmax
confidence) are rank-based and tolerate ~1% relative logit error.

This is an APPROXIMATION like the cached sampler: the exact bf16 path
stays the parity default; quantized params are opt-in via
:func:`quantize_llada_params`.  The reference has no quantized path — this
is a TPU-native extension.

A quantized weight is a dict leaf ``{"w_q": int8 [..., K, N],
"scale": f32 [..., 1, N]}``; the model's matmul helper dispatches on the
leaf type, so stacked-layer scan, the cached forwards, and the head all
work unchanged.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["quantize_weight", "int8_matmul", "quantize_llada_params",
           "quantize_param_shardings", "is_quantized"]

_GEMM_KEYS = frozenset({"q_proj", "k_proj", "v_proj", "attn_out",
                        "ff_proj", "up_proj", "ff_out", "att_proj"})


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "w_q" in w


def quantize_weight(w: jax.Array) -> Dict[str, jax.Array]:
    """``[..., K, N] float -> {"w_q" int8, "scale" f32 [..., 1, N]}``
    (symmetric per-output-channel)."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    w_q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {"w_q": w_q, "scale": scale}


def int8_matmul(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
                out_dtype=None) -> jax.Array:
    """``[..., M, K] x int8 [K, N] -> [..., M, N]`` on the int8 MXU.

    Per-token (last-axis) dynamic symmetric activation quantization; the
    int32 accumulator is rescaled by ``act_scale * w_scale`` in f32.
    """
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                    1e-8) / 127.0
    x_q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s * w_scale.reshape(
        (1,) * (acc.ndim - 1) + (-1,))).astype(out_dtype)


def quantize_llada_params(params: Dict[str, Any],
                          quantize_head: bool = True) -> Dict[str, Any]:
    """Quantize the block GEMMs and (optionally) the united head;
    embeddings, norms and biases stay in the original dtype
    (gathers/elementwise gain nothing from int8 and the embedding feeds
    fp32-stat norms).

    ``quantize_head=False`` keeps the vocab head dense — the samplers'
    argmax/top-k/confidence decisions consume head logits directly.
    Measured on the random-weight worst-case toy (6 seeds, temp-0 TI2TI,
    32 text / 8 image steps): image-code trajectory agreement vs dense
    rises from 0.58 to 0.72 mean (0.33 -> 0.50 min); text agreement is
    backbone-noise-dominated and unchanged (~0.56).  Cost: one dense GEMM
    back out of the ~7-per-layer int8 stack."""
    blocks = {k: (quantize_weight(v) if k in _GEMM_KEYS else v)
              for k, v in params["blocks"].items()}
    out = dict(params, blocks=blocks)
    if "head" in params and quantize_head:
        out["head"] = quantize_weight(params["head"])
    return out


def quantize_param_shardings(specs: Dict[str, Any],
                             quantize_head: bool = True) -> Dict[str, Any]:
    """Transform a dense PartitionSpec pytree to match quantized params:
    ``w_q`` keeps the dense spec; ``scale [..., 1, N]`` drops the K axis."""
    from jax.sharding import PartitionSpec as P

    def scale_spec(s: P) -> P:
        parts = tuple(s)
        if len(parts) < 2:
            return s
        return P(*(parts[:-2] + (None,) + parts[-1:]))

    def conv(path_key, s):
        return {"w_q": s, "scale": scale_spec(s)}

    blocks = {k: (conv(k, v) if k in _GEMM_KEYS else v)
              for k, v in specs["blocks"].items()}
    out = dict(specs, blocks=blocks)
    if "head" in specs and quantize_head:
        out["head"] = conv("head", specs["head"])
    return out
