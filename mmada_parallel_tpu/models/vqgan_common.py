"""Shared VQGAN conv building blocks, NHWC/TPU-native.

JAX re-design of the taming-transformers conv modules vendored by the
reference (``MMaDA-Parallel-M/models/common_modules.py:16-357``) and the
equivalent diffusers blocks used by Amused-VQ.  Data layout is NHWC (the
TPU-preferred conv layout; the reference is NCHW torch), weights are HWIO.

All ops are pure functions over nested param dicts whose key structure
mirrors the torch module names 1:1, so checkpoint conversion is a name map
plus a transpose.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "conv2d", "group_norm", "swish", "resnet_block", "attn_block",
    "downsample", "upsample", "init_conv", "init_group_norm",
    "init_resnet_block", "init_attn_block",
]


def swish(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def conv2d(p: Dict[str, jax.Array], x: jax.Array, stride: int = 1,
           padding: Any = "SAME") -> jax.Array:
    """NHWC conv with HWIO weights. ``padding`` may be "SAME"/"VALID" or an
    explicit ``[(top, bottom), (left, right)]``."""
    out = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + p["b"].astype(x.dtype)


def group_norm(p: Dict[str, jax.Array], x: jax.Array, groups: int = 32,
               eps: float = 1e-6) -> jax.Array:
    """GroupNorm over NHWC (stats in fp32, matching torch GroupNorm)."""
    B, H, W, C = x.shape
    og = x.dtype
    xf = x.astype(jnp.float32).reshape(B, H, W, groups, C // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(B, H, W, C)
    return (xf * p["scale"].astype(jnp.float32)
            + p["bias"].astype(jnp.float32)).astype(og)


def resnet_block(p: Dict[str, Any], x: jax.Array, groups: int = 32,
                 eps: float = 1e-6) -> jax.Array:
    """taming/diffusers ResnetBlock (``common_modules.py:298-357``):
    ``x + conv2(swish(norm2(conv1(swish(norm1(x))))))`` with a 1x1
    nin_shortcut when channels change."""
    h = swish(group_norm(p["norm1"], x, groups, eps))
    h = conv2d(p["conv1"], h)
    h = swish(group_norm(p["norm2"], h, groups, eps))
    h = conv2d(p["conv2"], h)
    if "nin_shortcut" in p:
        x = conv2d(p["nin_shortcut"], x)
    return x + h


def attn_block(p: Dict[str, Any], x: jax.Array, groups: int = 32,
               eps: float = 1e-6) -> jax.Array:
    """Single-head conv attention (``common_modules.py:168-212``)."""
    B, H, W, C = x.shape
    h = group_norm(p["norm"], x, groups, eps)
    q = conv2d(p["q"], h).reshape(B, H * W, C)
    k = conv2d(p["k"], h).reshape(B, H * W, C)
    v = conv2d(p["v"], h).reshape(B, H * W, C)
    scores = jnp.einsum("bic,bjc->bij", q, k,
                        preferred_element_type=jnp.float32) * (C ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
    out = jnp.einsum("bij,bjc->bic", probs, v).reshape(B, H, W, C)
    return x + conv2d(p["proj_out"], out)


def downsample(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    """Asymmetric-pad stride-2 conv (``common_modules.py:73-90``):
    torch pads ``(0,1,0,1)`` = (left 0, right 1, top 0, bottom 1)."""
    return conv2d(p["conv"], x, stride=2, padding=[(0, 1), (0, 1)])


def upsample(p: Dict[str, Any], x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x + conv3x3 (``common_modules.py:27-39``)."""
    B, H, W, C = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return conv2d(p["conv"], x)


# ---------------------------------------------------------------------------
# Initializers (torch-default inits: kaiming-uniform conv, ones/zeros norm)
# ---------------------------------------------------------------------------


def init_conv(key, kh: int, kw: int, cin: int, cout: int,
              dtype=jnp.float32) -> Dict[str, jax.Array]:
    # torch Conv2d default: kaiming_uniform(a=sqrt(5)) -> U(+-sqrt(1/fan_in))
    fan_in = kh * kw * cin
    bound = float(np.sqrt(1.0 / fan_in))
    k1, k2 = jax.random.split(key)
    return {
        "w": jax.random.uniform(k1, (kh, kw, cin, cout), dtype, -bound, bound),
        "b": jax.random.uniform(k2, (cout,), dtype, -bound, bound),
    }


def init_group_norm(c: int, dtype=jnp.float32) -> Dict[str, jax.Array]:
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def init_resnet_block(key, cin: int, cout: int, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": init_group_norm(cin, dtype),
        "conv1": init_conv(ks[0], 3, 3, cin, cout, dtype),
        "norm2": init_group_norm(cout, dtype),
        "conv2": init_conv(ks[1], 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["nin_shortcut"] = init_conv(ks[2], 1, 1, cin, cout, dtype)
    return p


def init_attn_block(key, c: int, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "norm": init_group_norm(c, dtype),
        "q": init_conv(ks[0], 1, 1, c, c, dtype),
        "k": init_conv(ks[1], 1, 1, c, c, dtype),
        "v": init_conv(ks[2], 1, 1, c, c, dtype),
        "proj_out": init_conv(ks[3], 1, 1, c, c, dtype),
    }
