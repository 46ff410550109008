"""MagViT-v2 LFQ VQGAN (variant M's image tokenizer), NHWC JAX.

Architecture mirrors ``MMaDA-Parallel-M/models/modeling_magvitv2.py``:

* Encoder (``:48-169``): conv_in(3->128) -> 5 levels ``ch_mult [1,2,2,4,4]``
  with ``num_res_blocks [4,3,4,3,4]`` and a stride-2 downsample between
  levels (stride 16 overall) -> mid (res, attn, res) -> GroupNorm/swish ->
  conv to ``z_channels=13`` -> 1x1 quant_conv.  ``attn_resolutions=[5]``
  never matches a real resolution, so per-level attention is absent — only
  the mid attention exists (preserved faithfully).
* LFQ quantizer (``:172-274``): sign-binarize; ``index = sum 2^(C-1-i) *
  (z_i > 0)`` (MSB-first bit packing); codebook entries are the ±1 bit
  patterns; entropy + commitment losses for training.
* Decoder (``:277-399``): mirror with ``ch_mult [1,1,2,2,4]``, blocks
  ``[4,4,3,4,3]``, post_quant_conv, upsample per level except level 0.

Pixel I/O contract matches the reference training/inference path: inputs in
``[-1, 1]`` NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmada_parallel_tpu.models import vqgan_common as C

__all__ = ["MagvitConfig", "init_magvit_params", "magvit_encode",
           "magvit_get_code", "magvit_decode_code", "lfq_quantize",
           "lfq_codebook_entry"]


@dataclasses.dataclass(frozen=True)
class MagvitConfig:
    ch: int = 128
    enc_ch_mult: Tuple[int, ...] = (1, 2, 2, 4, 4)
    enc_blocks: Tuple[int, ...] = (4, 3, 4, 3, 4)
    dec_ch_mult: Tuple[int, ...] = (1, 1, 2, 2, 4)
    dec_blocks: Tuple[int, ...] = (4, 4, 3, 4, 3)
    z_channels: int = 13
    in_ch: int = 3
    out_ch: int = 3
    groups: int = 32
    eps: float = 1e-6

    @property
    def codebook_size(self) -> int:
        return 2 ** self.z_channels

    @property
    def scale(self) -> int:
        return 2 ** (len(self.enc_ch_mult) - 1)

    @classmethod
    def tiny(cls) -> "MagvitConfig":
        return cls(ch=16, enc_ch_mult=(1, 2), enc_blocks=(1, 1),
                   dec_ch_mult=(1, 2), dec_blocks=(1, 1), z_channels=4,
                   groups=4)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_magvit_params(key: jax.Array, cfg: MagvitConfig = MagvitConfig(),
                       dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 512))
    nk = lambda: next(keys)
    ch = cfg.ch

    # --- encoder ---
    enc: Dict[str, Any] = {"conv_in": C.init_conv(nk(), 3, 3, cfg.in_ch, ch, dtype)}
    in_mult = (1,) + tuple(cfg.enc_ch_mult)
    down = []
    for i, mult in enumerate(cfg.enc_ch_mult):
        cin, cout = ch * in_mult[i], ch * mult
        level: Dict[str, Any] = {"block": []}
        for _ in range(cfg.enc_blocks[i]):
            level["block"].append(C.init_resnet_block(nk(), cin, cout, dtype))
            cin = cout
        if i != len(cfg.enc_ch_mult) - 1:
            level["downsample"] = {"conv": C.init_conv(nk(), 3, 3, cout, cout, dtype)}
        down.append(level)
    block_in = ch * cfg.enc_ch_mult[-1]
    enc.update({
        "down": down,
        "mid": {
            "block_1": C.init_resnet_block(nk(), block_in, block_in, dtype),
            "attn_1": C.init_attn_block(nk(), block_in, dtype),
            "block_2": C.init_resnet_block(nk(), block_in, block_in, dtype),
        },
        "norm_out": C.init_group_norm(block_in, dtype),
        "conv_out": C.init_conv(nk(), 3, 3, block_in, cfg.z_channels, dtype),
        "quant_conv": C.init_conv(nk(), 1, 1, cfg.z_channels, cfg.z_channels, dtype),
    })

    # --- decoder ---
    block_in = ch * cfg.dec_ch_mult[-1]
    dec: Dict[str, Any] = {
        "post_quant_conv": C.init_conv(nk(), 1, 1, cfg.z_channels,
                                       cfg.z_channels, dtype),
        "conv_in": C.init_conv(nk(), 3, 3, cfg.z_channels, block_in, dtype),
        "mid": {
            "block_1": C.init_resnet_block(nk(), block_in, block_in, dtype),
            "attn_1": C.init_attn_block(nk(), block_in, dtype),
            "block_2": C.init_resnet_block(nk(), block_in, block_in, dtype),
        },
    }
    up = [None] * len(cfg.dec_ch_mult)
    cin = block_in
    for i in reversed(range(len(cfg.dec_ch_mult))):
        cout = ch * cfg.dec_ch_mult[i]
        level: Dict[str, Any] = {"block": []}
        for _ in range(cfg.dec_blocks[i]):
            level["block"].append(C.init_resnet_block(nk(), cin, cout, dtype))
            cin = cout
        if i != 0:
            level["upsample"] = {"conv": C.init_conv(nk(), 3, 3, cout, cout, dtype)}
        up[i] = level
    dec.update({
        "up": up,
        "norm_out": C.init_group_norm(cin, dtype),
        "conv_out": C.init_conv(nk(), 3, 3, cin, cfg.out_ch, dtype),
    })

    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# LFQ
# ---------------------------------------------------------------------------


def lfq_quantize(z: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Lookup-free quantization of ``[B, H, W, C]`` latents.

    Returns ``(z_q, indices)`` where ``z_q`` is the ±1 binarization with a
    straight-through gradient and ``indices [B, H*W]`` packs bits MSB-first
    (``modeling_magvitv2.py:199-206,239-244``).
    """
    B, H, W, Cc = z.shape
    ge = (z > 0).astype(z.dtype)
    z_q_hard = 2.0 * ge - 1.0
    z_q = z + jax.lax.stop_gradient(z_q_hard - z)
    powers = jnp.asarray(2 ** np.arange(Cc - 1, -1, -1), jnp.int32)
    indices = jnp.sum((z_q_hard > 0).astype(jnp.int32) * powers, axis=-1)
    return z_q, indices.reshape(B, H * W)


def lfq_losses(z: jax.Array, beta: float = 0.25) -> Dict[str, jax.Array]:
    """Entropy + commitment losses (``modeling_magvitv2.py:246-263``)."""
    zf = z.astype(jnp.float32).reshape(-1, z.shape[-1])
    hard = jnp.where(zf > 0, 1.0, -1.0)
    z_q = zf + jax.lax.stop_gradient(hard - zf)  # straight-through
    logit = jnp.stack([-(zf - 1.0) ** 2, -(zf + 1.0) ** 2], axis=-1)
    logp = jax.nn.log_softmax(logit, axis=-1)
    p = jnp.exp(logp)
    entropy = (-(p * logp).sum(-1)).mean()
    mean_p = p.mean(axis=0)
    mean_entropy = (-(mean_p * jnp.log(mean_p + 1e-10)).sum(-1)).mean()
    commit = (jnp.mean((jax.lax.stop_gradient(z_q) - zf) ** 2)
              + beta * jnp.mean((z_q - jax.lax.stop_gradient(zf)) ** 2))
    return {"entropy_loss": entropy - mean_entropy, "commit_loss": commit}


def lfq_codebook_entry(indices: jax.Array, z_channels: int,
                       shape: Optional[Tuple[int, int]] = None) -> jax.Array:
    """Indices ``[B, N]`` -> ±1 latents ``[B, h, w, C]``
    (``modeling_magvitv2.py:206-219``).  ``shape=(h, w)`` overrides the
    default square grid ``h = w = sqrt(N)`` for non-square images."""
    B, N = indices.shape
    if shape is None:
        h = w = int(round(N ** 0.5))
    else:
        h, w = shape
    if h * w != N:
        raise ValueError(f"grid {h}x{w} != {N} codes")
    powers = jnp.asarray(2 ** np.arange(z_channels - 1, -1, -1), jnp.int32)
    bits = (indices[..., None] // powers) % 2
    z_q = bits.astype(jnp.float32) * 2.0 - 1.0
    return z_q.reshape(B, h, w, z_channels)


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------


def _encoder(p: Dict[str, Any], cfg: MagvitConfig, x: jax.Array) -> jax.Array:
    g, e = cfg.groups, cfg.eps
    h = C.conv2d(p["conv_in"], x)
    for i, level in enumerate(p["down"]):
        for bp in level["block"]:
            h = C.resnet_block(bp, h, g, e)
        if "downsample" in level:
            h = C.downsample(level["downsample"], h)
    h = C.resnet_block(p["mid"]["block_1"], h, g, e)
    h = C.attn_block(p["mid"]["attn_1"], h, g, e)
    h = C.resnet_block(p["mid"]["block_2"], h, g, e)
    h = C.swish(C.group_norm(p["norm_out"], h, g, e))
    h = C.conv2d(p["conv_out"], h)
    return C.conv2d(p["quant_conv"], h)


def _decoder(p: Dict[str, Any], cfg: MagvitConfig, z_q: jax.Array) -> jax.Array:
    g, e = cfg.groups, cfg.eps
    h = C.conv2d(p["post_quant_conv"], z_q)
    h = C.conv2d(p["conv_in"], h)
    h = C.resnet_block(p["mid"]["block_1"], h, g, e)
    h = C.attn_block(p["mid"]["attn_1"], h, g, e)
    h = C.resnet_block(p["mid"]["block_2"], h, g, e)
    for i in reversed(range(len(p["up"]))):
        level = p["up"][i]
        for bp in level["block"]:
            h = C.resnet_block(bp, h, g, e)
        if "upsample" in level:
            h = C.upsample(level["upsample"], h)
    h = C.swish(C.group_norm(p["norm_out"], h, g, e))
    return C.conv2d(p["conv_out"], h)


def magvit_encode(params: Dict[str, Any], cfg: MagvitConfig,
                  pixels: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """``[B, H, W, 3]`` pixels in [-1, 1] -> ``(z_q, indices [B, h*w])``."""
    z = _encoder(params["encoder"], cfg, pixels)
    return lfq_quantize(z)


def magvit_get_code(params: Dict[str, Any], cfg: MagvitConfig,
                    pixels: jax.Array) -> jax.Array:
    """``MAGVITv2.get_code`` equivalent (``modeling_magvitv2.py:423-428``)."""
    return magvit_encode(params, cfg, pixels)[1]


def magvit_decode_code(params: Dict[str, Any], cfg: MagvitConfig,
                       indices: jax.Array,
                       shape: Optional[Tuple[int, int]] = None) -> jax.Array:
    """Indices ``[B, N]`` -> pixels ``[B, H, W, 3]``
    (``modeling_magvitv2.py:430-433``)."""
    z_q = lfq_codebook_entry(indices, cfg.z_channels, shape)
    return _decoder(params["decoder"], cfg, z_q)
