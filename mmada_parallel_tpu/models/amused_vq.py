"""Amused-VQ image tokenizer (variant A) — a diffusers ``VQModel`` in NHWC JAX.

The reference consumes this model purely through diffusers
(``MMaDA-Parallel-A/utils/image_utils.py:9,159-173``; vq checkpoint
``vqvae`` subfolder of the released weights):

* ``vqvae.encode(x).latents`` — conv encoder + 1x1 ``quant_conv``
  (pre-quantization latents, vq_embed_dim channels);
* ``vqvae.quantize(latents)[2][2]`` — nearest-codebook-entry indices;
* ``vqvae.decode(codes, force_not_quantize=True, shape=...)`` — codebook
  lookup -> ``post_quant_conv`` -> conv decoder.

The architecture below is the diffusers ``VQModel`` graph
(DownEncoderBlock2D / UpDecoderBlock2D with taming-style resnet blocks —
identical math to :mod:`mmada_parallel_tpu.models.vqgan_common`; the
decoder runs ``layers_per_block + 1`` resnets per level, the encoder
``layers_per_block``).  Defaults are the released Amused-VQ config
(block_out_channels [128, 256, 256, 512, 768] -> stride 16, latent dim 64,
codebook 8192).  Pixel I/O: diffusers ``VaeImageProcessor(do_normalize=
False)`` feeds [0, 1] images, so inputs/outputs here are [0, 1] NHWC
(``image_utils.py:60-66`` clamps decode output to [0, 1]).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mmada_parallel_tpu.models import vqgan_common as C

__all__ = ["AmusedVQConfig", "init_amused_vq_params", "amused_encode",
           "amused_quantize", "amused_decode_code"]


@dataclasses.dataclass(frozen=True)
class AmusedVQConfig:
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512, 768)
    layers_per_block: int = 2
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 64
    vq_embed_dim: Optional[int] = None     # None -> latent_channels
    num_vq_embeddings: int = 8192
    norm_num_groups: int = 32
    mid_attention: bool = True
    eps: float = 1e-6

    @property
    def embed_dim(self) -> int:
        return self.vq_embed_dim if self.vq_embed_dim is not None else self.latent_channels

    @property
    def scale(self) -> int:
        return 2 ** (len(self.block_out_channels) - 1)

    @classmethod
    def tiny(cls) -> "AmusedVQConfig":
        return cls(block_out_channels=(8, 16), layers_per_block=1,
                   latent_channels=8, num_vq_embeddings=32, norm_num_groups=4)


def init_amused_vq_params(key: jax.Array,
                          cfg: AmusedVQConfig = AmusedVQConfig(),
                          dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    nk = lambda: next(keys)
    chans = cfg.block_out_channels

    # --- encoder: conv_in -> down blocks -> mid -> norm/act/conv_out ---
    enc: Dict[str, Any] = {"conv_in": C.init_conv(nk(), 3, 3, cfg.in_channels,
                                                  chans[0], dtype)}
    down = []
    cin = chans[0]
    for i, cout in enumerate(chans):
        level: Dict[str, Any] = {"block": []}
        for _ in range(cfg.layers_per_block):
            level["block"].append(C.init_resnet_block(nk(), cin, cout, dtype))
            cin = cout
        if i != len(chans) - 1:
            level["downsample"] = {"conv": C.init_conv(nk(), 3, 3, cout, cout,
                                                       dtype)}
        down.append(level)
    enc.update({
        "down": down,
        "mid": _init_mid(nk, chans[-1], cfg, dtype),
        "norm_out": C.init_group_norm(chans[-1], dtype),
        "conv_out": C.init_conv(nk(), 3, 3, chans[-1], cfg.latent_channels,
                                dtype),
    })

    # --- quantizer ---
    ed = cfg.embed_dim
    quant = {
        "quant_conv": C.init_conv(nk(), 1, 1, cfg.latent_channels, ed, dtype),
        # diffusers VectorQuantizer: nn.Embedding uniform(-1/n, 1/n)
        "embedding": jax.random.uniform(
            nk(), (cfg.num_vq_embeddings, ed), dtype,
            -1.0 / cfg.num_vq_embeddings, 1.0 / cfg.num_vq_embeddings),
        "post_quant_conv": C.init_conv(nk(), 1, 1, ed, cfg.latent_channels,
                                       dtype),
    }

    # --- decoder: conv_in -> mid -> up blocks -> norm/act/conv_out ---
    dec: Dict[str, Any] = {
        "conv_in": C.init_conv(nk(), 3, 3, cfg.latent_channels, chans[-1],
                               dtype),
        "mid": _init_mid(nk, chans[-1], cfg, dtype),
    }
    up = [None] * len(chans)
    cin = chans[-1]
    for i in reversed(range(len(chans))):
        cout = chans[i]
        level: Dict[str, Any] = {"block": []}
        for _ in range(cfg.layers_per_block + 1):
            level["block"].append(C.init_resnet_block(nk(), cin, cout, dtype))
            cin = cout
        if i != 0:
            level["upsample"] = {"conv": C.init_conv(nk(), 3, 3, cout, cout,
                                                     dtype)}
        up[i] = level
    dec.update({
        "up": up,
        "norm_out": C.init_group_norm(chans[0], dtype),
        "conv_out": C.init_conv(nk(), 3, 3, chans[0], cfg.out_channels, dtype),
    })

    return {"encoder": enc, "quant": quant, "decoder": dec}


def _init_mid(nk, c: int, cfg: AmusedVQConfig, dtype):
    mid = {
        "block_1": C.init_resnet_block(nk(), c, c, dtype),
        "block_2": C.init_resnet_block(nk(), c, c, dtype),
    }
    if cfg.mid_attention:
        mid["attn_1"] = C.init_attn_block(nk(), c, dtype)
    return mid


def _mid(p: Dict[str, Any], x: jax.Array, g: int, e: float) -> jax.Array:
    x = C.resnet_block(p["block_1"], x, g, e)
    if "attn_1" in p:
        x = C.attn_block(p["attn_1"], x, g, e)
    return C.resnet_block(p["block_2"], x, g, e)


def amused_encode(params: Dict[str, Any], cfg: AmusedVQConfig,
                  pixels: jax.Array) -> jax.Array:
    """``[B, H, W, 3]`` in [0, 1] -> pre-quantization latents
    ``[B, h, w, embed_dim]`` (diffusers ``VQModel.encode().latents`` incl.
    ``quant_conv``)."""
    g, e = cfg.norm_num_groups, cfg.eps
    p = params["encoder"]
    h = C.conv2d(p["conv_in"], pixels)
    for level in p["down"]:
        for bp in level["block"]:
            h = C.resnet_block(bp, h, g, e)
        if "downsample" in level:
            h = C.downsample(level["downsample"], h)
    h = _mid(p["mid"], h, g, e)
    h = C.swish(C.group_norm(p["norm_out"], h, g, e))
    h = C.conv2d(p["conv_out"], h)
    return C.conv2d(params["quant"]["quant_conv"], h)


def amused_quantize(params: Dict[str, Any], cfg: AmusedVQConfig,
                    latents: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Nearest-codebook quantization: ``(z_q, indices [B, h*w])``.

    Matches diffusers ``VectorQuantizer.forward`` (argmin of squared
    distance; the reference consumes ``[2][2]`` = indices,
    ``image_utils.py:167``)."""
    B, H, W, D = latents.shape
    # jnp.asarray (not .astype): params straight off safetensors are host
    # numpy arrays, and numpy fancy-indexing with a traced idx fails
    emb = jnp.asarray(params["quant"]["embedding"], jnp.float32)  # [N, D]
    z = latents.astype(jnp.float32).reshape(-1, D)
    d = (jnp.sum(z * z, axis=1, keepdims=True)
         - 2.0 * z @ emb.T
         + jnp.sum(emb * emb, axis=1)[None, :])
    idx = jnp.argmin(d, axis=1)
    z_q = emb[idx].reshape(B, H, W, D).astype(latents.dtype)
    # straight-through for training use
    z_q = latents + jax.lax.stop_gradient(z_q - latents)
    return z_q, idx.reshape(B, H * W)


def amused_decode_code(params: Dict[str, Any], cfg: AmusedVQConfig,
                       indices: jax.Array,
                       grid_hw: Tuple[int, int]) -> jax.Array:
    """Codes ``[B, N]`` -> pixels ``[B, H, W, 3]`` in [0, 1].

    Equivalent of ``vqvae.decode(codes, force_not_quantize=True, shape=...)``
    + the reference's ``.clip(0, 1)`` (``image_utils.py:60-66``)."""
    h, w = grid_hw
    B = indices.shape[0]
    emb = params["quant"]["embedding"]
    z_q = jnp.take(emb, indices.reshape(-1), axis=0).reshape(B, h, w, -1)
    g, e = cfg.norm_num_groups, cfg.eps
    x = C.conv2d(params["quant"]["post_quant_conv"], z_q)
    p = params["decoder"]
    x = C.conv2d(p["conv_in"], x)
    x = _mid(p["mid"], x, g, e)
    for i in reversed(range(len(p["up"]))):
        level = p["up"][i]
        for bp in level["block"]:
            x = C.resnet_block(bp, x, g, e)
        if "upsample" in level:
            x = C.upsample(level["upsample"], x)
    x = C.swish(C.group_norm(p["norm_out"], x, g, e))
    x = C.conv2d(p["conv_out"], x)
    return jnp.clip(x, 0.0, 1.0)


def amused_img_span(encode_fn, cfg: AmusedVQConfig, img, tokens,
                    with_codes: bool = False):
    """PIL image -> ``[boi] offset-grid-with-newlines [eoi]`` token span
    (the A prompt image format, ``inference.py:150-158``).  ``encode_fn``
    is a (jitted) ``[1,H,W,3] -> [1, h*w]`` code encoder — shared by
    ``TI2TIPipeline.encode_img_with_breaks``, the serve CLI and the eval
    sweep.  ``with_codes=True`` also returns the raw (un-offset) codes."""
    import numpy as np
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.utils.image import image_to_array

    codes = np.asarray(encode_fn(image_to_array(img, "zero_one")))[0]
    h = img.size[1] // cfg.scale
    w = img.size[0] // cfg.scale
    grid = [int(c) + tokens.vq_offset for c in codes]
    span = [tokens.boi] + tk.add_break_line(grid, h, w, tokens.newline) \
        + [tokens.eoi]
    return (span, codes) if with_codes else span
