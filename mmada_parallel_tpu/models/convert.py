"""Checkpoint conversion: HF/torch safetensors -> mmada_parallel_tpu pytrees.

Loads the released checkpoints (``tyfeld/MMaDA-Parallel-A``/``-M`` for the
LLaDA backbone, the ``vqvae`` subfolder for Amused-VQ, ``showlab/magvitv2``
for MagViT-v2) without torch: safetensors are read directly to numpy and
remapped by name.

Weight-name contracts:

* LLaDA (``model/modeling_llada.py:1096-1131``): ``model.transformer.wte``,
  ``model.transformer.blocks.{i}.{attn_norm,ff_norm,q_proj,k_proj,v_proj,
  attn_out,ff_proj,up_proj,ff_out}``, ``model.transformer.ln_f``,
  ``model.transformer.ff_out`` (united vocab head).  Torch ``Linear`` stores
  ``[out, in]`` -> transposed; per-layer tensors stack on a leading layer
  axis.
* MagViT-v2 (``models/modeling_magvitv2.py``): taming-style names under
  ``encoder.``/``decoder.``; conv weights OIHW -> HWIO.
* Amused-VQ (diffusers ``VQModel``): ``encoder.down_blocks.{i}.resnets.{j}``
  etc.; diffusers ``up_blocks`` are listed deepest-first and are re-indexed
  to this package's shallow-first levels; mid-block attention projections
  are ``Linear`` over channels -> folded into 1x1 convs.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional

import numpy as np

from mmada_parallel_tpu.models.amused_vq import AmusedVQConfig
from mmada_parallel_tpu.models.llada import LLaDAConfig
from mmada_parallel_tpu.models.magvit2 import MagvitConfig

__all__ = [
    "load_safetensors_dir",
    "llada_params_from_torch",
    "llada_config_from_hf",
    "magvit_params_from_torch",
    "amused_params_from_torch",
]


def load_safetensors_dir(path: str) -> Dict[str, np.ndarray]:
    """Load all ``*.safetensors`` in a checkpoint dir (sharded or single)."""
    from safetensors import safe_open
    tensors: Dict[str, np.ndarray] = {}
    files = sorted(f for f in os.listdir(path) if f.endswith(".safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors files under {path}")
    for f in files:
        with safe_open(os.path.join(path, f), framework="numpy") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)
    return tensors


def _t(w: np.ndarray) -> np.ndarray:
    """torch Linear [out, in] -> [in, out]."""
    return np.ascontiguousarray(w.T)


def _conv(w: np.ndarray) -> np.ndarray:
    """torch conv OIHW -> HWIO."""
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


# ---------------------------------------------------------------------------
# LLaDA
# ---------------------------------------------------------------------------


def llada_config_from_hf(config_json: Dict[str, Any], **overrides) -> LLaDAConfig:
    """Build :class:`LLaDAConfig` from an HF ``config.json`` dict
    (field names as in ``configuration_llada.py:130-384``)."""
    c = config_json
    kw = dict(
        d_model=c["d_model"],
        n_heads=c["n_heads"],
        n_kv_heads=c.get("n_kv_heads"),
        n_layers=c["n_layers"],
        mlp_hidden_size=c.get("mlp_hidden_size"),
        mlp_ratio=c.get("mlp_ratio", 4),
        vocab_size=c["vocab_size"],
        embedding_size=c.get("embedding_size"),
        max_sequence_length=c.get("max_sequence_length", 4096),
        rope_theta=c.get("rope_theta", 10000.0),
        rope_full_precision=c.get("rope_full_precision", True),
        rms_norm_eps=c.get("rms_norm_eps", 1e-5),
        layer_norm_type=c.get("layer_norm_type", "rms"),
        include_bias=c.get("include_bias", False),
        include_qkv_bias=c.get("include_qkv_bias", False),
        block_type=c.get("block_type", "llama"),
        activation_type=c.get("activation_type", "silu"),
        weight_tying=c.get("weight_tying", False),
        input_emb_norm=c.get("input_emb_norm", False),
        scale_logits=c.get("scale_logits", False),
        mask_token_id=c.get("mask_token_id", 126336),
        eos_token_id=c.get("eos_token_id", 126081),
        pad_token_id=c.get("pad_token_id", 126081),
    )
    kw.update(overrides)
    return LLaDAConfig(**kw)


def llada_params_from_torch(tensors: Dict[str, np.ndarray],
                            cfg: LLaDAConfig,
                            dtype=np.float32) -> Dict[str, Any]:
    """Map an HF LLaDA state dict to the stacked-layer param pytree."""
    def get(name):
        for prefix in ("model.transformer.", "transformer."):
            k = prefix + name
            if k in tensors:
                return tensors[k].astype(dtype)
        raise KeyError(f"missing checkpoint tensor: *transformer.{name} "
                       f"(have {len(tensors)} keys)")

    L = cfg.n_layers

    def stack(sub: str, f: Callable[[np.ndarray], np.ndarray]):
        return np.stack([f(get(f"blocks.{i}.{sub}")) for i in range(L)])

    if cfg.block_type == "sequential":
        blocks = {
            "attn_norm": stack("attn_norm.weight", lambda w: w),
            "ff_norm": stack("ff_norm.weight", lambda w: w),
            "att_proj": stack("att_proj.weight", _t),
            "attn_out": stack("attn_out.weight", _t),
            "ff_proj": stack("ff_proj.weight", _t),
            "ff_out": stack("ff_out.weight", _t),
        }
        if cfg.include_qkv_bias:
            blocks["att_proj_bias"] = stack("att_proj.bias", lambda w: w)
    else:
        blocks = {
            "attn_norm": stack("attn_norm.weight", lambda w: w),
            "ff_norm": stack("ff_norm.weight", lambda w: w),
            "q_proj": stack("q_proj.weight", _t),
            "k_proj": stack("k_proj.weight", _t),
            "v_proj": stack("v_proj.weight", _t),
            "attn_out": stack("attn_out.weight", _t),
            "ff_proj": stack("ff_proj.weight", _t),
            "up_proj": stack("up_proj.weight", _t),
            "ff_out": stack("ff_out.weight", _t),
        }
        if cfg.include_qkv_bias:
            blocks["q_bias"] = stack("q_proj.bias", lambda w: w)
            blocks["k_bias"] = stack("k_proj.bias", lambda w: w)
            blocks["v_bias"] = stack("v_proj.bias", lambda w: w)

    params: Dict[str, Any] = {
        "wte": get("wte.weight"),
        "ln_f": get("ln_f.weight"),
        "blocks": blocks,
    }
    if not cfg.weight_tying:
        params["head"] = _t(get("ff_out.weight"))
    return params


# ---------------------------------------------------------------------------
# MagViT-v2
# ---------------------------------------------------------------------------


def _norm_p(tensors, base, dtype):
    return {"scale": tensors[base + ".weight"].astype(dtype),
            "bias": tensors[base + ".bias"].astype(dtype)}


def _conv_p(tensors, base, dtype):
    return {"w": _conv(tensors[base + ".weight"]).astype(dtype),
            "b": tensors[base + ".bias"].astype(dtype)}


def _resnet_p(tensors, base, dtype, shortcut_name="nin_shortcut"):
    p = {
        "norm1": _norm_p(tensors, base + ".norm1", dtype),
        "conv1": _conv_p(tensors, base + ".conv1", dtype),
        "norm2": _norm_p(tensors, base + ".norm2", dtype),
        "conv2": _conv_p(tensors, base + ".conv2", dtype),
    }
    if base + f".{shortcut_name}.weight" in tensors:
        p["nin_shortcut"] = _conv_p(tensors, base + f".{shortcut_name}", dtype)
    return p


def _attn_p(tensors, base, dtype):
    return {
        "norm": _norm_p(tensors, base + ".norm", dtype),
        "q": _conv_p(tensors, base + ".q", dtype),
        "k": _conv_p(tensors, base + ".k", dtype),
        "v": _conv_p(tensors, base + ".v", dtype),
        "proj_out": _conv_p(tensors, base + ".proj_out", dtype),
    }


def magvit_params_from_torch(tensors: Dict[str, np.ndarray],
                             cfg: MagvitConfig = MagvitConfig(),
                             dtype=np.float32) -> Dict[str, Any]:
    """Map the MAGVITv2 state dict (``modeling_magvitv2.py``) to params."""
    enc: Dict[str, Any] = {"conv_in": _conv_p(tensors, "encoder.conv_in", dtype)}
    down = []
    for i in range(len(cfg.enc_ch_mult)):
        level: Dict[str, Any] = {"block": [
            _resnet_p(tensors, f"encoder.down.{i}.block.{j}", dtype)
            for j in range(cfg.enc_blocks[i])]}
        if f"encoder.down.{i}.downsample.conv.weight" in tensors:
            level["downsample"] = {
                "conv": _conv_p(tensors, f"encoder.down.{i}.downsample.conv", dtype)}
        down.append(level)
    enc.update({
        "down": down,
        "mid": {
            "block_1": _resnet_p(tensors, "encoder.mid.block_1", dtype),
            "attn_1": _attn_p(tensors, "encoder.mid.attn_1", dtype),
            "block_2": _resnet_p(tensors, "encoder.mid.block_2", dtype),
        },
        "norm_out": _norm_p(tensors, "encoder.norm_out", dtype),
        "conv_out": _conv_p(tensors, "encoder.conv_out", dtype),
        "quant_conv": _conv_p(tensors, "encoder.quant_conv", dtype),
    })

    dec: Dict[str, Any] = {
        "post_quant_conv": _conv_p(tensors, "decoder.post_quant_conv", dtype),
        "conv_in": _conv_p(tensors, "decoder.conv_in", dtype),
        "mid": {
            "block_1": _resnet_p(tensors, "decoder.mid.block_1", dtype),
            "attn_1": _attn_p(tensors, "decoder.mid.attn_1", dtype),
            "block_2": _resnet_p(tensors, "decoder.mid.block_2", dtype),
        },
    }
    up = []
    for i in range(len(cfg.dec_ch_mult)):
        level: Dict[str, Any] = {"block": [
            _resnet_p(tensors, f"decoder.up.{i}.block.{j}", dtype)
            for j in range(cfg.dec_blocks[i])]}
        if f"decoder.up.{i}.upsample.conv.weight" in tensors:
            level["upsample"] = {
                "conv": _conv_p(tensors, f"decoder.up.{i}.upsample.conv", dtype)}
        up.append(level)
    dec.update({
        "up": up,
        "norm_out": _norm_p(tensors, "decoder.norm_out", dtype),
        "conv_out": _conv_p(tensors, "decoder.conv_out", dtype),
    })
    return {"encoder": enc, "decoder": dec}


# ---------------------------------------------------------------------------
# Amused-VQ (diffusers VQModel)
# ---------------------------------------------------------------------------


def _diffusers_resnet_p(tensors, base, dtype):
    return _resnet_p(tensors, base, dtype, shortcut_name="conv_shortcut")


def _diffusers_attn_p(tensors, base, dtype):
    """diffusers ``Attention``: group_norm + Linear to_q/to_k/to_v/to_out.0
    -> folded into 1x1 convs."""
    def lin_as_conv(name):
        w = tensors[f"{base}.{name}.weight"].astype(dtype)   # [out, in]
        b = tensors[f"{base}.{name}.bias"].astype(dtype)
        return {"w": w.T[None, None], "b": b}
    return {
        "norm": _norm_p(tensors, base + ".group_norm", dtype),
        "q": lin_as_conv("to_q"),
        "k": lin_as_conv("to_k"),
        "v": lin_as_conv("to_v"),
        "proj_out": lin_as_conv("to_out.0"),
    }


def amused_config_from_hf(config_json: Dict[str, Any]) -> AmusedVQConfig:
    c = config_json
    return AmusedVQConfig(
        block_out_channels=tuple(c["block_out_channels"]),
        layers_per_block=c.get("layers_per_block", 2),
        in_channels=c.get("in_channels", 3),
        out_channels=c.get("out_channels", 3),
        latent_channels=c.get("latent_channels", 64),
        vq_embed_dim=c.get("vq_embed_dim"),
        num_vq_embeddings=c.get("num_vq_embeddings", 8192),
        norm_num_groups=c.get("norm_num_groups", 32),
        mid_attention=c.get("mid_block_add_attention", True),
    )


def amused_params_from_torch(tensors: Dict[str, np.ndarray],
                             cfg: AmusedVQConfig = AmusedVQConfig(),
                             dtype=np.float32) -> Dict[str, Any]:
    """Map a diffusers ``VQModel`` state dict to params."""
    nlev = len(cfg.block_out_channels)

    def mid(base):
        m = {
            "block_1": _diffusers_resnet_p(tensors, f"{base}.resnets.0", dtype),
            "block_2": _diffusers_resnet_p(tensors, f"{base}.resnets.1", dtype),
        }
        if f"{base}.attentions.0.group_norm.weight" in tensors:
            m["attn_1"] = _diffusers_attn_p(tensors, f"{base}.attentions.0", dtype)
        return m

    enc: Dict[str, Any] = {
        "conv_in": _conv_p(tensors, "encoder.conv_in", dtype)}
    down = []
    for i in range(nlev):
        level: Dict[str, Any] = {"block": [
            _diffusers_resnet_p(tensors, f"encoder.down_blocks.{i}.resnets.{j}", dtype)
            for j in range(cfg.layers_per_block)]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in tensors:
            level["downsample"] = {"conv": _conv_p(
                tensors, f"encoder.down_blocks.{i}.downsamplers.0.conv", dtype)}
        down.append(level)
    enc.update({
        "down": down,
        "mid": mid("encoder.mid_block"),
        "norm_out": _norm_p(tensors, "encoder.conv_norm_out", dtype),
        "conv_out": _conv_p(tensors, "encoder.conv_out", dtype),
    })

    quant = {
        "quant_conv": _conv_p(tensors, "quant_conv", dtype),
        "embedding": tensors["quantize.embedding.weight"].astype(dtype),
        "post_quant_conv": _conv_p(tensors, "post_quant_conv", dtype),
    }

    dec: Dict[str, Any] = {
        "conv_in": _conv_p(tensors, "decoder.conv_in", dtype),
        "mid": mid("decoder.mid_block"),
    }
    up = [None] * nlev
    for k in range(nlev):
        # diffusers up_blocks[0] is the DEEPEST level; ours up[0] shallowest
        i = nlev - 1 - k
        level: Dict[str, Any] = {"block": [
            _diffusers_resnet_p(tensors, f"decoder.up_blocks.{k}.resnets.{j}", dtype)
            for j in range(cfg.layers_per_block + 1)]}
        if f"decoder.up_blocks.{k}.upsamplers.0.conv.weight" in tensors:
            level["upsample"] = {"conv": _conv_p(
                tensors, f"decoder.up_blocks.{k}.upsamplers.0.conv", dtype)}
        up[i] = level
    dec.update({
        "up": up,
        "norm_out": _norm_p(tensors, "decoder.conv_norm_out", dtype),
        "conv_out": _conv_p(tensors, "decoder.conv_out", dtype),
    })
    return {"encoder": enc, "quant": quant, "decoder": dec}


def load_llada_checkpoint(ckpt_dir: str, dtype=np.float32,
                          **cfg_overrides):
    """Convenience: ``(cfg, params)`` from an HF checkpoint directory."""
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        cfg = llada_config_from_hf(json.load(f), **cfg_overrides)
    tensors = load_safetensors_dir(ckpt_dir)
    return cfg, llada_params_from_torch(tensors, cfg, dtype)


# ---------------------------------------------------------------------------
# Reverse direction: params -> HF-style safetensors (the role of the
# reference's consolidated save, xllm/util/ckpt.py:66-97 save_pretrained)
# ---------------------------------------------------------------------------


def llada_state_dict_from_params(params: Dict[str, Any],
                                 cfg: LLaDAConfig,
                                 dtype=np.float32) -> Dict[str, np.ndarray]:
    """Param pytree -> torch-layout state dict with HF names."""
    import jax
    p = jax.tree_util.tree_map(lambda x: np.asarray(x, dtype=dtype), params)
    pre = "model.transformer."
    sd: Dict[str, np.ndarray] = {
        pre + "wte.weight": p["wte"],
        pre + "ln_f.weight": p["ln_f"],
    }
    if not cfg.weight_tying:
        sd[pre + "ff_out.weight"] = np.ascontiguousarray(p["head"].T)
    names = (["att_proj", "attn_out", "ff_proj", "ff_out"]
             if cfg.block_type == "sequential"
             else ["q_proj", "k_proj", "v_proj", "attn_out",
                   "ff_proj", "up_proj", "ff_out"])
    for i in range(cfg.n_layers):
        b = f"{pre}blocks.{i}."
        sd[b + "attn_norm.weight"] = p["blocks"]["attn_norm"][i]
        sd[b + "ff_norm.weight"] = p["blocks"]["ff_norm"][i]
        for name in names:
            sd[b + name + ".weight"] = np.ascontiguousarray(
                p["blocks"][name][i].T)
        if cfg.include_qkv_bias:
            if cfg.block_type == "sequential":
                sd[b + "att_proj.bias"] = p["blocks"]["att_proj_bias"][i]
            else:
                for n in ["q", "k", "v"]:
                    sd[b + f"{n}_proj.bias"] = p["blocks"][f"{n}_bias"][i]
    return sd


def save_llada_checkpoint(ckpt_dir: str, params: Dict[str, Any],
                          cfg: LLaDAConfig, dtype=np.float32,
                          extra_config: Optional[Dict[str, Any]] = None):
    """Write ``model.safetensors`` + ``config.json`` loadable by both this
    framework and the reference's HF classes."""
    from safetensors.numpy import save_file
    os.makedirs(ckpt_dir, exist_ok=True)
    sd = llada_state_dict_from_params(params, cfg, dtype)
    save_file(sd, os.path.join(ckpt_dir, "model.safetensors"))
    config = {
        "d_model": cfg.d_model, "n_heads": cfg.n_heads,
        "n_kv_heads": cfg.n_kv_heads, "n_layers": cfg.n_layers,
        "mlp_hidden_size": cfg.mlp_hidden_size, "mlp_ratio": cfg.mlp_ratio,
        "vocab_size": cfg.vocab_size, "embedding_size": cfg.embedding_size,
        "max_sequence_length": cfg.max_sequence_length,
        "rope": True, "rope_theta": cfg.rope_theta,
        "rope_full_precision": cfg.rope_full_precision,
        "rms_norm_eps": cfg.rms_norm_eps,
        "layer_norm_type": cfg.layer_norm_type,
        "include_bias": cfg.include_bias,
        "include_qkv_bias": cfg.include_qkv_bias,
        "block_type": cfg.block_type,
        "activation_type": cfg.activation_type,
        "weight_tying": cfg.weight_tying,
        "input_emb_norm": cfg.input_emb_norm,
        "scale_logits": cfg.scale_logits,
        "mask_token_id": cfg.mask_token_id,
        "eos_token_id": cfg.eos_token_id,
        "pad_token_id": cfg.pad_token_id,
    }
    if extra_config:
        config.update(extra_config)
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        json.dump(config, f, indent=2)
