"""Checkpoint-converter round-trip tests: synthesize a torch-style state
dict with the reference's weight names, convert, and check the pytree
matches (names, transposes, stacking, up-block reindexing)."""

import numpy as np
import jax
import pytest

from mmada_parallel_tpu.models import convert as CV
from mmada_parallel_tpu.models.llada import (LLaDAConfig, init_llada_params,
                                             llada_forward)
from mmada_parallel_tpu.models import magvit2 as M
from mmada_parallel_tpu.models import amused_vq as A

import jax.numpy as jnp


def _llada_state_dict(params, cfg):
    """Reverse-map params -> HF-named torch-layout tensors."""
    sd = {}
    p = jax.tree_util.tree_map(np.asarray, params)
    sd["model.transformer.wte.weight"] = p["wte"]
    sd["model.transformer.ln_f.weight"] = p["ln_f"]
    sd["model.transformer.ff_out.weight"] = p["head"].T
    for i in range(cfg.n_layers):
        b = f"model.transformer.blocks.{i}."
        sd[b + "attn_norm.weight"] = p["blocks"]["attn_norm"][i]
        sd[b + "ff_norm.weight"] = p["blocks"]["ff_norm"][i]
        for name in ["q_proj", "k_proj", "v_proj", "attn_out",
                     "ff_proj", "up_proj", "ff_out"]:
            sd[b + name + ".weight"] = p["blocks"][name][i].T
    return sd


def test_llada_roundtrip():
    cfg = LLaDAConfig.tiny()
    params = init_llada_params(jax.random.key(0), cfg)
    sd = _llada_state_dict(params, cfg)
    got = CV.llada_params_from_torch(sd, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # converted params drive the forward identically
    ids = jnp.zeros((1, 4), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(llada_forward(params, cfg, ids)),
        np.asarray(llada_forward(jax.tree_util.tree_map(jnp.asarray, got),
                                 cfg, ids)))


def test_llada_config_from_hf():
    cfg = CV.llada_config_from_hf({
        "d_model": 4096, "n_heads": 32, "n_layers": 32,
        "mlp_hidden_size": 12288, "vocab_size": 126464,
        "embedding_size": 134656, "rope_theta": 500000.0,
        "weight_tying": False, "include_qkv_bias": False,
    })
    assert cfg.d_model == 4096 and cfg.hidden_size == 12288
    assert cfg.emb_size == 134656


def test_llada_missing_key_message():
    cfg = LLaDAConfig.tiny()
    with pytest.raises(KeyError, match="transformer"):
        CV.llada_params_from_torch({}, cfg)


def _flat_with_names(tree):
    return {jax.tree_util.keystr(kp): v for kp, v in
            jax.tree_util.tree_flatten_with_path(tree)[0]}


def _magvit_state_dict(params):
    sd = {}

    def emit_conv(base, p):
        sd[base + ".weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[base + ".bias"] = np.asarray(p["b"])

    def emit_norm(base, p):
        sd[base + ".weight"] = np.asarray(p["scale"])
        sd[base + ".bias"] = np.asarray(p["bias"])

    def emit_resnet(base, p):
        emit_norm(base + ".norm1", p["norm1"]); emit_conv(base + ".conv1", p["conv1"])
        emit_norm(base + ".norm2", p["norm2"]); emit_conv(base + ".conv2", p["conv2"])
        if "nin_shortcut" in p:
            emit_conv(base + ".nin_shortcut", p["nin_shortcut"])

    def emit_attn(base, p):
        emit_norm(base + ".norm", p["norm"])
        for n in ["q", "k", "v", "proj_out"]:
            emit_conv(f"{base}.{n}", p[n])

    e = params["encoder"]
    emit_conv("encoder.conv_in", e["conv_in"])
    for i, lvl in enumerate(e["down"]):
        for j, bp in enumerate(lvl["block"]):
            emit_resnet(f"encoder.down.{i}.block.{j}", bp)
        if "downsample" in lvl:
            emit_conv(f"encoder.down.{i}.downsample.conv", lvl["downsample"]["conv"])
    for n in ["block_1", "block_2"]:
        emit_resnet(f"encoder.mid.{n}", e["mid"][n])
    emit_attn("encoder.mid.attn_1", e["mid"]["attn_1"])
    emit_norm("encoder.norm_out", e["norm_out"])
    emit_conv("encoder.conv_out", e["conv_out"])
    emit_conv("encoder.quant_conv", e["quant_conv"])

    d = params["decoder"]
    emit_conv("decoder.post_quant_conv", d["post_quant_conv"])
    emit_conv("decoder.conv_in", d["conv_in"])
    for n in ["block_1", "block_2"]:
        emit_resnet(f"decoder.mid.{n}", d["mid"][n])
    emit_attn("decoder.mid.attn_1", d["mid"]["attn_1"])
    for i, lvl in enumerate(d["up"]):
        for j, bp in enumerate(lvl["block"]):
            emit_resnet(f"decoder.up.{i}.block.{j}", bp)
        if "upsample" in lvl:
            emit_conv(f"decoder.up.{i}.upsample.conv", lvl["upsample"]["conv"])
    emit_norm("decoder.norm_out", d["norm_out"])
    emit_conv("decoder.conv_out", d["conv_out"])
    return sd


def test_magvit_roundtrip():
    cfg = M.MagvitConfig.tiny()
    params = M.init_magvit_params(jax.random.key(1), cfg)
    sd = _magvit_state_dict(params)
    got = CV.magvit_params_from_torch(sd, cfg)
    a, b = _flat_with_names(params), _flat_with_names(got)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)


def _amused_state_dict(params, cfg):
    sd = {}

    def emit_conv(base, p):
        sd[base + ".weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
        sd[base + ".bias"] = np.asarray(p["b"])

    def emit_norm(base, p):
        sd[base + ".weight"] = np.asarray(p["scale"])
        sd[base + ".bias"] = np.asarray(p["bias"])

    def emit_resnet(base, p):
        emit_norm(base + ".norm1", p["norm1"]); emit_conv(base + ".conv1", p["conv1"])
        emit_norm(base + ".norm2", p["norm2"]); emit_conv(base + ".conv2", p["conv2"])
        if "nin_shortcut" in p:
            emit_conv(base + ".conv_shortcut", p["nin_shortcut"])

    def emit_mid(base, p):
        emit_resnet(f"{base}.resnets.0", p["block_1"])
        emit_resnet(f"{base}.resnets.1", p["block_2"])
        if "attn_1" in p:
            ap = p["attn_1"]
            emit_norm(f"{base}.attentions.0.group_norm", ap["norm"])
            for src, dst in [("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                             ("proj_out", "to_out.0")]:
                w = np.asarray(ap[src]["w"])[0, 0]  # [in, out]
                sd[f"{base}.attentions.0.{dst}.weight"] = w.T
                sd[f"{base}.attentions.0.{dst}.bias"] = np.asarray(ap[src]["b"])

    e = params["encoder"]
    emit_conv("encoder.conv_in", e["conv_in"])
    for i, lvl in enumerate(e["down"]):
        for j, bp in enumerate(lvl["block"]):
            emit_resnet(f"encoder.down_blocks.{i}.resnets.{j}", bp)
        if "downsample" in lvl:
            emit_conv(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                      lvl["downsample"]["conv"])
    emit_mid("encoder.mid_block", e["mid"])
    emit_norm("encoder.conv_norm_out", e["norm_out"])
    emit_conv("encoder.conv_out", e["conv_out"])

    q = params["quant"]
    emit_conv("quant_conv", q["quant_conv"])
    sd["quantize.embedding.weight"] = np.asarray(q["embedding"])
    emit_conv("post_quant_conv", q["post_quant_conv"])

    d = params["decoder"]
    emit_conv("decoder.conv_in", d["conv_in"])
    emit_mid("decoder.mid_block", d["mid"])
    nlev = len(cfg.block_out_channels)
    for i, lvl in enumerate(d["up"]):
        k = nlev - 1 - i  # diffusers order
        for j, bp in enumerate(lvl["block"]):
            emit_resnet(f"decoder.up_blocks.{k}.resnets.{j}", bp)
        if "upsample" in lvl:
            emit_conv(f"decoder.up_blocks.{k}.upsamplers.0.conv",
                      lvl["upsample"]["conv"])
    emit_norm("decoder.conv_norm_out", d["norm_out"])
    emit_conv("decoder.conv_out", d["conv_out"])
    return sd


def test_amused_roundtrip():
    cfg = A.AmusedVQConfig.tiny()
    params = A.init_amused_vq_params(jax.random.key(2), cfg)
    sd = _amused_state_dict(params, cfg)
    got = CV.amused_params_from_torch(sd, cfg)
    a, b = _flat_with_names(params), _flat_with_names(got)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), k)


def test_save_load_llada_roundtrip(tmp_path):
    """save_llada_checkpoint -> load_llada_checkpoint reproduces everything."""
    cfg = LLaDAConfig.tiny()
    params = init_llada_params(jax.random.key(4), cfg)
    CV.save_llada_checkpoint(str(tmp_path), params, cfg)
    cfg2, params2 = CV.load_llada_checkpoint(str(tmp_path))
    assert cfg2.d_model == cfg.d_model and cfg2.n_layers == cfg.n_layers
    assert cfg2.block_type == cfg.block_type
    # execution policy is not part of the checkpoint; align it for comparison
    import dataclasses
    cfg2 = dataclasses.replace(cfg2, compute_dtype=cfg.compute_dtype,
                               param_dtype=cfg.param_dtype)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ids = jnp.zeros((1, 4), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(llada_forward(params, cfg, ids)),
        np.asarray(llada_forward(
            jax.tree_util.tree_map(jnp.asarray, params2), cfg2, ids)),
        atol=1e-6)


def test_save_load_sequential_roundtrip(tmp_path):
    cfg = LLaDAConfig.tiny(block_type="sequential", activation_type="swiglu")
    params = init_llada_params(jax.random.key(5), cfg)
    CV.save_llada_checkpoint(str(tmp_path), params, cfg)
    cfg2, params2 = CV.load_llada_checkpoint(str(tmp_path))
    assert cfg2.block_type == "sequential"
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_amused_config_from_hf():
    cfg = CV.amused_config_from_hf({
        "block_out_channels": [128, 256, 256, 512, 768],
        "layers_per_block": 2, "latent_channels": 64,
        "num_vq_embeddings": 8192, "norm_num_groups": 32,
    })
    assert cfg.scale == 16 and cfg.embed_dim == 64
