"""Numerical and structural tests for the LLaDA backbone.

The oracle is an independent numpy re-derivation of the block math
(RMSNorm fp32 stats, neox RoPE, bidirectional GQA attention, SwiGLU) —
written here from the architecture spec, not shared with the implementation.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu.models.llada import (
    LLaDAConfig, init_llada_params, llada_forward, count_params,
    param_shardings,
)


def np_rms(x, w, eps):
    var = (x.astype(np.float32) ** 2).mean(-1, keepdims=True)
    return (x / np.sqrt(var + eps)) * w


def np_rope(q, theta):
    # q: [B, L, H, hd]; neox half-rotation
    B, L, H, hd = q.shape
    inv = 1.0 / (theta ** (np.arange(0, hd, 2, dtype=np.float32) / hd))
    freqs = np.outer(np.arange(L, dtype=np.float32), inv)  # [L, hd/2]
    emb = np.concatenate([freqs, freqs], -1)
    sin, cos = np.sin(emb), np.cos(emb)
    x1, x2 = q[..., :hd // 2], q[..., hd // 2:]
    rot = np.concatenate([-x2, x1], -1)
    return q * cos[None, :, None, :] + rot * sin[None, :, None, :]


def np_forward(params, cfg, ids):
    p = jax.tree_util.tree_map(np.asarray, params)
    x = p["wte"][ids]
    nh, nkv, hd = cfg.n_heads, cfg.effective_n_kv_heads, cfg.head_dim
    B, L = ids.shape
    for l in range(cfg.n_layers):
        lp = {k: v[l] for k, v in p["blocks"].items()}
        h = np_rms(x, lp["attn_norm"], cfg.rms_norm_eps)
        q = (h @ lp["q_proj"]).reshape(B, L, nh, hd)
        k = (h @ lp["k_proj"]).reshape(B, L, nkv, hd)
        v = (h @ lp["v_proj"]).reshape(B, L, nkv, hd)
        q, k = np_rope(q, cfg.rope_theta), np_rope(k, cfg.rope_theta)
        if nh != nkv:
            k = np.repeat(k, nh // nkv, axis=2)
            v = np.repeat(v, nh // nkv, axis=2)
        scores = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        scores = scores - scores.max(-1, keepdims=True)
        probs = np.exp(scores)
        probs /= probs.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", probs, v).reshape(B, L, -1)
        x = x + att @ lp["attn_out"]
        h2 = np_rms(x, lp["ff_norm"], cfg.rms_norm_eps)
        gate = h2 @ lp["ff_proj"]
        gate = gate / (1 + np.exp(-gate))  # silu
        x = x + (gate * (h2 @ lp["up_proj"])) @ lp["ff_out"]
    x = np_rms(x, p["ln_f"], cfg.rms_norm_eps)
    head = p["head"] if not cfg.weight_tying else p["wte"].T
    return x @ head


@pytest.fixture(scope="module")
def tiny():
    cfg = LLaDAConfig.tiny()
    params = init_llada_params(jax.random.key(0), cfg)
    return cfg, params


def test_forward_shape_and_dtype(tiny):
    cfg, params = tiny
    ids = jnp.zeros((2, 10), dtype=jnp.int32)
    logits = llada_forward(params, cfg, ids)
    assert logits.shape == (2, 10, cfg.emb_size)
    assert logits.dtype == jnp.float32


def test_forward_matches_numpy_oracle(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 9))
    got = np.asarray(llada_forward(params, cfg, jnp.asarray(ids)))
    want = np_forward(params, cfg, ids)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_gqa_matches_numpy_oracle():
    cfg = LLaDAConfig.tiny(n_kv_heads=1)
    params = init_llada_params(jax.random.key(1), cfg)
    ids = np.random.default_rng(1).integers(0, cfg.vocab_size, size=(1, 7))
    got = np.asarray(llada_forward(params, cfg, jnp.asarray(ids)))
    want = np_forward(params, cfg, ids)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_attention_is_bidirectional(tiny):
    """Later tokens must influence earlier positions (non-causal)."""
    cfg, params = tiny
    ids = np.full((1, 8), 5, dtype=np.int32)
    ids2 = ids.copy()
    ids2[0, -1] = 9  # change only the LAST token
    a = np.asarray(llada_forward(params, cfg, jnp.asarray(ids)))
    b = np.asarray(llada_forward(params, cfg, jnp.asarray(ids2)))
    # position 0 logits must differ -> information flowed backwards
    assert np.abs(a[0, 0] - b[0, 0]).max() > 1e-6


def test_padding_mask_isolates_real_tokens(tiny):
    """Garbage in masked-out positions must not change real-token logits."""
    cfg, params = tiny
    rng = np.random.default_rng(3)
    real = rng.integers(0, cfg.vocab_size, size=(1, 6))
    pad_a = np.concatenate([real, np.zeros((1, 4), np.int64)], axis=1)
    pad_b = np.concatenate([real, rng.integers(0, cfg.vocab_size, (1, 4))], axis=1)
    mask = np.array([[True] * 6 + [False] * 4])
    a = np.asarray(llada_forward(params, cfg, jnp.asarray(pad_a), jnp.asarray(mask)))
    b = np.asarray(llada_forward(params, cfg, jnp.asarray(pad_b), jnp.asarray(mask)))
    np.testing.assert_allclose(a[0, :6], b[0, :6], atol=1e-5)


def test_plain_layer_norm_matches_numpy():
    cfg = LLaDAConfig.tiny(layer_norm_type="default", n_layers=1)
    params = init_llada_params(jax.random.key(9), cfg)
    ids = np.random.default_rng(9).integers(0, 100, (1, 6))
    got = np.asarray(llada_forward(params, cfg, jnp.asarray(ids)))
    # oracle: same block math but with mean-subtracted LayerNorm
    p = jax.tree_util.tree_map(np.asarray, params)

    def ln(x, w):
        m = x.mean(-1, keepdims=True)
        v = x.var(-1, keepdims=True)
        return (x - m) / np.sqrt(v + 1e-5) * w

    x = p["wte"][ids]
    lp = {k: v[0] for k, v in p["blocks"].items()}
    nh, nkv, hd = cfg.n_heads, cfg.effective_n_kv_heads, cfg.head_dim
    h = ln(x, lp["attn_norm"])
    q = np_rope((h @ lp["q_proj"]).reshape(1, 6, nh, hd), cfg.rope_theta)
    k = np_rope((h @ lp["k_proj"]).reshape(1, 6, nkv, hd), cfg.rope_theta)
    v = (h @ lp["v_proj"]).reshape(1, 6, nkv, hd)
    if nh != nkv:
        k = np.repeat(k, nh // nkv, 2); v = np.repeat(v, nh // nkv, 2)
    s = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
    s -= s.max(-1, keepdims=True)
    pr = np.exp(s); pr /= pr.sum(-1, keepdims=True)
    att = np.einsum("bhqk,bkhd->bqhd", pr, v).reshape(1, 6, -1)
    x = x + att @ lp["attn_out"]
    h2 = ln(x, lp["ff_norm"])
    gate = h2 @ lp["ff_proj"]
    gate = gate / (1 + np.exp(-gate))
    x = x + (gate * (h2 @ lp["up_proj"])) @ lp["ff_out"]
    x = ln(x, p["ln_f"])
    want = x @ p["head"]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_weight_tying_shapes():
    cfg = LLaDAConfig.tiny(weight_tying=True)
    params = init_llada_params(jax.random.key(2), cfg)
    assert "head" not in params
    logits = llada_forward(params, cfg, jnp.zeros((1, 4), jnp.int32))
    assert logits.shape == (1, 4, cfg.emb_size)


def test_remat_strategies_same_output_and_grads(tiny):
    cfg, params = tiny
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 100, (1, 5)))
    a = np.asarray(llada_forward(params, cfg, ids))

    def loss(p, c):
        return jnp.sum(llada_forward(p, c, ids) ** 2) * 1e-4
    g_ref = jax.grad(loss)(params, cfg)
    for strat in ["whole_layer", "one_in_two"]:
        cfg_r = LLaDAConfig.tiny(remat=strat)
        b = np.asarray(llada_forward(params, cfg_r, ids))
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=strat)
        g = jax.grad(loss)(params, cfg_r)
        for x, y in zip(jax.tree_util.tree_leaves(g_ref),
                        jax.tree_util.tree_leaves(g)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       atol=1e-5, err_msg=strat)


def test_kaiming_normal_init_stds():
    """kaiming_normal (modeling_llada.py:111-112): std = sqrt(2/fan_in),
    where torch's fan_in is weight.size(1) — embedding dim for wte,
    input features for projections."""
    cfg = LLaDAConfig.tiny(init_fn="kaiming_normal", d_model=64,
                           mlp_hidden_size=128, vocab_size=4096)
    params = init_llada_params(jax.random.key(7), cfg)
    d = cfg.d_model
    for name, fan in [("q_proj", d), ("ff_out", cfg.hidden_size)]:
        w = np.asarray(params["blocks"][name], np.float32)
        np.testing.assert_allclose(w.std(), np.sqrt(2.0 / fan), rtol=0.15,
                                   err_msg=name)
    wte = np.asarray(params["wte"], np.float32)
    np.testing.assert_allclose(wte.std(), np.sqrt(2.0 / d), rtol=0.15)
    # forward still runs
    logits = llada_forward(params, cfg, jnp.zeros((1, 4), jnp.int32))
    assert np.isfinite(np.asarray(logits)).all()


def test_count_params_8b_scale():
    """Sanity-check the 8B config's parameter count (~8.1e9)."""
    cfg = LLaDAConfig.llada_8b()
    d, h, L = cfg.d_model, cfg.hidden_size, cfg.n_layers
    per_block = 4 * d * d + 3 * d * h + 2 * d
    total = (cfg.emb_size * d) * 2 + d + L * per_block
    assert 7.5e9 < total < 9e9


def test_sequential_block_matches_oracle():
    """Fused-qkv + SwiGLU sequential block vs numpy oracle."""
    cfg = LLaDAConfig.tiny(block_type="sequential", activation_type="swiglu")
    params = init_llada_params(jax.random.key(5), cfg)
    rng = np.random.default_rng(5)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 6))
    got = np.asarray(llada_forward(params, cfg, jnp.asarray(ids)))

    p = jax.tree_util.tree_map(np.asarray, params)
    x = p["wte"][ids]
    nh, nkv, hd = cfg.n_heads, cfg.effective_n_kv_heads, cfg.head_dim
    D = cfg.d_model
    for l in range(cfg.n_layers):
        lp = {k: v[l] for k, v in p["blocks"].items()}
        h = np_rms(x, lp["attn_norm"], cfg.rms_norm_eps)
        qkv = h @ lp["att_proj"]
        kvd = nkv * hd
        q = qkv[..., :D].reshape(1, 6, nh, hd)
        k = qkv[..., D:D + kvd].reshape(1, 6, nkv, hd)
        v = qkv[..., D + kvd:].reshape(1, 6, nkv, hd)
        q, k = np_rope(q, cfg.rope_theta), np_rope(k, cfg.rope_theta)
        if nh != nkv:
            k = np.repeat(k, nh // nkv, 2); v = np.repeat(v, nh // nkv, 2)
        s = np.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(hd)
        s -= s.max(-1, keepdims=True)
        pr = np.exp(s); pr /= pr.sum(-1, keepdims=True)
        att = np.einsum("bhqk,bkhd->bqhd", pr, v).reshape(1, 6, -1)
        x = x + att @ lp["attn_out"]
        h2 = np_rms(x, lp["ff_norm"], cfg.rms_norm_eps)
        ff = h2 @ lp["ff_proj"]
        a, gate = np.split(ff, 2, axis=-1)
        act = (gate / (1 + np.exp(-gate))) * a
        x = x + act @ lp["ff_out"]
    x = np_rms(x, p["ln_f"], cfg.rms_norm_eps)
    want = x @ p["head"]
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-3)


def test_param_shardings_tree_matches_params(tiny):
    cfg, params = tiny
    specs = param_shardings(cfg)
    # same tree structure
    jax.tree_util.tree_map(lambda p, s: None, params, specs,
                           is_leaf=lambda x: isinstance(x, type(specs["wte"])))
    flat_p = jax.tree_util.tree_structure(params)
    flat_s = jax.tree_util.tree_structure(specs)
    assert flat_p == flat_s
