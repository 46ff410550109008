"""W8A8 int8 inference path (ops/quant.py): numerics, head slicing,
sampler integration, sharding metadata. Opt-in approximation — the dense
path remains the parity default."""

import numpy as np
import jax
import jax.numpy as jnp

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models.llada import (
    LLaDAConfig, init_llada_params, llada_forward, llada_head, llada_hidden,
    llada_hidden_with_cache, llada_hidden_partial, param_shardings)
from mmada_parallel_tpu.ops.quant import (
    quantize_weight, int8_matmul, quantize_llada_params,
    quantize_param_shardings)

TVS, CB, MASK = 256, 32, 250
TOK = tk.VariantATokens(mask=MASK, newline=251, answer_start=252,
                        answer_end=253, boi=254, eoi=255, uncondition=249,
                        pad=248, text_vocab_size=TVS, codebook_size=CB)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 33, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    q = quantize_weight(w)
    got = np.asarray(int8_matmul(x, q["w_q"], q["scale"]))
    want = np.asarray(x @ w)
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-9)
    assert rel.mean() < 0.02, rel.mean()
    # weight-only dequant round trip is tight (<=1/254 per-channel rel err)
    deq = np.asarray(q["w_q"], np.float32) * np.asarray(q["scale"])
    np.testing.assert_allclose(deq, np.asarray(w), atol=float(
        np.abs(w).max()) / 120)


def test_quantized_forward_close_to_dense():
    cfg = LLaDAConfig.tiny(d_model=64, n_heads=4, n_kv_heads=4, n_layers=2,
                           mlp_hidden_size=128, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    params = init_llada_params(jax.random.key(1), cfg)
    qparams = quantize_llada_params(params)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 200, (2, 12)))
    dense = np.asarray(llada_forward(params, cfg, ids))
    quant = np.asarray(llada_forward(qparams, cfg, ids))
    # rank-preserving: argmax agreement is what the samplers consume
    agree = (dense.argmax(-1) == quant.argmax(-1)).mean()
    assert agree >= 0.9, agree
    cos = (dense * quant).sum() / (np.linalg.norm(dense)
                                   * np.linalg.norm(quant))
    assert cos > 0.995, cos


def test_quantize_head_false_keeps_dense_head():
    cfg = LLaDAConfig.tiny(n_layers=1, vocab_size=TVS + CB)
    params = init_llada_params(jax.random.key(7), cfg)
    qp = quantize_llada_params(params, quantize_head=False)
    assert not isinstance(qp["head"], dict)          # head left dense
    assert isinstance(qp["blocks"]["q_proj"], dict)  # blocks quantized
    h = jnp.asarray(np.random.default_rng(7).normal(
        size=(1, 5, cfg.d_model)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(llada_head(qp, cfg, h)),
                               np.asarray(llada_head(params, cfg, h)),
                               atol=1e-5)
    specs = quantize_param_shardings(param_shardings(cfg),
                                     quantize_head=False)
    assert (jax.tree_util.tree_structure(qp)
            == jax.tree_util.tree_structure(specs))


def test_quantized_head_vocab_slice():
    cfg = LLaDAConfig.tiny(n_layers=1, vocab_size=TVS + CB)
    params = quantize_llada_params(init_llada_params(jax.random.key(2), cfg))
    h = jnp.asarray(np.random.default_rng(2).normal(size=(1, 5, cfg.d_model))
                    .astype(np.float32))
    full = np.asarray(llada_head(params, cfg, h))
    sliced = np.asarray(llada_head(params, cfg, h, vocab_slice=(TVS, CB)))
    np.testing.assert_allclose(sliced, full[..., TVS:TVS + CB], atol=1e-5)


def test_quantized_ti2ti_runs():
    from mmada_parallel_tpu.samplers.parallel_ti2ti import (
        TI2TIOptions, generate_ti2ti)
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    params = quantize_llada_params(init_llada_params(jax.random.key(3), cfg))
    ids, lay = tk.assemble_ti2ti_sequence([5, 6, 7], 8, 2, 3, [9], tokens=TOK)
    opts = TI2TIOptions(text_steps=8, timesteps=4, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=2.0,
                        text_vocab_size=TVS, codebook_size=CB,
                        mask_token=MASK)
    fin, codes = generate_ti2ti(params, cfg, jnp.asarray(ids)[None], lay,
                                opts, uncond_image_prefix=np.asarray(
                                    [40, 41], np.int32), key=None)
    fin = np.asarray(fin)[0]
    assert not np.any(fin[lay.text_start:lay.text_end] == MASK)
    assert np.asarray(codes).min() >= 0


def test_quantized_cached_forward_paths():
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    params = quantize_llada_params(init_llada_params(jax.random.key(4), cfg))
    ids = jnp.asarray(np.random.default_rng(4).integers(0, 200, (1, 10)))
    h_full, cache = llada_hidden_with_cache(params, cfg, ids)
    assert np.isfinite(np.asarray(h_full)).all()
    sel_pos = jnp.asarray([[2, 5, 7]])
    sel_ids = jnp.take_along_axis(ids, sel_pos, axis=1)
    h_sel, cache2 = llada_hidden_partial(params, cfg, sel_ids, sel_pos, cache)
    # unchanged tokens: partial recompute matches the full forward closely
    np.testing.assert_allclose(np.asarray(h_sel),
                               np.asarray(h_full)[:, [2, 5, 7]], atol=1e-4)


def test_quantized_param_shardings_structure():
    cfg = LLaDAConfig.tiny()
    params = quantize_llada_params(init_llada_params(jax.random.key(5), cfg))
    specs = quantize_param_shardings(param_shardings(cfg))
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(specs))
    qp = specs["blocks"]["q_proj"]
    assert tuple(qp["scale"])[-2] is None  # K axis dropped for [L, 1, N]


def test_quantized_sharded_forward_matches_unsharded(eight_devices):
    from mmada_parallel_tpu.parallel import (MeshConfig, make_mesh,
                                             shard_params, batch_sharding)
    cfg = LLaDAConfig.tiny(d_model=64, n_heads=4, n_kv_heads=4, n_layers=2,
                           mlp_hidden_size=128, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    params = quantize_llada_params(init_llada_params(jax.random.key(6), cfg))
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2), eight_devices)
    specs = quantize_param_shardings(param_shardings(cfg))
    sharded = shard_params(params, specs, mesh)
    ids = jnp.asarray(np.random.default_rng(6).integers(0, 200, (4, 12)))
    ref = np.asarray(llada_forward(params, cfg, ids))
    got = np.asarray(jax.jit(lambda p, i: llada_forward(p, cfg, i))(
        sharded, jax.device_put(ids, batch_sharding(mesh))))
    np.testing.assert_allclose(ref, got, atol=2e-4, rtol=2e-3)
