"""Feature-cache correctness: partial forward equivalence + cached sampler."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models.llada import (
    LLaDAConfig, init_llada_params, llada_hidden, llada_hidden_with_cache,
    llada_hidden_partial, llada_head)
from mmada_parallel_tpu.samplers.image_gen import (ImageGenOptions,
                                                   generate_image,
                                                   generate_image_cached)

TVS, CB, MASK, NEWLINE = 256, 32, 250, 251
TOK = tk.VariantATokens(mask=MASK, newline=NEWLINE, answer_start=252,
                        answer_end=253, boi=254, eoi=255, uncondition=249,
                        pad=248, text_vocab_size=TVS, codebook_size=CB)


@pytest.fixture(scope="module")
def model():
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=2,
                           mlp_hidden_size=64, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    return cfg, init_llada_params(jax.random.key(3), cfg)


def test_cache_forward_matches_plain(model):
    cfg, params = model
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 200, (2, 12)))
    h1 = np.asarray(llada_hidden(params, cfg, ids))
    h2, cache = llada_hidden_with_cache(params, cfg, ids)
    np.testing.assert_allclose(h1, np.asarray(h2), atol=1e-5)
    # packed lane layout: head h = lanes [h*hd, (h+1)*hd) (feeds the fused
    # qonly kernel with no retiling)
    assert cache["k"].shape == (cfg.n_layers, 2, 12,
                                cfg.effective_n_kv_heads * cfg.head_dim)


def test_partial_all_positions_matches_full(model):
    """Selecting every position must reproduce the full forward exactly
    (same tokens, fresh k/v written everywhere)."""
    cfg, params = model
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 200, (2, 10)))
    h_full, cache = llada_hidden_with_cache(params, cfg, ids)
    sel_pos = jnp.broadcast_to(jnp.arange(10)[None], (2, 10))
    h_part, _ = llada_hidden_partial(params, cfg, ids, sel_pos, cache)
    np.testing.assert_allclose(np.asarray(h_full), np.asarray(h_part),
                               atol=1e-5)


def test_partial_subset_with_unchanged_tokens_is_consistent(model):
    """If tokens did not change, a subset recompute must reproduce the
    full-forward hidden at the selected positions (cache is exact here)."""
    cfg, params = model
    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 200, (1, 10)))
    h_full, cache = llada_hidden_with_cache(params, cfg, ids)
    sel_pos = jnp.asarray([[2, 5, 7]])
    sel_ids = jnp.take_along_axis(ids, sel_pos, axis=1)
    h_part, new_cache = llada_hidden_partial(params, cfg, sel_ids, sel_pos,
                                             cache)
    want = np.asarray(h_full)[0, [2, 5, 7]]
    np.testing.assert_allclose(np.asarray(h_part)[0], want, atol=1e-5)
    # cache at untouched positions unchanged
    np.testing.assert_allclose(np.asarray(new_cache["k"][:, :, 0]),
                               np.asarray(cache["k"][:, :, 0]), atol=1e-6)


def test_partial_detects_changed_token(model):
    """Changing a selected token must change its recomputed hidden."""
    cfg, params = model
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 200, (1, 10)))
    _, cache = llada_hidden_with_cache(params, cfg, ids)
    sel_pos = jnp.asarray([[4]])
    h_a, _ = llada_hidden_partial(params, cfg, jnp.asarray([[7]]), sel_pos,
                                  cache)
    h_b, _ = llada_hidden_partial(params, cfg, jnp.asarray([[9]]), sel_pos,
                                  cache)
    assert np.abs(np.asarray(h_a) - np.asarray(h_b)).max() > 1e-6


def test_cached_sampler_runs_and_matches_on_always_refresh(model):
    cfg, params = model
    ids, lay = tk.assemble_ti2ti_sequence([5, 6, 7], 0, 2, 3, [9], tokens=TOK)
    base_opts = dict(timesteps=6, temperature=0.0, cfg_scale=0.0,
                     text_vocab_size=TVS, codebook_size=CB, mask_token=MASK)
    # refresh every step -> identical to the uncached sampler
    opts_always = ImageGenOptions(**base_opts, use_cache=True,
                                  refresh_interval=1, warmup_ratio=1.0)
    plain_ids, plain_codes = generate_image(
        params, cfg, jnp.asarray(ids)[None], lay,
        ImageGenOptions(**base_opts), key=None)
    cached_ids, cached_codes = generate_image_cached(
        params, cfg, jnp.asarray(ids)[None], lay, opts_always, key=None)
    assert np.array_equal(np.asarray(plain_ids), np.asarray(cached_ids))

    # real cache config: still fills the grid with valid codes
    opts_cache = ImageGenOptions(**base_opts, use_cache=True, cache_ratio=0.5,
                                 refresh_interval=3, warmup_ratio=0.3)
    fin, codes = generate_image_cached(
        params, cfg, jnp.asarray(ids)[None], lay, opts_cache, key=None)
    f = np.asarray(fin)[0]
    assert not np.any(f[lay.image_positions()] == MASK)
    assert np.asarray(codes).min() >= 0 and np.asarray(codes).max() < CB


def test_cached_sampler_bf16_compute_dtype(model):
    """Regression: with bf16 compute the lax.cond branches must still agree
    on the carried logits dtype."""
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=TVS + CB,
                           mask_token_id=MASK, compute_dtype=jnp.bfloat16)
    params = init_llada_params(jax.random.key(8), cfg)
    ids, lay = tk.assemble_ti2ti_sequence([5, 6], 0, 2, 3, [9], tokens=TOK)
    opts = ImageGenOptions(timesteps=4, temperature=0.0, cfg_scale=0.0,
                           use_cache=True, cache_ratio=0.5,
                           refresh_interval=2, warmup_ratio=0.3,
                           text_vocab_size=TVS, codebook_size=CB,
                           mask_token=MASK)
    fin, codes = generate_image_cached(params, cfg, jnp.asarray(ids)[None],
                                       lay, opts, key=None)
    assert np.asarray(codes).max() < CB


def test_cached_sampler_cfg_matches_plain_on_always_refresh(model):
    """With CFG + refresh-every-step, the two-branch cached sampler must
    equal the plain CFG sampler exactly."""
    cfg, params = model
    ids, lay = tk.assemble_ti2ti_sequence([5, 6, 7], 0, 2, 3, [9], tokens=TOK)
    un = np.asarray([60, 61], np.int32)
    base = dict(timesteps=5, temperature=0.0, cfg_scale=1.5,
                text_vocab_size=TVS, codebook_size=CB, mask_token=MASK)
    plain_ids, _ = generate_image(params, cfg, jnp.asarray(ids)[None], lay,
                                  ImageGenOptions(**base), uncond_ids=un,
                                  key=None)
    cached_ids, _ = generate_image_cached(
        params, cfg, jnp.asarray(ids)[None], lay,
        ImageGenOptions(**base, use_cache=True, refresh_interval=1,
                        warmup_ratio=1.0), uncond_ids=un, key=None)
    assert np.array_equal(np.asarray(plain_ids), np.asarray(cached_ids))

    # real cache schedule with CFG still completes with valid codes
    fin, codes = generate_image_cached(
        params, cfg, jnp.asarray(ids)[None], lay,
        ImageGenOptions(**base, use_cache=True, cache_ratio=0.5,
                        refresh_interval=2, warmup_ratio=0.3),
        uncond_ids=un, key=None)
    f = np.asarray(fin)[0]
    assert not np.any(f[lay.image_positions()] == MASK)
    assert np.asarray(codes).max() < CB
