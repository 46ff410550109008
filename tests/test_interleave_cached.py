"""Cached interleave sampler (M family): exactness with aggressive
refresh, approximation sanity with a real cache schedule."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models.llada import LLaDAConfig, init_llada_params
from mmada_parallel_tpu.samplers.interleave import (
    InterleaveOptions, interleave_generate, interleave_generate_cached)

TVS, CB, MASK = 256, 32, 250
TOK = tk.VariantMTokens(mask=MASK, soi=251, eoi=252, bos=249, eos=248,
                        interleave=247, text_vocab_size=TVS,
                        codebook_size=CB)
N_VQ, MSL = 6, 8


@pytest.fixture(scope="module")
def model():
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=2,
                           mlp_hidden_size=64, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    return cfg, init_llada_params(jax.random.key(4), cfg)


def _setup():
    head = [TOK.interleave, TOK.soi] + [TVS + 3] * N_VQ + [TOK.eoi]
    instr = [TOK.bos, 11, 12, 13, TOK.eos]
    ids, lay = tk.assemble_interleave_sequence(head + instr, N_VQ, MSL,
                                               tokens=TOK)
    un_head = [TOK.interleave, TOK.soi] + [0] * N_VQ + [TOK.eoi]
    un_ids, _ = tk.assemble_interleave_sequence(
        un_head + [TOK.bos, TOK.eos] + [TOK.eos] * (len(instr) - 2),
        N_VQ, MSL, tokens=TOK)
    opts = InterleaveOptions(text_steps=8, image_steps=4, text_cfg=1.5,
                             image_cfg=2.0, text_temperature=0.0,
                             image_temperature=0.0, text_vocab_size=TVS,
                             codebook_size=CB, mask_token=MASK)
    return ids, un_ids, lay, opts


def test_cached_interleave_exact_when_always_refreshing(model):
    cfg, params = model
    ids, un_ids, lay, opts = _setup()
    ref_ids, ref_codes = interleave_generate(
        params, cfg, jnp.asarray(ids)[None], jnp.asarray(un_ids)[None],
        lay, opts, key=None)
    got_ids, got_codes = interleave_generate_cached(
        params, cfg, jnp.asarray(ids)[None], jnp.asarray(un_ids)[None],
        lay, opts, refresh_interval=1, warmup_ratio=1.0, key=None)
    assert np.array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    assert np.array_equal(np.asarray(ref_codes), np.asarray(got_codes))


def test_cached_interleave_completes_with_real_schedule(model):
    cfg, params = model
    ids, un_ids, lay, opts = _setup()
    fin, codes = interleave_generate_cached(
        params, cfg, jnp.asarray(ids)[None], jnp.asarray(un_ids)[None],
        lay, opts, cache_ratio=0.5, refresh_interval=3, warmup_ratio=0.25,
        key=None)
    f = np.asarray(fin)[0]
    assert not np.any(f[lay.text_start:lay.text_end] == MASK)
    assert np.array_equal(f[:lay.code_start], ids[:lay.code_start])
    c = np.asarray(codes)[0]
    assert c.min() >= 0 and c.max() < CB


def test_cached_interleave_batched(model):
    """B>1 rows run independently through the shared 2B cache."""
    cfg, params = model
    ids, un_ids, lay, opts = _setup()
    rng = np.random.default_rng(0)
    ids2 = np.stack([ids, ids.copy()])
    ids2[1, 2:2 + N_VQ] = rng.integers(TVS, TVS + CB, N_VQ)  # input codes
    un2 = np.stack([un_ids, un_ids])
    fin2, codes2 = interleave_generate_cached(
        params, cfg, jnp.asarray(ids2), jnp.asarray(un2), lay, opts,
        refresh_interval=1, warmup_ratio=1.0, key=None)
    # rows equal their solo exact runs (always-refresh == exact)
    for r in range(2):
        f1, c1 = interleave_generate(
            params, cfg, jnp.asarray(ids2[r])[None],
            jnp.asarray(un2[r])[None], lay, opts, key=None)
        np.testing.assert_array_equal(np.asarray(fin2)[r], np.asarray(f1)[0])
        np.testing.assert_array_equal(np.asarray(codes2)[r],
                                      np.asarray(c1)[0])


def test_interleave_stepwise_matches_fused(model):
    """The streaming M sampler's final frame equals the fused exact
    sampler token-for-token (both consume _make_update_core)."""
    from mmada_parallel_tpu.samplers.stepwise import (
        interleave_generate_stepwise)

    cfg, params = model
    ids, un_ids, lay, opts = _setup()
    want_ids, want_codes = interleave_generate(
        params, cfg, jnp.asarray(ids)[None], jnp.asarray(un_ids)[None],
        lay, opts, key=None)
    frames = list(interleave_generate_stepwise(
        params, cfg, ids, un_ids, lay, opts, key=None, yield_every=3))
    assert frames[-1][0] == opts.text_steps
    # a mid-trajectory frame still has masked cells; the final one decodes
    # per the sampler contract (>=1 image cell may stay masked by design)
    assert frames[0][3].any()
    np.testing.assert_array_equal(frames[-1][1], np.asarray(want_ids)[0])
    np.testing.assert_array_equal(frames[-1][2], np.asarray(want_codes)[0])
