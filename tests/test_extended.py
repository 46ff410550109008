"""Tests for streaming samplers, mmu_fast, top-k/p, ParaRL, eval harness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models.llada import (LLaDAConfig, init_llada_params,
                                             llada_forward)
from mmada_parallel_tpu.ops import sampling as S
from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                        generate_ti2ti)
from mmada_parallel_tpu.samplers.stepwise import (generate_ti2ti_stepwise,
                                                  decode_text_with_masks)
from mmada_parallel_tpu.samplers.mmu import (MMUOptions, mmu_generate,
                                             mmu_generate_fast)
from mmada_parallel_tpu.training.pararl import (rollout_ti2ti,
                                                trajectory_log_prob,
                                                pararl_loss, RewardSpec)
from mmada_parallel_tpu.evaluation import EvalRequest, run_parabench_sweep

TVS, CB, MASK, NEWLINE = 256, 32, 250, 251
TOK = tk.VariantATokens(mask=MASK, newline=NEWLINE, answer_start=252,
                        answer_end=253, boi=254, eoi=255, uncondition=249,
                        pad=248, text_vocab_size=TVS, codebook_size=CB)


@pytest.fixture(scope="module")
def model():
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    return cfg, init_llada_params(jax.random.key(7), cfg)


def _req(prompt=(5, 6, 7, 8)):
    return tk.assemble_ti2ti_sequence(list(prompt), 8, 2, 3, [9], tokens=TOK)


def _opts(**kw):
    base = dict(text_steps=8, timesteps=4, temperature=0.0,
                text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0,
                text_vocab_size=TVS, codebook_size=CB, mask_token=MASK)
    base.update(kw)
    return TI2TIOptions(**base)


def test_stepwise_yields_progress(model):
    cfg, params = model
    ids, lay = _req()
    opts = _opts()
    frames = list(generate_ti2ti_stepwise(params, cfg, ids, lay, opts,
                                          yield_every=2))
    assert frames[-1][0] == opts.text_steps
    # masks decrease over frames
    masked_counts = [(f[1][lay.text_start:lay.text_end] == MASK).sum()
                     for f in frames]
    assert masked_counts[-1] == 0
    assert all(a >= b for a, b in zip(masked_counts, masked_counts[1:]))
    # codes valid
    assert frames[-1][2].min() >= 0 and frames[-1][2].max() < CB


def test_decode_text_with_masks():
    class Tok:
        def decode(self, ids, **kw):
            return "".join(chr(65 + i % 26) for i in ids)
    ids, lay = _req()
    s = decode_text_with_masks(ids, lay, Tok(), MASK)
    assert s == "▓" * 8  # all masked initially (run <= 10: app.py:121-122)


def test_decode_text_with_masks_reference_format():
    """Reference app rendering (app.py:110-140): short runs = one block per
    mask, runs > 10 compress to '▓▓▓▓▓[...n-5 more]'."""
    import dataclasses as _dc

    class Tok:
        def decode(self, ids, **kw):
            return "".join(chr(65 + i % 26) for i in ids)

    gh, gw = 2, 3
    prompt = [5, 6]
    ids, lay = tk.assemble_ti2ti_sequence(prompt, 16, gh, gw, [9], tokens=TOK)
    span = ids[lay.text_start:lay.text_end].copy()
    assert (span == MASK).all() and len(span) == 16
    # long all-masked run compresses
    s = decode_text_with_masks(ids, lay, Tok(), MASK)
    assert s == "▓" * 5 + "[...11 more]"
    # mixed: 2 real tokens, 3 masks, 1 real, rest masked (10 -> no compress)
    ids2 = ids.copy()
    ids2[lay.text_start + 0] = 0   # 'A'
    ids2[lay.text_start + 1] = 1   # 'B'
    ids2[lay.text_start + 5] = 2   # 'C'
    s2 = decode_text_with_masks(ids2, lay, Tok(), MASK)
    assert s2 == "AB" + "▓" * 3 + "C" + "▓" * 10


def test_stepwise_image_frames_mask_overlay_contract(model):
    """The demo contract the reference app renders (app.py:310-341): a
    mid-trajectory frame has still-masked latent cells (gray overlay
    targets), the final frame has at most the re-mask floor, and the masked
    set shrinks."""
    cfg, params = model
    ids, lay = _req()
    frames = list(generate_ti2ti_stepwise(params, cfg, ids, lay, _opts(),
                                          yield_every=2))
    img_masked = [f[3].sum() for f in frames]
    assert img_masked[0] > 0, "first frame must show masked cells"
    assert img_masked[-1] <= 1  # per-step re-mask keeps >= 1 until the end
    assert all(a >= b for a, b in zip(img_masked, img_masked[1:]))
    # still_masked marks exactly the MASK-token positions of the frame state
    step, ids_np, codes, still = frames[0]
    np.testing.assert_array_equal(
        still, ids_np[lay.image_positions()] == MASK)


def test_overlay_masked_patches_pixels():
    """Gray patches land exactly on the still-masked latent cells
    (app.py:315-341 semantics: RGBA fill (128,128,128,120))."""
    from PIL import Image
    from mmada_parallel_tpu.cli.demo import overlay_masked_patches

    gh, gw = 2, 3
    img = Image.new("RGB", (gw * 4, gh * 4), (255, 0, 0))
    still = np.zeros(gh * gw, bool)
    still[4] = True  # row 1, col 1
    out = np.asarray(overlay_masked_patches(img, still, (gh, gw)))
    ref = np.asarray(img)
    cell = out[4:8, 4:8]       # overlaid cell
    other = out[0:4, 0:4]      # untouched cell
    assert not np.array_equal(cell, ref[4:8, 4:8])
    # alpha-120 gray over red: red channel drops, green/blue rise
    assert (cell[..., 1] > 40).all() and (cell[..., 0] < 255).all()
    np.testing.assert_array_equal(other, ref[0:4, 0:4])


def test_mmu_fast_matches_slow_without_eot(model):
    cfg, params = model
    prompt = jnp.arange(20, 28, dtype=jnp.int32)[None]
    opts = MMUOptions(max_new_tokens=8, steps=8, block_length=4,
                      temperature=0.0, mask_token=MASK)
    slow = np.asarray(mmu_generate(params, cfg, prompt, opts, key=None))
    fast = np.asarray(mmu_generate_fast(params, cfg, prompt, opts,
                                        eot_token=None, key=None))
    assert np.array_equal(slow, fast)


def test_mmu_fast_early_exit(model):
    cfg, params = model
    prompt = jnp.arange(20, 28, dtype=jnp.int32)[None]
    opts = MMUOptions(max_new_tokens=8, steps=8, block_length=4,
                      temperature=0.0, mask_token=MASK)
    slow = np.asarray(mmu_generate(params, cfg, prompt, opts, key=None))
    eot = int(slow[0, 8 + 4 - 1])  # whatever the first block ends with
    fast = np.asarray(mmu_generate_fast(params, cfg, prompt, opts,
                                        eot_token=eot, key=None))
    # early exit: second block stays masked
    assert np.all(fast[0, 12:] == MASK)
    assert np.array_equal(fast[0, :12], slow[0, :12])


def test_mmu_ragged_padded_batch_matches_single(model):
    """A right-padded prompt with attn_mask ([B, P] prompt form) decodes
    exactly what its unpadded single run does — the batched-validation
    contract of cli/train_m._batched_mmu."""
    cfg, params = model
    opts = MMUOptions(max_new_tokens=8, steps=8, block_length=4,
                      temperature=0.0, mask_token=MASK)
    p1 = jnp.arange(20, 28, dtype=jnp.int32)[None]        # len 8
    p2 = jnp.arange(40, 45, dtype=jnp.int32)[None]        # len 5
    solo1 = np.asarray(mmu_generate(params, cfg, p1, opts, key=None))
    solo2 = np.asarray(mmu_generate(params, cfg, p2, opts, key=None))

    P = 8
    ids = np.full((2, P), 7, np.int32)
    mask = np.zeros((2, P), bool)
    ids[0], mask[0] = np.asarray(p1[0]), True
    ids[1, :5], mask[1, :5] = np.asarray(p2[0]), True
    both = np.asarray(mmu_generate(params, cfg, jnp.asarray(ids), opts,
                                   attn_mask=jnp.asarray(mask), key=None))
    np.testing.assert_array_equal(both[0, P:], solo1[0, 8:])
    np.testing.assert_array_equal(both[1, P:], solo2[0, 5:])


def test_top_k_top_p_filtering():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0, 0.0]])
    k2 = np.asarray(S.top_k_top_p_filtering(logits, top_k=2))
    assert (k2[0] > S.NEG_INF / 2).sum() == 2
    assert k2[0, 3] == 4.0 and k2[0, 2] == 3.0
    p = np.asarray(S.top_k_top_p_filtering(logits, top_p=0.5))
    # top token always kept
    assert p[0, 3] == 4.0
    probs = np.exp(np.asarray(logits[0]))
    probs /= probs.sum()
    # tokens with cumulative prob beyond 0.5 (after the first above) dropped
    assert p[0, 0] < S.NEG_INF / 2


def test_pararl_rollout_and_loss(model):
    cfg, params = model
    ids, lay = _req()
    opts = _opts(temperature=1.0, text_temperature=0.7)
    key = jax.random.key(0)
    final_ids, traj = jax.jit(
        lambda p, i, k: rollout_ti2ti(p, cfg, i, lay, opts, k))(
        params, jnp.asarray(ids)[None], key)
    assert traj["states"].shape == (opts.text_steps, 1, lay.total_len)
    # commits only happen at masked positions turning into tokens
    assert bool(traj["commit_mask"].any())

    lp = trajectory_log_prob(params, cfg, traj, opts,
                             step_indices=jnp.asarray([0, 3, 7]))
    assert lp.shape == (1,) and np.isfinite(float(lp[0]))
    assert float(lp[0]) < 0

    rewards = jnp.asarray([1.0])
    def loss_fn(p):
        return pararl_loss(p, cfg, traj, rewards, opts,
                           baseline=jnp.asarray(0.5),
                           step_indices=jnp.asarray([0, 3, 7]))[0]
    g = jax.grad(loss_fn)(params)
    gn = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_random_remasking_requires_key(model):
    cfg, params = model
    ids, lay = _req()
    opts = _opts(remasking="random")
    with pytest.raises(ValueError, match="PRNG key"):
        generate_ti2ti(params, cfg, jnp.asarray(ids)[None], lay, opts,
                       key=None)
    # with a key it runs and fills the text span
    fin, _ = generate_ti2ti(params, cfg, jnp.asarray(ids)[None], lay, opts,
                            key=jax.random.key(0))
    f = np.asarray(fin)[0]
    assert not np.any(f[lay.text_start:lay.text_end] == MASK)


def test_interleave_nonsquare_grid_layout():
    lay = tk.build_interleave_layout(10, num_vq_tokens=512, max_seq_length=8)
    assert lay.num_vq_tokens == 512
    assert lay.image_end - lay.image_start == 512


def test_decode_text_accepts_1d_and_2d(model):
    from mmada_parallel_tpu.samplers.parallel_ti2ti import decode_text
    ids, lay = _req()
    arr = np.asarray(ids).copy()
    arr[lay.text_start:lay.text_end] = 42
    opts = _opts()
    assert decode_text(arr, lay, opts) == [42] * 8
    assert decode_text(arr[None, :], lay, opts) == [42] * 8


def test_reward_spec_combines():
    spec = RewardSpec(fns=[lambda f, c, m: jnp.ones(2),
                           lambda f, c, m: jnp.full(2, 2.0)],
                      weights=[0.5, 0.25])
    out = np.asarray(spec(None, None))
    np.testing.assert_allclose(out, [1.0, 1.0])


def test_t2i_stepwise_streaming(model):
    from mmada_parallel_tpu.samplers.t2i import T2IOptions
    from mmada_parallel_tpu.samplers.stepwise import t2i_generate_stepwise
    cfg, params = model
    n_vq, plen = 6, 4
    ids = np.concatenate([np.arange(10, 10 + plen), [251],
                          np.full(n_vq, MASK), [250]]).astype(np.int32)
    un = ids.copy(); un[:plen] = 40
    opts = T2IOptions(timesteps=4, temperature=0.0, guidance_scale=1.5,
                      text_vocab_size=TVS, codebook_size=CB, mask_token=MASK)
    frames = list(t2i_generate_stepwise(params, cfg, ids, un, plen, n_vq,
                                        opts, key=None))
    assert len(frames) == 4
    # sampled codes always fill every slot (pre-remask, reference contract)
    assert all(0 <= f[1].min() and f[1].max() < CB for f in frames)
    # post-remask mask state keeps >=1 masked (reference keeps one to the end)
    masked = [f[2].sum() for f in frames]
    assert all(a >= b for a, b in zip(masked, masked[1:]))
    assert masked[-1] >= 1


def test_mask_tokens_schedule_variants():
    from mmada_parallel_tpu.training.masking import mask_tokens_schedule
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 32, (4, 16)))
    # random_replace: no MASK token, labels everywhere
    ii, ll, mp = mask_tokens_schedule(jax.random.key(0), toks,
                                      noise_type="random_replace",
                                      codebook_size=32, mask_token=999)
    assert not np.any(np.asarray(ii) == 999)
    assert not np.any(np.asarray(ll) == -100)
    # contiguous region: masked positions form a rectangle on the 4x4 grid
    ii2, ll2, _ = mask_tokens_schedule(jax.random.key(1), toks,
                                       mask_contiguous_region=True,
                                       mask_token=999)
    m = (np.asarray(ii2) == 999).reshape(4, 4, 4)
    for b in range(4):
        rows = np.nonzero(m[b].any(1))[0]
        cols = np.nonzero(m[b].any(0))[0]
        assert m[b][rows[0]:rows[-1] + 1, cols[0]:cols[-1] + 1].all()


def test_parabench_sweep(model):
    cfg, params = model
    reqs = [EvalRequest(prompt_ids=[5, 6, 7], meta={"i": i})
            for i in range(3)]
    out = run_parabench_sweep(
        params, cfg, reqs, grid_hw=(2, 3), text_gen_length=8,
        end_token_ids=[9], opts=_opts(), batch_size=2, tokens=TOK)
    assert out["num_requests"] == 3
    assert len(out["results"]) == 3
    assert out["results"][0]["meta"] == {"i": 0}
    assert out["edits_per_min"] > 0
    for r in out["results"]:
        assert r["codes"].shape == (6,)


def test_image_gen_trajectory_recording(model, tmp_path):
    """record_trajectory: the TPU-native equivalent of the reference's
    debug npy dumps (image_generation_generator.py:214-223)."""
    from mmada_parallel_tpu.samplers.image_gen import (
        ImageGenOptions, generate_image, dump_trajectory)
    cfg, params = model
    prompt = [5, 6, 7]
    ids, lay = tk.assemble_ti2ti_sequence(prompt, 0, 2, 3, [], tokens=TOK)
    opts = ImageGenOptions(timesteps=4, temperature=0.0, cfg_scale=0.0,
                           text_vocab_size=TVS, codebook_size=CB,
                           mask_token=MASK)
    fin, codes, traj = generate_image(params, cfg, jnp.asarray(ids)[None],
                                      lay, opts, key=None,
                                      record_trajectory=True,
                                      record_logits=True)
    assert traj["x"].shape[0] == 4               # one record per step
    assert traj["logits"].shape[-1] == CB
    # last recorded state equals the final ids
    np.testing.assert_array_equal(np.asarray(traj["x"])[-1],
                                  np.asarray(fin))
    # reference dump semantics (image_generation_generator.py:214-223):
    # vq_mask is the post-re-mask full-sequence x == mask_token
    np.testing.assert_array_equal(np.asarray(traj["vq_mask"]),
                                  np.asarray(traj["x"]) == MASK)
    # sampled_full sits in full token space (sampled + vocab_offset, :172)
    sf = np.asarray(traj["sampled_full"])
    assert sf.min() >= TVS and sf.max() < TVS + CB
    # masks monotonically shrink across steps
    m = np.asarray(traj["vq_mask"]).sum(axis=(1, 2))
    assert all(a >= b for a, b in zip(m, m[1:]))
    # cached path cannot record — explicit error instead of silent drop
    import pytest as _pytest
    with _pytest.raises(ValueError, match="use_cache"):
        generate_image(params, cfg, jnp.asarray(ids)[None], lay,
                       ImageGenOptions(timesteps=4, temperature=0.0,
                                       text_vocab_size=TVS, codebook_size=CB,
                                       mask_token=MASK, use_cache=True),
                       key=None, record_trajectory=True)
    dump_trajectory(traj, str(tmp_path / "dbg"))
    import os
    files = sorted(os.listdir(tmp_path / "dbg"))
    assert "step_0_x.npy" in files and "step_3_sampled_full.npy" in files
    assert np.load(tmp_path / "dbg" / "step_1_vq_mask.npy").dtype == bool


def test_a_losses_debug_stats(model):
    from mmada_parallel_tpu.training.losses import a_variant_losses
    cfg, params = model
    rng = np.random.default_rng(0)
    B, L, V = 2, 24, TVS + CB
    logits = jnp.asarray(rng.normal(size=(B, L, V)).astype(np.float32))
    ids = np.full((B, L), 7, np.int64)
    ids[:, 4] = 252   # answer_start
    ids[:, 20] = 253  # answer_end
    labels = np.where(rng.uniform(size=(B, L)) < 0.5,
                      rng.integers(0, V, (B, L)), -100)
    out = a_variant_losses(jnp.asarray(logits), jnp.asarray(ids),
                           jnp.asarray(labels),
                           answer_start_token=252, answer_end_token=253,
                           image_start_token=254, image_end_token=255,
                           newline_token=251, debug_stats=True)
    assert int(out["text_n_tokens"]) > 0
    assert float(out["text_loss_min"]) <= float(out["text_loss_max"])
    assert np.isfinite(float(out["loss"]))
