"""Seed-matched parity tests for the fused samplers at temperature 0.

The oracle is a literal numpy re-implementation of the reference step loops
(``parallel_generator.py:102-368``, ``modeling_mmada.py:118-248``) driven by
the same tiny model — deterministic at temp 0, so final token sequences must
match the fused lax.scan samplers exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models.llada import (
    LLaDAConfig, init_llada_params, llada_forward)
from mmada_parallel_tpu.samplers.parallel_ti2ti import (
    TI2TIOptions, generate_ti2ti)
from mmada_parallel_tpu.samplers.interleave import (
    InterleaveOptions, interleave_generate)

# Toy token space: text vocab [0, 256), codebook 32, specials inside text vocab
TVS, CB = 256, 32
MASK, NEWLINE = 250, 251
TOK_A = tk.VariantATokens(mask=MASK, newline=NEWLINE, answer_start=252,
                          answer_end=253, boi=254, eoi=255, uncondition=249,
                          pad=248, text_vocab_size=TVS, codebook_size=CB)


@pytest.fixture(scope="module")
def model():
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    params = init_llada_params(jax.random.key(7), cfg)

    def fwd(ids_1d):
        return np.asarray(
            llada_forward(params, cfg, jnp.asarray(ids_1d)[None]))[0]
    return cfg, params, fwd


def _ref_num_transfer(total, steps):
    remaining, out = total, []
    for s in range(steps):
        target = int(total * (1 - (s + 1) / steps))
        t = max(0, remaining - target)
        out.append(t)
        remaining -= t
    return out


def _ref_ti2ti(fwd, ids, layout, opts, uncond_text=None, uncond_image=None):
    """Literal numpy port of parallel_generator.py:102-344 at temp 0."""
    ids = np.asarray(ids).copy()
    ts, te = layout.text_start, layout.text_end
    steps = opts.text_steps
    budgets = _ref_num_transfer(int((ids[ts:te] == MASK).sum()), steps)
    sched = set(np.round(np.linspace(steps // 4, steps - 1,
                                     opts.timesteps)).astype(int).tolist())
    # image position mapping by scanning for newlines (reference style)
    img_pos = [i for i in range(layout.image_start, layout.image_end)
               if ids[i] != NEWLINE]

    for step in range(steps):
        logits = fwd(ids)  # [L, V]
        text_logits = logits[ts:te]
        masked = ids[ts:te] == MASK
        x0 = text_logits.argmax(-1)
        e = np.exp(text_logits - text_logits.max(-1, keepdims=True))
        p = e / e.sum(-1, keepdims=True)
        conf = np.take_along_axis(p, x0[:, None], -1)[:, 0]
        x0 = np.where(masked, x0, ids[ts:te])
        conf = np.where(masked, conf, -np.inf)
        k = budgets[step]
        if k > 0:
            sel = np.argsort(-conf, kind="stable")[:k]
            ids[ts:te][sel] = x0[sel]

        if step in sched:
            cur = ids[img_pos]
            unknown = cur == MASK
            codes = np.clip(cur - TVS, 0, CB - 1)
            cond_vq = logits[img_pos, TVS:TVS + CB]
            # reference gating (parallel_generator.py:243-281): forwards are
            # built when any (scale>0, prefix) pair exists; a missing prefix
            # inside the branch falls back to a clone (== cond); outside the
            # branch uncond logits are zeros
            build = ((opts.cfg_scale > 0 and uncond_text is not None)
                     or (opts.cfg_img > 0 and uncond_image is not None))
            if build:
                if uncond_text is not None:
                    u = ids.copy(); u[:len(uncond_text)] = uncond_text
                    ut_vq = fwd(u)[img_pos, TVS:TVS + CB]
                else:
                    ut_vq = fwd(ids.copy())[img_pos, TVS:TVS + CB]
                if uncond_image is not None:
                    u = ids.copy(); u[:len(uncond_image)] = uncond_image
                    ui_vq = fwd(u)[img_pos, TVS:TVS + CB]
                else:
                    ui_vq = fwd(ids.copy())[img_pos, TVS:TVS + CB]
            else:
                ut_vq = np.zeros_like(cond_vq)
                ui_vq = np.zeros_like(cond_vq)
            g = cond_vq.copy()
            if opts.cfg_scale != 0:
                g = g + opts.cfg_scale * (cond_vq - ut_vq)
            if opts.cfg_img != 0:
                g = g + opts.cfg_img * (cond_vq - ui_vq)
            sampled = g.argmax(-1)  # temp 0
            sampled = np.where(unknown, sampled, codes)
            e = np.exp(g - g.max(-1, keepdims=True))
            p = e / e.sum(-1, keepdims=True)
            sel_p = np.take_along_axis(p, sampled[:, None], -1)[:, 0]
            sel_p = np.where(unknown, sel_p, np.finfo(np.float32).max)
            ratio = (step + 1) / steps
            mask_ratio = np.cos(ratio * np.pi / 2)
            mask_len = int(np.floor(len(img_pos) * mask_ratio))
            mask_len = max(1, min(int(unknown.sum()) - 1, mask_len))
            order = np.argsort(np.log(sel_p + 1e-10), kind="stable")
            remask = np.zeros(len(img_pos), bool)
            remask[order[:mask_len]] = True
            ids[img_pos] = np.where(remask, MASK, sampled + TVS)
    return ids


def _layout_and_ids():
    gh, gw = 2, 3
    prompt = [5, 6, 7, 8]
    ids, lay = tk.assemble_ti2ti_sequence(prompt, text_gen_length=8,
                                          grid_h=gh, grid_w=gw,
                                          end_token_ids=[9], tokens=TOK_A)
    return ids, lay


@pytest.mark.parametrize("cfg_scale,cfg_img", [(0.0, 0.0), (0.0, 2.0),
                                               (1.5, 2.0)])
def test_ti2ti_matches_reference_loop(model, cfg_scale, cfg_img):
    cfg, params, fwd = model
    ids, lay = _layout_and_ids()
    opts = TI2TIOptions(text_steps=8, timesteps=4, temperature=0.0,
                        text_temperature=0.0, cfg_scale=cfg_scale,
                        cfg_img=cfg_img, text_vocab_size=TVS,
                        codebook_size=CB, mask_token=MASK)
    un_text = np.array([40, 41, 42], dtype=np.int32)
    un_img = np.array([50, 51], dtype=np.int32)

    want = _ref_ti2ti(fwd, ids, lay, opts,
                      uncond_text=un_text if cfg_scale else None,
                      uncond_image=un_img if cfg_img else None)

    got_ids, got_codes = generate_ti2ti(
        params, cfg, jnp.asarray(ids)[None], lay, opts,
        uncond_text_prefix=un_text if cfg_scale else None,
        uncond_image_prefix=un_img if cfg_img else None, key=None)
    got = np.asarray(got_ids)[0]

    assert np.array_equal(got, want), (
        f"mismatch at {np.nonzero(got != want)[0]}")
    # codes consistent with final ids
    assert np.array_equal(np.asarray(got_codes)[0],
                          np.clip(got[lay.image_positions()] - TVS, 0, CB - 1))


def test_ti2ti_cfg_without_prefix_amplifies(model):
    """Reference edge case: cfg_img>0 with NO prefixes -> uncond logits are
    zeros and cond is amplified by (1 + cfg_img)."""
    cfg, params, fwd = model
    ids, lay = _layout_and_ids()
    opts = TI2TIOptions(text_steps=8, timesteps=4, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=2.0,
                        text_vocab_size=TVS, codebook_size=CB,
                        mask_token=MASK)
    want = _ref_ti2ti(fwd, ids, lay, opts, uncond_text=None,
                      uncond_image=None)
    got_ids, _ = generate_ti2ti(params, cfg, jnp.asarray(ids)[None], lay,
                                opts, key=None)
    got = np.asarray(got_ids)[0]
    assert np.array_equal(got, want), (
        f"mismatch at {np.nonzero(got != want)[0]}")
    # and amplification differs from the cfg=0 trajectory
    opts0 = TI2TIOptions(text_steps=8, timesteps=4, temperature=0.0,
                         text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0,
                         text_vocab_size=TVS, codebook_size=CB,
                         mask_token=MASK)
    base_ids, _ = generate_ti2ti(params, cfg, jnp.asarray(ids)[None], lay,
                                 opts0, key=None)
    # at temp 0 amplification preserves argmax but changes re-mask
    # confidences; trajectories may or may not diverge for a tiny model —
    # only the oracle equality above is the contract.
    assert base_ids.shape == got_ids.shape


def test_ti2ti_fills_text_and_image(model):
    cfg, params, fwd = model
    ids, lay = _layout_and_ids()
    opts = TI2TIOptions(text_steps=8, timesteps=4, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0,
                        text_vocab_size=TVS, codebook_size=CB, mask_token=MASK)
    got_ids, codes = generate_ti2ti(params, cfg, jnp.asarray(ids)[None],
                                    lay, opts, key=None)
    got = np.asarray(got_ids)[0]
    # all text positions unmasked after the full schedule
    assert not np.any(got[lay.text_start:lay.text_end] == MASK)
    # prompt untouched
    assert np.array_equal(got[:lay.code_start], ids[:lay.code_start])
    # newline positions untouched inside image span
    nl = tk.newline_mask_for_grid(lay.grid_h, lay.grid_w)
    span = got[lay.image_start:lay.image_end]
    assert np.all(span[nl] == NEWLINE)
    assert np.asarray(codes).shape == (1, lay.num_vq_tokens)


def test_ti2ti_padded_batch_matches_unpadded_single(model):
    """Ragged batched serving: a request right-padded inside its prompt (with
    attn_mask + re-ranked RoPE positions) must generate exactly the tokens of
    its unpadded single-row run (VERDICT r1 item 4; reference batch semantics
    modeling_xllmx_dimoo.py:53-62)."""
    cfg, params, fwd = model
    gh, gw = 2, 3
    opts = TI2TIOptions(text_steps=8, timesteps=4, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=2.0,
                        text_vocab_size=TVS, codebook_size=CB, mask_token=MASK)
    un_img = np.array([50, 51], dtype=np.int32)
    prompts = [[5, 6, 7, 8], [21, 22, 23, 24, 25, 26, 27]]
    plen = max(len(p) for p in prompts)

    # single unpadded runs
    singles = []
    for p in prompts:
        ids, lay = tk.assemble_ti2ti_sequence(p, 8, gh, gw, [9], tokens=TOK_A)
        fin, codes = generate_ti2ti(params, cfg, jnp.asarray(ids)[None], lay,
                                    opts, uncond_image_prefix=un_img, key=None)
        fin = np.asarray(fin)[0]
        text = [t for t in fin[lay.text_start:lay.text_end] if t != MASK]
        singles.append((text, np.asarray(codes)[0]))

    # padded batch
    rows, masks = [], []
    for p in prompts:
        padded = p + [TOK_A.pad] * (plen - len(p))
        ids, lay = tk.assemble_ti2ti_sequence(padded, 8, gh, gw, [9],
                                              tokens=TOK_A)
        m = np.ones(len(ids), bool)
        m[len(p):plen] = False
        rows.append(ids)
        masks.append(m)
    fin, codes = generate_ti2ti(
        params, cfg, jnp.asarray(np.stack(rows)), lay, opts,
        uncond_image_prefix=un_img, key=None,
        attn_mask=jnp.asarray(np.stack(masks)))
    fin = np.asarray(fin)
    codes = np.asarray(codes)
    for b, (want_text, want_codes) in enumerate(singles):
        got_text = [t for t in fin[b, lay.text_start:lay.text_end]
                    if t != MASK]
        assert got_text == want_text, f"row {b} text diverged"
        np.testing.assert_array_equal(codes[b], want_codes,
                                      err_msg=f"row {b} codes diverged")


def test_interleave_padded_batch_matches_unpadded_single(model):
    cfg, params, fwd = model
    opts = InterleaveOptions(text_steps=8, image_steps=4, text_cfg=1.5,
                             image_cfg=2.0, text_temperature=0.0,
                             image_temperature=0.0, text_vocab_size=TVS,
                             codebook_size=CB, mask_token=MASK)
    prompts = [[10, 11, 12], [30, 31, 32, 33, 34]]
    un_prompts = [[40, 41, 42], [60, 61, 62, 63, 64]]
    plen = max(len(p) for p in prompts)

    singles = []
    for p, u in zip(prompts, un_prompts):
        ids, lay = tk.assemble_interleave_sequence(p, 6, 8, tokens=TOK_M)
        un_ids, _ = tk.assemble_interleave_sequence(u, 6, 8, tokens=TOK_M)
        fin, codes = interleave_generate(
            params, cfg, jnp.asarray(ids)[None], jnp.asarray(un_ids)[None],
            lay, opts, key=None)
        fin = np.asarray(fin)[0]
        singles.append((fin[lay.text_start:lay.text_end].copy(),
                        np.asarray(codes)[0]))

    rows, un_rows, masks = [], [], []
    for p, u in zip(prompts, un_prompts):
        pad_n = plen - len(p)
        ids, lay = tk.assemble_interleave_sequence(
            p + [0] * pad_n, 6, 8, tokens=TOK_M)
        un_ids, _ = tk.assemble_interleave_sequence(
            u + [0] * pad_n, 6, 8, tokens=TOK_M)
        m = np.ones(len(ids), bool)
        m[len(p):plen] = False
        rows.append(ids); un_rows.append(un_ids); masks.append(m)
    fin, codes = interleave_generate(
        params, cfg, jnp.asarray(np.stack(rows)),
        jnp.asarray(np.stack(un_rows)), lay, opts, key=None,
        attn_mask=jnp.asarray(np.stack(masks)))
    fin = np.asarray(fin)
    codes = np.asarray(codes)
    for b, (want_text, want_codes) in enumerate(singles):
        np.testing.assert_array_equal(
            fin[b, lay.text_start:lay.text_end], want_text,
            err_msg=f"row {b} text diverged")
        np.testing.assert_array_equal(codes[b], want_codes,
                                      err_msg=f"row {b} codes diverged")


# ---------------------------------------------------------------------------
# M-variant interleave
# ---------------------------------------------------------------------------

TOK_M = tk.VariantMTokens(soi=251, eoi=250, bos=249, text_vocab_size=TVS,
                          codebook_size=CB)


def _ref_num_transfer_m(total, steps):
    """Literal port of modeling_mmada.py:63-81 (front-loaded remainder)."""
    base, rem = total // steps, total % steps
    return [base + (1 if s < rem else 0) for s in range(steps)]


def _ref_interleave(fwd, ids, un_ids, layout, opts):
    """Literal numpy port of modeling_mmada.py:160-241 at temp 0 (argmax
    image sampling in place of multinomial)."""
    ids = np.asarray(ids).copy()
    un_prompt = np.asarray(un_ids)[:layout.code_start].copy()
    ts, te = layout.text_start, layout.text_end
    ist, ien = layout.image_start, layout.image_end
    msl = te - ts
    n_vq = ien - ist
    steps = opts.text_steps
    budgets = _ref_num_transfer_m(int((ids[ts:te] == MASK).sum()), steps)
    sched = set(np.round(np.linspace(steps // 4, steps - 1,
                                     opts.image_steps)).astype(int).tolist())
    for i in range(steps):
        masked = ids[ts:te] == MASK
        un = np.concatenate([un_prompt, ids[layout.code_start:]])
        cond = fwd(ids)
        uncond = fwd(un)
        guided = cond + opts.text_cfg * (uncond - cond)
        tl = guided[ts:te]
        x0 = tl.argmax(-1)
        e = np.exp(tl - tl.max(-1, keepdims=True)); p = e / e.sum(-1, keepdims=True)
        conf = np.take_along_axis(p, x0[:, None], -1)[:, 0]
        x0 = np.where(masked, x0, ids[ts:te])
        conf = np.where(masked, conf, -np.inf)
        k = budgets[i]
        if k > 0:
            sel = np.argsort(-conf, kind="stable")[:k]
            ids[ts:te][sel] = x0[sel]
        if i in sched:
            cur = ids[ist:ien]
            unknown = cur == MASK
            codes = cur - TVS
            g = ((1 + opts.image_cfg) * cond[ist:ien, TVS:TVS + CB]
                 - opts.image_cfg * uncond[ist:ien, TVS:TVS + CB])
            sampled = g.argmax(-1)
            sampled = np.where(unknown, sampled, codes)
            e = np.exp(g - g.max(-1, keepdims=True)); p = e / e.sum(-1, keepdims=True)
            sel_p = np.take_along_axis(p, np.clip(sampled, 0, CB - 1)[:, None], -1)[:, 0]
            sel_p = np.where(unknown, sel_p, np.finfo(np.float32).max)
            ratio = (i + 1) / steps
            mask_len = int(np.floor(n_vq * np.cos(ratio * np.pi / 2)))
            mask_len = max(1, min(int(unknown.sum()) - 1, mask_len))
            conf_m = np.log(np.clip(sel_p, 1e-20, None))
            cutoff = np.sort(conf_m)[mask_len]
            remask = conf_m < cutoff
            ids[ist:ien] = np.where(remask, MASK, sampled + TVS)
    return ids


def test_interleave_matches_reference_loop(model):
    cfg, params, fwd = model
    prompt = [10, 11, 12, 13, 14]
    ids, lay = tk.assemble_interleave_sequence(prompt, num_vq_tokens=6,
                                               max_seq_length=8, tokens=TOK_M)
    un_ids, _ = tk.assemble_interleave_sequence([30, 31, 32, 33, 34],
                                                num_vq_tokens=6,
                                                max_seq_length=8, tokens=TOK_M)
    opts = InterleaveOptions(text_steps=8, image_steps=4, text_cfg=1.5,
                             image_cfg=2.0, text_temperature=0.0,
                             image_temperature=0.0, text_vocab_size=TVS,
                             codebook_size=CB, mask_token=MASK)
    want = _ref_interleave(fwd, ids, un_ids, lay, opts)
    got_ids, codes = interleave_generate(
        params, cfg, jnp.asarray(ids)[None], jnp.asarray(un_ids)[None],
        lay, opts, key=None)
    got = np.asarray(got_ids)[0]
    assert np.array_equal(got, want), (
        f"mismatch at {np.nonzero(got != want)[0]}")
    assert np.asarray(codes).shape == (1, 6)


# ---------------------------------------------------------------------------
# A-variant pure image generation (MaskGit) and M mmu / t2i
# ---------------------------------------------------------------------------

from mmada_parallel_tpu.samplers.image_gen import ImageGenOptions, generate_image
from mmada_parallel_tpu.samplers.t2i import T2IOptions, t2i_generate
from mmada_parallel_tpu.samplers.mmu import MMUOptions, mmu_generate


def _ref_generate_image(fwd, ids, layout, opts, uncond=None):
    """Literal numpy port of image_generation_generator.py:15-251 at temp 0."""
    x = np.asarray(ids).copy()
    img_pos = [i for i in range(layout.image_start, layout.image_end)
               if x[i] != NEWLINE]
    T = opts.timesteps
    vq_len0 = int((x[img_pos] == MASK).sum())
    for step in range(T):
        masked = x[img_pos] == MASK
        if masked.sum() == 0:
            break
        cond = fwd(x)[img_pos, TVS:TVS + CB]
        if opts.cfg_scale > 0 and uncond is not None:
            tail = x[layout.code_start:]
            un = np.concatenate([uncond, tail])
            un_pos = [p - layout.code_start + len(uncond) for p in img_pos]
            ug = fwd(un)[un_pos, TVS:TVS + CB]
            logits = (1 + opts.cfg_scale) * cond - opts.cfg_scale * ug
        else:
            logits = cond
        # only masked positions are sampled in the reference
        ml = logits[masked]
        sampled = ml.argmax(-1)
        e = np.exp(ml - ml.max(-1, keepdims=True)); p = e / e.sum(-1, keepdims=True)
        conf = np.take_along_axis(p, sampled[:, None], -1)[:, 0]
        pos_arr = np.asarray(img_pos)[masked]
        x[pos_arr] = sampled + TVS
        if step < T - 1:
            frac = np.cos(np.pi / 2 * (step + 1) / T)
            keep_n = max(1, int(np.floor(vq_len0 * frac)))
        else:
            keep_n = 0
        k = min(keep_n, len(conf) - 1)
        c = np.log(np.clip(conf, 1e-20, None))
        cutoff = np.sort(c)[k]
        remask = c < cutoff
        x[pos_arr[remask]] = MASK
    return x


def test_generate_image_matches_reference_loop(model):
    cfg, params, fwd = model
    ids, lay = _layout_and_ids()
    for cfg_scale, uncond in [(0.0, None), (2.0, np.array([60, 61, 62], np.int32))]:
        opts = ImageGenOptions(timesteps=6, temperature=0.0, cfg_scale=cfg_scale,
                               text_vocab_size=TVS, codebook_size=CB,
                               mask_token=MASK)
        want = _ref_generate_image(fwd, ids, lay, opts, uncond)
        got_ids, codes = generate_image(params, cfg, jnp.asarray(ids)[None],
                                        lay, opts, uncond_ids=uncond, key=None)
        got = np.asarray(got_ids)[0]
        assert np.array_equal(got, want), (
            f"cfg={cfg_scale}: mismatch at {np.nonzero(got != want)[0]}")


def _ref_mmu(fwd, prompt, opts):
    """Literal numpy port of modeling_mmada.py:618-691 at temp 0, no CFG."""
    x = np.concatenate([prompt, np.full(opts.max_new_tokens, MASK)])
    P = len(prompt)
    nb = opts.max_new_tokens // opts.block_length
    spb = opts.steps // nb
    for b in range(nb):
        budgets = _ref_num_transfer_m(opts.block_length, spb)
        for i in range(spb):
            mask_index = x == MASK
            logits = fwd(x)
            x0 = logits.argmax(-1)
            e = np.exp(logits - logits.max(-1, keepdims=True))
            p = e / e.sum(-1, keepdims=True)
            conf = np.take_along_axis(p, x0[:, None], -1)[:, 0]
            conf[P + (b + 1) * opts.block_length:] = -np.inf
            x0 = np.where(mask_index, x0, x)
            conf = np.where(mask_index, conf, -np.inf)
            k = budgets[i]
            if k > 0:
                sel = np.argsort(-conf, kind="stable")[:k]
                x[sel] = x0[sel]
    return x


def test_mmu_generate_matches_reference_loop(model):
    cfg, params, fwd = model
    prompt = np.arange(20, 30, dtype=np.int32)
    opts = MMUOptions(max_new_tokens=8, steps=8, block_length=4,
                      temperature=0.0, cfg_scale=0.0, mask_token=MASK)
    want = _ref_mmu(fwd, prompt, opts)
    got = np.asarray(mmu_generate(params, cfg, jnp.asarray(prompt)[None],
                                  opts, key=None))[0]
    assert np.array_equal(got, want), (
        f"mismatch at {np.nonzero(got != want)[0]}")
    assert not np.any(got == MASK)


def test_baseline_config1_256px_edit_fp32_cpu():
    """BASELINE.json config #1: 256x256 edit, timesteps=8, text_steps=16,
    cfg=0, fp32 CPU — the real token space (full 134548 vocab, 16x16 grid)
    on a thin backbone."""
    T = tk.TOKENS_A
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=T.full_vocab_size,
                           mask_token_id=T.mask)
    params = init_llada_params(jax.random.key(11), cfg)
    _, _, gh, gw = tk.calculate_vq_params(256, 256, 16)
    assert (gh, gw) == (16, 16)
    prompt = list(range(1000, 1016))
    in_img = [T.vq_offset + 3] * (gh * (gw + 1))
    con = prompt[:-1] + [T.boi] + in_img + [T.eoi] + prompt[-1:]
    ids, lay = tk.assemble_ti2ti_sequence(con, 32, gh, gw, [T.answer_end])
    opts = TI2TIOptions(text_steps=16, timesteps=8, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0)
    fin, codes = generate_ti2ti(params, cfg, jnp.asarray(ids)[None], lay,
                                opts, key=None)
    f = np.asarray(fin)[0]
    # prompt + input image untouched; text fully decoded into text vocab
    assert np.array_equal(f[:lay.code_start], ids[:lay.code_start])
    text = f[lay.text_start:lay.text_end]
    assert not np.any(text == T.mask)
    # output image slots are VQ tokens or (for the held-back slot) MASK->fill
    c = np.asarray(codes)[0]
    assert c.shape == (256,) and c.min() >= 0 and c.max() < T.codebook_size


def test_t2i_generate_shape_and_fill(model):
    cfg, params, fwd = model
    n_vq, plen = 6, 5
    prompt = np.arange(10, 10 + plen, dtype=np.int32)
    ids = np.concatenate([prompt, [251], np.full(n_vq, MASK), [250]])
    un = np.concatenate([np.full(plen, 40), [251], np.full(n_vq, MASK), [250]])
    opts = T2IOptions(timesteps=4, temperature=0.0, guidance_scale=1.5,
                      text_vocab_size=TVS, codebook_size=CB, mask_token=MASK)
    codes = t2i_generate(params, cfg, jnp.asarray(ids)[None],
                         jnp.asarray(un)[None], prompt_len=plen,
                         num_vq_tokens=n_vq, opts=opts, key=None)
    c = np.asarray(codes)
    assert c.shape == (1, n_vq)
    assert c.min() >= 0 and c.max() < CB
