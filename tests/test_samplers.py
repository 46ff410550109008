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
            g = cond_vq.copy()
            if opts.cfg_scale != 0 and uncond_text is not None:
                u = ids.copy(); u[:len(uncond_text)] = uncond_text
                ut_vq = fwd(u)[img_pos, TVS:TVS + CB]
                g = g + opts.cfg_scale * (cond_vq - ut_vq)
            if opts.cfg_img != 0 and uncond_image is not None:
                u = ids.copy(); u[:len(uncond_image)] = uncond_image
                ui_vq = fwd(u)[img_pos, TVS:TVS + CB]
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


# ---------------------------------------------------------------------------
# M-variant interleave
# ---------------------------------------------------------------------------

TOK_M = tk.VariantMTokens(soi=251, eoi=250, bos=249, text_vocab_size=TVS,
                          codebook_size=CB)


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
    budgets = _ref_num_transfer(int((ids[ts:te] == MASK).sum()), steps)
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
