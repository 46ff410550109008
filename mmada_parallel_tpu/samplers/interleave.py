"""Variant-M interleave generation as one fused scan.

Mirrors ``MMaDA-Parallel-M/models/modeling_mmada.py:118-248``
(``interleave_generate``): per step ONE batched forward of
``cat([cond, uncond])``; text guidance ``cond + text_cfg*(uncond - cond)``
(note the sign — it differs from A's convention and from the image CFG, and
is preserved as-is, ``modeling_mmada.py:179``); image guidance
``(1+image_cfg)*cond - image_cfg*uncond`` over the codebook slice
(``:216``); image refresh on ``linspace(text_steps//4, text_steps-1,
image_steps)``; confidence top-k text transfer + MaskGit cosine re-mask with
the M-style strict-cutoff ``mask_by_random_topk`` (``models/sampling.py:31``).

The uncond row shares the output region with the cond row *before* each
step's updates (the reference rebuilds ``combined_uncond`` from the current
ids at the top of the loop, ``modeling_mmada.py:168-172``), so cond+uncond
batch into one forward exactly as the reference does.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmada_parallel_tpu.models.llada import (LLaDAConfig, llada_head,
                                             llada_hidden,
                                             llada_hidden_with_cache,
                                             llada_hidden_partial)
from mmada_parallel_tpu.ops import sampling as S
from mmada_parallel_tpu.tokens import SequenceLayout

__all__ = ["InterleaveOptions", "interleave_generate",
           "interleave_generate_cached", "make_interleave_heads"]


@dataclasses.dataclass(frozen=True)
class InterleaveOptions:
    """Defaults = ``MMaDA-Parallel-M/inference.py:114-124``."""

    text_steps: int = 128
    image_steps: int = 30
    text_cfg: float = 2.5
    image_cfg: float = 4.0
    text_temperature: float = 0.0
    image_temperature: float = 1.0
    remasking: str = "low_confidence"
    schedule: str = "cosine"
    text_vocab_size: int = 126464         # len(text_tokenizer)
    codebook_size: int = 8192
    mask_token: int = 126336


def make_interleave_heads(params, cfg, layout, opts, mask2b=None, pos2b=None,
                          hidden_fn=None):
    """Batched cond+uncond forward -> (full-vocab text logits,
    codebook-slice image logits) — the per-step forward shared by the
    fused sampler and the streaming stepwise variant.

    ``hidden_fn`` swaps the backbone (``llada_hidden`` signature), e.g.
    :func:`mmada_parallel_tpu.parallel.tp_overlap.ring_hidden_fn` for
    multi-chip tensor parallelism (requires ``layout.total_len``
    divisible by the TP degree)."""
    ts, te = layout.text_start, layout.text_end
    ist, ien = layout.image_start, layout.image_end
    tvs, cb = opts.text_vocab_size, opts.codebook_size
    if hidden_fn is None:
        hidden_fn = llada_hidden

    def heads(ids2b):
        hidden = hidden_fn(params, cfg, ids2b, mask2b, pos2b)
        text_h = jax.lax.dynamic_slice_in_dim(hidden, ts, te - ts, axis=1)
        text_logits = llada_head(params, cfg, text_h)
        img_h = jax.lax.dynamic_slice_in_dim(hidden, ist, ien - ist, axis=1)
        vq_logits = llada_head(params, cfg, img_h, vocab_slice=(tvs, cb))
        return text_logits, vq_logits

    return heads


def _make_update_core(opts, layout, mask_ratios, img_temps, img_step):
    """The per-step text transfer + scheduled image refresh, shared by the
    exact and cached samplers.  Consumes pre-computed cond/uncond logits so
    the forward strategy is the only difference between the two."""
    ts, te = layout.text_start, layout.text_end
    max_seq = te - ts
    ist, ien = layout.image_start, layout.image_end
    n_vq = ien - ist
    tvs, cb = opts.text_vocab_size, opts.codebook_size

    def apply_updates(ids, last_sampled, cond_t, uncond_t, cond_v, uncond_v,
                      step_idx, budget, keys, have_key):
        # --- text update (modeling_mmada.py:179-209) ---
        guided = cond_t + opts.text_cfg * (uncond_t - cond_t)
        cur = jax.lax.dynamic_slice_in_dim(ids, ts, max_seq, axis=1)
        masked = cur == opts.mask_token
        x0 = S.gumbel_argmax(
            guided, opts.text_temperature,
            keys[1] if (have_key and opts.text_temperature != 0) else None)
        if opts.remasking == "low_confidence":
            conf = S.token_confidence(guided, x0)
        else:
            # independent stream from the sampling noise (keys[1])
            conf = jax.random.uniform(keys[4], x0.shape)
        x0 = jnp.where(masked, x0, cur)
        conf = jnp.where(masked, conf, S.NEG_INF)
        transfer = S.topk_transfer_mask(conf, budget)
        ids = jax.lax.dynamic_update_slice_in_dim(
            ids, jnp.where(transfer, x0, cur), ts, axis=1)

        # --- scheduled image refresh (modeling_mmada.py:211-241) ---
        def do_image(ids, last_sampled):
            cur_img = jax.lax.dynamic_slice_in_dim(ids, ist, n_vq, axis=1)
            unknown = cur_img == opts.mask_token
            cur_codes = cur_img - tvs  # known tokens are offset codes

            img_logits = ((1 + opts.image_cfg) * cond_v
                          - opts.image_cfg * uncond_v)
            sampled = S.categorical_sample(
                keys[2] if have_key else None, img_logits,
                temperature_is_zero=(opts.image_temperature == 0))
            sampled = jnp.where(unknown, sampled, cur_codes)

            probs = jax.nn.softmax(img_logits, axis=-1)
            sel = jnp.take_along_axis(
                probs, jnp.clip(sampled, 0, cb - 1)[..., None],
                axis=-1)[..., 0]
            sel = jnp.where(unknown, sel, jnp.finfo(sel.dtype).max)

            mask_len = jnp.floor(
                n_vq * mask_ratios[step_idx]).astype(jnp.int32)
            mask_len = jnp.maximum(
                1, jnp.minimum(unknown.sum(axis=-1) - 1, mask_len))
            remask = S.remask_below_cutoff(
                keys[3] if (have_key and opts.image_temperature != 0)
                else None,
                mask_len, sel, img_temps[step_idx])

            new_img = jnp.where(remask, opts.mask_token, sampled + tvs)
            return (jax.lax.dynamic_update_slice_in_dim(ids, new_img, ist,
                                                        axis=1),
                    sampled.astype(last_sampled.dtype))

        ids, last_sampled = jax.lax.cond(
            img_step[step_idx], do_image, lambda i, s: (i, s),
            ids, last_sampled)
        return ids, last_sampled

    return apply_updates


def interleave_generate(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    uncond_input_ids: jax.Array,
    layout: SequenceLayout,
    opts: InterleaveOptions = InterleaveOptions(),
    key: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    uncond_attn_mask: Optional[jax.Array] = None,
    hidden_fn=None,
) -> Tuple[jax.Array, jax.Array]:
    """Returns ``(final_ids [B, L], image_codes [B, N_vq])``.

    ``input_ids``/``uncond_input_ids`` are full assembled sequences of equal
    length (:func:`mmada_parallel_tpu.tokens.assemble_interleave_sequence`);
    the uncond prompt region is the only part of ``uncond_input_ids`` read —
    the output region is refreshed from the cond row each step.

    ``attn_mask``: optional ``[B, L]`` bool (True = real token) for ragged
    batches padded inside the prompt region; pads are hidden from attention
    and RoPE positions are re-ranked.  ``uncond_attn_mask`` gives the
    uncond rows their own pad pattern (the empty prompt is shorter than the
    instruction); defaults to ``attn_mask``.
    """
    if opts.remasking == "random" and key is None:
        raise ValueError("remasking='random' requires a PRNG key")
    B, L = input_ids.shape
    ts, te = layout.text_start, layout.text_end
    max_seq = te - ts
    ist, ien = layout.image_start, layout.image_end
    n_vq = ien - ist
    prompt_len = layout.code_start
    tvs, cb = opts.text_vocab_size, opts.codebook_size

    steps = opts.text_steps
    sched = S.get_mask_schedule(opts.schedule)
    ratios = (jnp.arange(steps, dtype=jnp.float32) + 1) / steps
    mask_ratios = sched(ratios)
    img_temps = opts.image_temperature * (1.0 - ratios)
    img_step = S.image_step_mask(steps, opts.image_steps)

    masked0 = (input_ids[:, ts:te] == opts.mask_token).sum(axis=1)
    # M uses the front-loaded remainder schedule (modeling_mmada.py:63-81),
    # unlike A's target-based one.
    budgets = S.get_num_transfer_tokens_frontloaded(masked0, steps)  # [B, steps]

    uncond_prompt = uncond_input_ids[:, :prompt_len]

    if attn_mask is not None or uncond_attn_mask is not None:
        from mmada_parallel_tpu.ops.masks import ragged_positions
        cm = (attn_mask if attn_mask is not None
              else jnp.ones(input_ids.shape, jnp.bool_))
        un_mask = cm if uncond_attn_mask is None else uncond_attn_mask
        mask2b = jnp.concatenate([cm, un_mask], axis=0)
        pos2b = jnp.concatenate([ragged_positions(cm),
                                 ragged_positions(un_mask)], axis=0)
    else:
        mask2b = pos2b = None

    heads = make_interleave_heads(params, cfg, layout, opts, mask2b, pos2b,
                                  hidden_fn)

    apply_updates = _make_update_core(opts, layout, mask_ratios, img_temps,
                                      img_step)

    def step_fn(carry, xs):
        ids, last_sampled, k = carry
        step_idx, budget = xs
        keys = jax.random.split(k, 5) if k is not None else (None,) * 5
        next_key = keys[0] if k is not None else None

        uncond_ids = jnp.concatenate(
            [uncond_prompt, ids[:, prompt_len:]], axis=1)
        both = jnp.concatenate([ids, uncond_ids], axis=0)
        text_logits2, vq_logits2 = heads(both)

        ids, last_sampled = apply_updates(
            ids, last_sampled, text_logits2[:B], text_logits2[B:],
            vq_logits2[:B], vq_logits2[B:], step_idx, budget, keys,
            have_key=k is not None)
        return (ids, last_sampled, next_key), None

    # the reference returns the last image step's pre-remask sampled ids
    # (modeling_mmada.py:243-244), not the remasked sequence state
    sampled0 = jnp.zeros((B, n_vq), input_ids.dtype)
    (final_ids, last_sampled, _), _ = jax.lax.scan(
        step_fn, (input_ids, sampled0, key), (jnp.arange(steps), budgets.T))

    codes = jnp.clip(last_sampled, 0, cb - 1)
    return final_ids, codes


def interleave_generate_cached(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    uncond_input_ids: jax.Array,
    layout: SequenceLayout,
    opts: InterleaveOptions = InterleaveOptions(),
    cache_ratio: float = 0.95,
    refresh_interval: int = 4,
    warmup_ratio: float = 0.25,
    refresh_on_image_steps: bool = True,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Interleave generation with the adaptive feature cache — the M-family
    counterpart of :func:`~mmada_parallel_tpu.samplers.parallel_ti2ti.\
generate_ti2ti_cached` (an opt-in approximation; the exact parity path is
    :func:`interleave_generate`).

    Full cond+uncond forwards run during warmup, every
    ``refresh_interval``-th step, and (by default) on every scheduled image
    step.  In between, only the text span (it evolves every step) plus the
    ``ceil((1 - cache_ratio) * n_vq)`` lowest-confidence image slots are
    recomputed through :func:`llada_hidden_partial` against the shared
    ``[n_layers, 2B, L]`` k/v cache; logits elsewhere are reused.  With
    ``refresh_interval=1`` every step refreshes and the trajectory equals
    the exact sampler's.

    No ragged ``attn_mask`` support — serve cached requests unpadded.
    With ``refresh_on_image_steps=True`` the step AFTER each image step
    also refreshes (``do_image`` rewrites the image span at the end of the
    step, invalidating the cached k/v); ``False`` accepts that staleness
    for more speed.
    """
    if opts.remasking == "random" and key is None:
        raise ValueError("remasking='random' requires a PRNG key")
    B, L = input_ids.shape
    ts, te = layout.text_start, layout.text_end
    max_seq = te - ts
    ist, ien = layout.image_start, layout.image_end
    n_vq = ien - ist
    prompt_len = layout.code_start
    tvs, cb = opts.text_vocab_size, opts.codebook_size
    n_compute = max(int(np.ceil((1.0 - cache_ratio) * n_vq)), 1)

    steps = opts.text_steps
    sched = S.get_mask_schedule(opts.schedule)
    ratios = (jnp.arange(steps, dtype=jnp.float32) + 1) / steps
    mask_ratios = sched(ratios)
    img_temps = opts.image_temperature * (1.0 - ratios)
    img_step = S.image_step_mask(steps, opts.image_steps)

    masked0 = (input_ids[:, ts:te] == opts.mask_token).sum(axis=1)
    budgets = S.get_num_transfer_tokens_frontloaded(masked0, steps)

    uncond_prompt = uncond_input_ids[:, :prompt_len]
    apply_updates = _make_update_core(opts, layout, mask_ratios, img_temps,
                                      img_step)

    # static refresh schedule
    warmup_step = int(steps * warmup_ratio)
    refresh = np.zeros(steps, bool)
    for s in range(steps):
        if s <= warmup_step or (s - warmup_step) % refresh_interval == 0:
            refresh[s] = True
    if refresh_on_image_steps:
        # static numpy twin of S.image_step_mask (jnp output may be a
        # tracer when this function itself runs under jit)
        img_np = np.zeros(steps, bool)
        img_np[np.round(np.linspace(steps // 4, steps - 1,
                                    opts.image_steps)).astype(int)] = True
        # refresh on the image step AND the step after it: do_image
        # rewrites (nearly) the whole image span at the END of the step,
        # invalidating the cached k/v — generate_ti2ti_cached refreshes
        # post-image for the same reason.  refresh_on_image_steps=False
        # accepts this staleness as part of the aggressive trade (the
        # README agreement envelope is measured with it).
        refresh |= img_np
        refresh[1:] |= img_np[:-1]
    refresh = jnp.asarray(refresh)

    text_pos = jnp.arange(ts, te, dtype=jnp.int32)          # static

    def full_branch(ids2b, state):
        hidden, cache = llada_hidden_with_cache(params, cfg, ids2b)
        text_h = jax.lax.dynamic_slice_in_dim(hidden, ts, max_seq, axis=1)
        text_logits = llada_head(params, cfg, text_h)
        img_h = jax.lax.dynamic_slice_in_dim(hidden, ist, n_vq, axis=1)
        vq_logits = llada_head(params, cfg, img_h, vocab_slice=(tvs, cb))
        return ({"cache": cache, "vq": vq_logits.astype(jnp.float32)},
                text_logits.astype(jnp.float32))

    def partial_branch(ids2b, state):
        B2 = 2 * B
        conf = state["vq"].max(axis=-1)                     # [2B, n_vq]
        sel_slot = jnp.argsort(conf, axis=-1)[:, :n_compute]
        sel_img_pos = (ist + sel_slot).astype(jnp.int32)
        pos = jnp.concatenate(
            [jnp.broadcast_to(text_pos[None, :], (B2, max_seq)),
             sel_img_pos], axis=1)                          # [2B, ms+n]
        sel_ids = jnp.take_along_axis(ids2b, pos, axis=1)
        h_sel, cache = llada_hidden_partial(params, cfg, sel_ids, pos,
                                            state["cache"])
        text_logits = llada_head(params, cfg, h_sel[:, :max_seq])
        vq_sel = llada_head(params, cfg, h_sel[:, max_seq:],
                            vocab_slice=(tvs, cb))
        # gather+select merge (TPU scatters serialize)
        bidx = jnp.arange(B2)[:, None]
        inv = jnp.zeros((B2, n_vq), jnp.int32).at[bidx, sel_slot].set(
            jnp.broadcast_to(jnp.arange(n_compute, dtype=jnp.int32),
                             sel_slot.shape))
        is_sel = jnp.zeros((B2, n_vq), bool).at[bidx, sel_slot].set(True)
        expanded = jnp.take_along_axis(vq_sel.astype(state["vq"].dtype),
                                       inv[:, :, None], axis=1, mode="clip")
        vq = jnp.where(is_sel[:, :, None], expanded, state["vq"])
        return ({"cache": cache, "vq": vq},
                text_logits.astype(jnp.float32))

    def step_fn(carry, xs):
        ids, last_sampled, k, state = carry
        step_idx, budget = xs
        keys = jax.random.split(k, 5) if k is not None else (None,) * 5
        next_key = keys[0] if k is not None else None

        uncond_ids = jnp.concatenate(
            [uncond_prompt, ids[:, prompt_len:]], axis=1)
        both = jnp.concatenate([ids, uncond_ids], axis=0)
        # text logits are a per-step OUTPUT of the cond, not carried state
        # (both branches recompute the full text span every step; carrying
        # the [2B, max_seq, V] fp32 buffer across the scan would waste
        # ~260 MB/row of HBM at the 8B vocab)
        state, text2 = jax.lax.cond(refresh[step_idx], full_branch,
                                    partial_branch, both, state)

        ids, last_sampled = apply_updates(
            ids, last_sampled, text2[:B], text2[B:],
            state["vq"][:B], state["vq"][B:], step_idx, budget, keys,
            have_key=k is not None)
        return (ids, last_sampled, next_key, state), None

    nkv, hd = cfg.effective_n_kv_heads, cfg.head_dim
    state0 = {
        "cache": {"k": jnp.zeros((cfg.n_layers, 2 * B, L, nkv * hd),
                                 cfg.compute_dtype),
                  "v": jnp.zeros((cfg.n_layers, 2 * B, L, nkv * hd),
                                 cfg.compute_dtype)},
        "vq": jnp.zeros((2 * B, n_vq, cb), jnp.float32),
    }

    sampled0 = jnp.zeros((B, n_vq), input_ids.dtype)
    (final_ids, last_sampled, _, _), _ = jax.lax.scan(
        step_fn, (input_ids, sampled0, key, state0),
        (jnp.arange(steps), budgets.T))

    codes = jnp.clip(last_sampled, 0, cb - 1)
    return final_ids, codes
