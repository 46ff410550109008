"""The joint parallel text+image denoiser (variant A) as one fused scan.

Semantics mirror ``MMaDA-Parallel-A/generators/parallel_generator.py:102-368``
(generate_ti2ti) step by step:

* per step, ONE conditional full-sequence forward;
* text update — Gumbel-noised argmax, confidence = softmax prob of the chosen
  token, per-row top-k unmask with the precomputed per-step budget;
* on scheduled steps (``linspace(text_steps//4, text_steps-1, timesteps)``),
  an image refresh: two more forwards for the text-uncond and image-uncond
  sequences built from the *post-text-update* ids (reference order,
  ``parallel_generator.py:219-264``), dual CFG
  ``cond + cfg_scale*(cond - uncond_text) + cfg_img*(cond - uncond_img)``,
  multinomial sample, MaskGit-style re-mask of the lowest-confidence tokens
  per cosine schedule with temperature decay ``temp*(1-ratio)``.

TPU-native redesign (vs. the reference's python step loop):

* the whole trajectory is a single ``jax.lax.scan`` — zero host syncs in the
  hot loop (the reference does ~2k ``.item()`` calls per image step,
  ``parallel_generator.py:223-230,339-344``);
* the scheduled image step becomes ``lax.cond`` on a precomputed boolean step
  mask; the two uncond branches run as ONE batch-2B forward;
* logits are computed only where consumed: the text span gets the full-vocab
  head, image positions get only the 8192-entry codebook slice of the head —
  the reference projects every position onto all 134k logits every forward;
* image-position gather/scatter uses a static position map
  (:func:`mmada_parallel_tpu.tokens.image_position_map`) instead of scanning
  tokens for newlines at runtime.

Seed-matched parity with the reference at ``text_temperature=0`` and
``temperature=0`` is covered by ``tests/test_samplers.py`` against a literal
numpy re-implementation of the reference loop.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from mmada_parallel_tpu.models.llada import LLaDAConfig, llada_head, llada_hidden
from mmada_parallel_tpu.ops import sampling as S
from mmada_parallel_tpu.tokens import SequenceLayout

__all__ = ["TI2TIOptions", "generate_ti2ti", "generate_ti2ti_cached",
           "make_ti2ti_step"]


@dataclasses.dataclass(frozen=True)
class TI2TIOptions:
    """Sampler knobs (defaults = the README 512x512 edit config,
    ``MMaDA-Parallel-A/README.md:101-117``)."""

    text_steps: int = 128
    timesteps: int = 64                   # image refresh steps
    temperature: float = 1.0              # image sampling temperature
    text_temperature: float = 0.0
    cfg_scale: float = 0.0                # text-uncond guidance
    cfg_img: float = 4.0                  # image-uncond guidance
    remasking: str = "low_confidence"     # or "random"
    schedule: str = "cosine"
    text_vocab_size: int = 126356
    codebook_size: int = 8192
    mask_token: int = 126336


def _text_update(ids: jax.Array, text_logits: jax.Array, budget: jax.Array,
                 opts: TI2TIOptions, layout: SequenceLayout,
                 key: Optional[jax.Array],
                 return_transfer: bool = False):
    """One text-transfer update (``parallel_generator.py:181-217``).

    Returns the updated ids, or ``(ids, transfer_mask)`` when
    ``return_transfer`` (the cached sampler tracks committed positions)."""
    ts, te = layout.text_start, layout.text_end
    cur = jax.lax.dynamic_slice_in_dim(ids, ts, te - ts, axis=1)
    masked = cur == opts.mask_token

    k_noise, k_rand = (jax.random.split(key) if key is not None else (None, None))
    x0 = S.gumbel_argmax(text_logits, opts.text_temperature,
                         k_noise if opts.text_temperature != 0 else None)
    if opts.remasking == "low_confidence":
        conf = S.token_confidence(text_logits, x0)
    else:  # random remasking (parallel_generator.py:197-202)
        conf = jax.random.uniform(k_rand, x0.shape)

    x0 = jnp.where(masked, x0, cur)
    conf = jnp.where(masked, conf, S.NEG_INF)
    transfer = S.topk_transfer_mask(conf, budget)
    new_text = jnp.where(transfer, x0, cur)
    out = jax.lax.dynamic_update_slice_in_dim(ids, new_text, ts, axis=1)
    return (out, transfer) if return_transfer else out


def _cfg_plan(opts: TI2TIOptions, uncond_text_prefix, uncond_image_prefix):
    """Reference CFG gating (parallel_generator.py:243-281):

    * uncond forwards are built only when (cfg_scale>0 and text prefix) or
      (cfg_img>0 and image prefix);
    * inside that branch, a MISSING prefix falls back to a clone of the
      cond ids — whose forward equals cond exactly, so its term vanishes;
    * when the branch is not entered, uncond logits are ZEROS and a
      nonzero scale amplifies cond: cond + s*(cond - 0).
    """
    build_uncond = ((opts.cfg_scale > 0 and uncond_text_prefix is not None)
                    or (opts.cfg_img > 0 and uncond_image_prefix is not None))
    need_ut = build_uncond and uncond_text_prefix is not None
    need_ui = build_uncond and uncond_image_prefix is not None
    return {
        "need_ut": need_ut,
        "need_ui": need_ui,
        "missing_is_cond": build_uncond,
        "ut_prefix": (jnp.asarray(uncond_text_prefix, jnp.int32)
                      if need_ut else None),
        "ui_prefix": (jnp.asarray(uncond_image_prefix, jnp.int32)
                      if need_ui else None),
    }


def _uncond_vq(params, cfg, ids, cond_vq, plan, img_pos, tvs, cb,
               attn_mask=None, position_ids=None, hidden_fn=llada_hidden):
    """Uncond CFG forwards (batched) -> codebook logits at image positions.

    Missing-prefix branches inside the build-uncond gate resolve to
    ``cond_vq`` (the reference's clone forward); outside the gate both
    resolve to zeros.  The prefix overwrite keeps sequence structure, so the
    cond row's padding mask / positions apply to the uncond rows as-is."""
    B = ids.shape[0]
    batch = []
    if plan["need_ut"]:
        p = plan["ut_prefix"]
        batch.append(jax.lax.dynamic_update_slice_in_dim(
            ids, jnp.broadcast_to(p, (B,) + p.shape), 0, axis=1))
    if plan["need_ui"]:
        p = plan["ui_prefix"]
        batch.append(jax.lax.dynamic_update_slice_in_dim(
            ids, jnp.broadcast_to(p, (B,) + p.shape), 0, axis=1))
    if not batch:
        z = jnp.zeros_like(cond_vq)
        return z, z
    stacked = jnp.concatenate(batch, axis=0)
    n_rep = len(batch)
    mask2 = (jnp.concatenate([attn_mask] * n_rep, axis=0)
             if attn_mask is not None else None)
    pos2 = (jnp.concatenate([position_ids] * n_rep, axis=0)
            if position_ids is not None else None)
    hidden = hidden_fn(params, cfg, stacked, mask2, pos2)
    img_h = jnp.take_along_axis(
        hidden, img_pos[None, :, None].astype(jnp.int32), axis=1)
    vq = llada_head(params, cfg, img_h, vocab_slice=(tvs, cb))
    if plan["need_ut"] and plan["need_ui"]:
        return vq[:B], vq[B:]
    other = cond_vq if plan["missing_is_cond"] else jnp.zeros_like(vq)
    return (vq, other) if plan["need_ut"] else (other, vq)


def _image_update(ids: jax.Array, cond_vq: jax.Array, ut_vq: jax.Array,
                  ui_vq: jax.Array, img_pos: jax.Array, mask_ratio: jax.Array,
                  img_temp: jax.Array, opts: TI2TIOptions,
                  key: Optional[jax.Array]) -> jax.Array:
    """One scheduled image refresh (``parallel_generator.py:266-344``).

    ``cond_vq/ut_vq/ui_vq``: ``[B, N_vq, codebook]`` logits already sliced to
    the codebook vocab range at the image positions.
    """
    tvs, cb = opts.text_vocab_size, opts.codebook_size
    cur = jnp.take_along_axis(ids, img_pos[None, :], axis=1)  # [B, N]
    unknown = cur == opts.mask_token
    cur_codes = jnp.clip(cur - tvs, 0, cb - 1)

    logits = cond_vq
    if opts.cfg_scale != 0.0:
        logits = logits + opts.cfg_scale * (cond_vq - ut_vq)
    if opts.cfg_img != 0.0:
        logits = logits + opts.cfg_img * (cond_vq - ui_vq)

    k_sample, k_mask = (jax.random.split(key) if key is not None else (None, None))
    sampled = S.categorical_sample(k_sample, logits,
                                   temperature_is_zero=(opts.temperature == 0))
    sampled = jnp.where(unknown, sampled, cur_codes)
    sampled = jnp.clip(sampled, 0, cb - 1)

    probs = jax.nn.softmax(logits, axis=-1)
    sel = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
    sel = jnp.where(unknown, sel, jnp.finfo(sel.dtype).max)

    n_vq = cur.shape[1]
    unknown_counts = unknown.sum(axis=-1)
    mask_len = jnp.floor(n_vq * mask_ratio).astype(jnp.int32)
    mask_len = jnp.maximum(1, jnp.minimum(unknown_counts - 1, mask_len))

    remask = S.remask_lowest_exact(
        k_mask if opts.temperature != 0 else None, mask_len, sel, img_temp)

    new_vals = jnp.where(remask, opts.mask_token, sampled + tvs)
    idx = jnp.broadcast_to(img_pos[None, :], new_vals.shape)
    return jnp.put_along_axis(ids, idx, new_vals.astype(ids.dtype), axis=1,
                              inplace=False)


def make_ti2ti_step(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    layout: SequenceLayout,
    opts: TI2TIOptions,
    uncond_text_prefix: Optional[np.ndarray],
    uncond_image_prefix: Optional[np.ndarray],
    attn_mask: Optional[jax.Array] = None,
    hidden_fn: Optional[Callable] = None,
) -> Callable:
    """Build the scan body.  Static data (layout, schedules, prefixes) is
    closed over; carry is ``(ids, key)``.

    ``attn_mask`` (``[B, L]`` bool, True = real) enables ragged batched
    serving: pad positions are hidden from attention (the pairwise bias the
    reference builds in ``modeling_xllmx_dimoo.py:53-62``) and RoPE
    positions are re-ranked so each row reproduces its unpadded run.

    ``hidden_fn`` swaps the backbone implementation (signature of
    :func:`~mmada_parallel_tpu.models.llada_hidden`); the multi-chip
    ring-TP backbone plugs in via
    :func:`mmada_parallel_tpu.parallel.tp_overlap.ring_hidden_fn`."""

    from mmada_parallel_tpu.ops.masks import ragged_positions

    if hidden_fn is None:
        hidden_fn = llada_hidden
    pos_ids = (ragged_positions(attn_mask) if attn_mask is not None else None)
    img_pos = jnp.asarray(layout.image_positions(), dtype=jnp.int32)
    ts, te = layout.text_start, layout.text_end
    tvs, cb = opts.text_vocab_size, opts.codebook_size

    steps = opts.text_steps
    sched = S.get_mask_schedule(opts.schedule)
    ratios = (jnp.arange(steps, dtype=jnp.float32) + 1) / steps
    mask_ratios = sched(ratios)                       # [steps]
    img_temps = opts.temperature * (1.0 - ratios)     # [steps]
    img_step = S.image_step_mask(steps, opts.timesteps)

    plan = _cfg_plan(opts, uncond_text_prefix, uncond_image_prefix)

    def cond_heads(ids):
        """Conditional forward -> (text full-vocab logits, image codebook logits)."""
        hidden = hidden_fn(params, cfg, ids, attn_mask, pos_ids)
        text_h = jax.lax.dynamic_slice_in_dim(hidden, ts, te - ts, axis=1)
        text_logits = llada_head(params, cfg, text_h)
        img_h = jnp.take_along_axis(
            hidden, img_pos[None, :, None].astype(jnp.int32), axis=1)
        vq_logits = llada_head(params, cfg, img_h, vocab_slice=(tvs, cb))
        return text_logits, vq_logits

    def step_fn(carry, xs):
        ids, key = carry
        step_idx, budget = xs
        keys = (jax.random.split(key, 4) if key is not None
                else (None, None, None, None))
        next_key = keys[0] if key is not None else None

        text_logits, cond_vq = cond_heads(ids)
        ids = _text_update(ids, text_logits, budget, opts, layout,
                           keys[1] if key is not None else None)

        def do_image(ids):
            ut_vq, ui_vq = _uncond_vq(params, cfg, ids, cond_vq, plan,
                                      img_pos, tvs, cb, attn_mask, pos_ids,
                                      hidden_fn)
            return _image_update(
                ids, cond_vq, ut_vq, ui_vq, img_pos,
                mask_ratios[step_idx], img_temps[step_idx], opts,
                keys[2] if key is not None else None)

        ids = jax.lax.cond(img_step[step_idx], do_image, lambda x: x, ids)
        return (ids, next_key), None

    return step_fn


def generate_ti2ti(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    layout: SequenceLayout,
    opts: TI2TIOptions = TI2TIOptions(),
    uncond_text_prefix: Optional[np.ndarray] = None,
    uncond_image_prefix: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    attn_mask: Optional[jax.Array] = None,
    hidden_fn: Optional[Callable] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Run the full denoising trajectory.

    Args:
        input_ids: ``[B, L]`` assembled sequence
            (:func:`mmada_parallel_tpu.tokens.assemble_ti2ti_sequence`).
        uncond_text_prefix / uncond_image_prefix: CFG negative prefixes (the
            reference overwrites ``ids[:, :len(prefix)]``,
            ``parallel_generator.py:243-258``).
        key: PRNG key; ``None`` -> fully deterministic (argmax everywhere),
            the parity configuration.
        attn_mask: optional ``[B, L]`` bool (True = real token) for ragged
            batches padded to a common layout; each row then generates
            exactly what its unpadded single run would.
        hidden_fn: optional backbone override (``llada_hidden`` signature);
            pass :func:`mmada_parallel_tpu.parallel.tp_overlap.ring_hidden_fn`
            to run the trajectory tensor-parallel over a mesh.

    Returns:
        ``(final_ids [B, L], image_codes [B, N_vq])`` — text extraction and
        decode stay host-side (they are O(len) string ops).
    """
    if opts.remasking == "random" and key is None:
        raise ValueError("remasking='random' requires a PRNG key")
    step_fn = make_ti2ti_step(params, cfg, layout, opts,
                              uncond_text_prefix, uncond_image_prefix,
                              attn_mask, hidden_fn)
    ts, te = layout.text_start, layout.text_end
    masked0 = (input_ids[:, ts:te] == opts.mask_token).sum(axis=1)
    budgets = S.get_num_transfer_tokens(masked0, opts.text_steps)  # [B, steps]

    (final_ids, _), _ = jax.lax.scan(
        step_fn, (input_ids, key),
        (jnp.arange(opts.text_steps), budgets.T))

    img_pos = jnp.asarray(layout.image_positions(), dtype=jnp.int32)
    img_tokens = jnp.take_along_axis(final_ids, img_pos[None, :], axis=1)
    codes = jnp.clip(img_tokens - opts.text_vocab_size, 0,
                     opts.codebook_size - 1)
    # The per-step re-mask keeps >=1 token masked even on the last step; the
    # reference fills still-masked positions with a random code at extraction
    # (parallel_generator.py:356-360).  Deterministic mode fills with 0.
    still_masked = img_tokens == opts.mask_token
    if key is not None:
        fill = jax.random.randint(jax.random.fold_in(key, 0xF1),
                                  codes.shape, 0, opts.codebook_size)
    else:
        fill = jnp.zeros_like(codes)
    codes = jnp.where(still_masked, fill, codes)
    return final_ids, codes


def decode_text(final_ids: np.ndarray, layout: SequenceLayout,
                opts: TI2TIOptions, tokenizer=None):
    """Host-side text extraction (``parallel_generator.py:347-352``).

    Accepts a single row ``[L]`` or a batch ``[B, L]`` (first row used).
    """
    arr = np.asarray(final_ids)
    if arr.ndim == 2:
        arr = arr[0]
    text = [int(t) for t in arr[layout.text_start:layout.text_end]
            if int(t) != opts.mask_token]
    if tokenizer is None:
        return text
    return tokenizer.decode(text, skip_special_tokens=True)


def generate_ti2ti_cached(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    layout: SequenceLayout,
    opts: TI2TIOptions,
    cache_ratio: float = 0.95,
    refresh_interval: int = 4,
    warmup_ratio: float = 0.25,
    uncond_text_prefix: Optional[np.ndarray] = None,
    uncond_image_prefix: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """TI2TI with the adaptive feature cache on the *cond* trajectory —
    an extension beyond the reference (which caches only pure image
    generation, ``image_generation_generator.py``).

    Image-refresh steps and the warmup/interval schedule run full forwards
    (rebuilding the per-layer k/v cache); the remaining text-only steps
    recompute just ``n = changed-token cap + (1 - cache_ratio) * text_len``
    positions against the cache: every position committed since the last
    compute (its cached k/v is stale and MUST be rewritten) plus the
    lowest-confidence still-masked text slots.  Logits elsewhere are reused
    — an approximation, so this sampler is opt-in; the exact
    :func:`generate_ti2ti` remains the parity path.  Uncond CFG forwards
    (image steps only) stay exact.
    """
    from mmada_parallel_tpu.models.llada import (llada_hidden_with_cache,
                                                 llada_hidden_partial)

    if opts.remasking == "random" and key is None:
        raise ValueError("remasking='random' requires a PRNG key")

    B, L = input_ids.shape
    img_pos = jnp.asarray(layout.image_positions(), dtype=jnp.int32)
    n_vq = int(img_pos.shape[0])
    ts, te = layout.text_start, layout.text_end
    text_len = te - ts
    tvs, cb = opts.text_vocab_size, opts.codebook_size
    steps = opts.text_steps
    V = cfg.emb_size

    schedules = S.get_mask_schedule(opts.schedule)
    ratios = (jnp.arange(steps, dtype=jnp.float32) + 1) / steps
    mask_ratios = schedules(ratios)
    img_temps = opts.temperature * (1.0 - ratios)
    # pure-numpy schedule (this function may itself be traced under jit —
    # np.asarray on a jnp value would fail there)
    sched_steps = np.round(np.linspace(steps // 4, steps - 1,
                                       opts.timesteps)).astype(int)
    img_step = np.zeros(steps, bool)
    img_step[sched_steps] = True

    # refresh schedule: image steps, the step AFTER an image step (its
    # writes invalidated cached k/v at image positions, which the text-span
    # changed-tracking does not cover), warmup, and every
    # refresh_interval-th step
    warmup = int(steps * warmup_ratio)
    refresh = img_step.copy()
    refresh[1:] |= img_step[:-1]
    refresh[:warmup + 1] = True
    last = 0
    for s in range(steps):
        if refresh[s]:
            last = s
        elif s - last >= refresh_interval:
            refresh[s] = True
            last = s
    refresh = jnp.asarray(refresh)

    n_changed_cap = int(np.ceil(text_len / steps)) + 1
    n_low = max(int(np.ceil((1.0 - cache_ratio) * text_len)), 1)
    n_sel = min(n_changed_cap + n_low, text_len)

    plan = _cfg_plan(opts, uncond_text_prefix, uncond_image_prefix)

    def full_compute(ids, state):
        hidden, cache = llada_hidden_with_cache(params, cfg, ids)
        text_h = jax.lax.dynamic_slice_in_dim(hidden, ts, text_len, axis=1)
        text_logits = llada_head(params, cfg, text_h)
        img_h = jnp.take_along_axis(hidden, img_pos[None, :, None], axis=1)
        vq = llada_head(params, cfg, img_h, vocab_slice=(tvs, cb))
        return {"cache": cache, "text_logits": text_logits, "vq": vq,
                "changed": jnp.zeros((B, text_len), bool)}

    def partial_compute(ids, state):
        cur = jax.lax.dynamic_slice_in_dim(ids, ts, text_len, axis=1)
        masked = cur == opts.mask_token
        conf = jax.nn.softmax(state["text_logits"], axis=-1).max(axis=-1)
        score = (state["changed"].astype(jnp.float32) * 1e6
                 + masked.astype(jnp.float32) * (1.0 - conf))
        sel_slot = jnp.argsort(-score, axis=-1)[:, :n_sel]     # [B, n]
        sel_pos = ts + sel_slot
        sel_ids = jnp.take_along_axis(ids, sel_pos, axis=1)
        h_sel, cache = llada_hidden_partial(params, cfg, sel_ids, sel_pos,
                                            state["cache"])
        logits_sel = llada_head(params, cfg, h_sel)
        bidx = jnp.arange(B)[:, None]
        inv = jnp.zeros((B, text_len), jnp.int32).at[bidx, sel_slot].set(
            jnp.broadcast_to(jnp.arange(n_sel, dtype=jnp.int32),
                             sel_slot.shape))
        is_sel = jnp.zeros((B, text_len), bool).at[bidx, sel_slot].set(True)
        expanded = jnp.take_along_axis(
            logits_sel.astype(state["text_logits"].dtype),
            inv[:, :, None], axis=1, mode="clip")
        text_logits = jnp.where(is_sel[:, :, None], expanded,
                                state["text_logits"])
        return {"cache": cache, "text_logits": text_logits,
                "vq": state["vq"], "changed": jnp.zeros((B, text_len), bool)}

    def step_fn(carry, xs):
        ids, k, state = carry
        step_idx, budget = xs
        keys = (jax.random.split(k, 4) if k is not None else (None,) * 4)
        next_key = keys[0] if k is not None else None

        state = jax.lax.cond(refresh[step_idx], full_compute,
                             partial_compute, ids, state)

        # text update from (possibly partially stale) cached logits
        ids, transfer = _text_update(ids, state["text_logits"], budget, opts,
                                     layout, keys[1] if k is not None else None,
                                     return_transfer=True)
        state = dict(state, changed=state["changed"] | transfer)

        def do_image(ids):
            ut_vq, ui_vq = _uncond_vq(params, cfg, ids, state["vq"], plan,
                                      img_pos, tvs, cb)
            return _image_update(ids, state["vq"], ut_vq, ui_vq, img_pos,
                                 mask_ratios[step_idx], img_temps[step_idx],
                                 opts, keys[2] if k is not None else None)

        ids = jax.lax.cond(img_step_dev[step_idx], do_image, lambda x: x, ids)
        return (ids, next_key, state), None

    img_step_dev = jnp.asarray(img_step)
    masked0 = (input_ids[:, ts:te] == opts.mask_token).sum(axis=1)
    budgets = S.get_num_transfer_tokens(masked0, steps)

    nkv, hd = cfg.effective_n_kv_heads, cfg.head_dim
    state0 = {
        "cache": {"k": jnp.zeros((cfg.n_layers, B, L, nkv * hd),
                                 cfg.compute_dtype),
                  "v": jnp.zeros((cfg.n_layers, B, L, nkv * hd),
                                 cfg.compute_dtype)},
        "text_logits": jnp.zeros((B, text_len, V), jnp.float32),
        "vq": jnp.zeros((B, n_vq, cb), jnp.float32),
        "changed": jnp.zeros((B, text_len), bool),
    }

    (final_ids, _, _), _ = jax.lax.scan(
        step_fn, (input_ids, key, state0),
        (jnp.arange(steps), budgets.T))

    img_tokens = jnp.take_along_axis(final_ids, img_pos[None, :], axis=1)
    codes = jnp.clip(img_tokens - tvs, 0, cb - 1)
    still_masked = img_tokens == opts.mask_token
    if key is not None:
        fill = jax.random.randint(jax.random.fold_in(key, 0xF1),
                                  codes.shape, 0, cb)
    else:
        fill = jnp.zeros_like(codes)
    codes = jnp.where(still_masked, fill, codes)
    return final_ids, codes
