"""Streaming stepwise samplers for interactive demos.

Mirrors the Gradio streaming variant ``generate_ti2ti_stepwise``
(``MMaDA-Parallel-A/app.py:143-398``): same denoising math as
:func:`generate_ti2ti` but with the demo's image schedule
``linspace(0, steps-1, int(steps*0.3))`` and a per-step yield of
``(step, ids, image_codes, still_masked)`` so the UI can render the
partially-decoded text and a gray-patch overlay on still-masked latents
(``app.py:310-341``).

Unlike the fused production sampler, the step function is jitted once and
driven from a Python loop — one dispatch per step is the right shape for a
human-latency demo stream.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mmada_parallel_tpu.models.llada import LLaDAConfig
from mmada_parallel_tpu.ops import sampling as S
from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                        _text_update,
                                                        _image_update)
from mmada_parallel_tpu.samplers.parallel_ti2ti import make_ti2ti_step  # noqa: F401 (API surface)
from mmada_parallel_tpu.models.llada import llada_head, llada_hidden
from mmada_parallel_tpu.tokens import SequenceLayout

__all__ = ["generate_ti2ti_stepwise", "decode_text_with_masks",
           "t2i_generate_stepwise", "interleave_generate_stepwise"]


def decode_text_with_masks(ids: np.ndarray, layout: SequenceLayout,
                           tokenizer, mask_token: int,
                           mask_char: str = "▓") -> str:
    """Render the text span with mask placeholders (``app.py:110-140``):
    runs of masked tokens become ``▓``-blocks, runs longer than 10 compress
    to ``▓▓▓▓▓[...n-5 more]`` exactly as the reference app renders them."""
    span = ids[layout.text_start:layout.text_end]

    def render_run(n: int) -> str:
        if n <= 10:
            return mask_char * n
        return mask_char * 5 + f"[...{n - 5} more]"

    parts = []
    buf = []
    run = 0
    for t in span:
        if int(t) == mask_token:
            if buf:
                parts.append(tokenizer.decode(buf, skip_special_tokens=True)
                             if hasattr(tokenizer, "decode") else str(buf))
                buf = []
            run += 1
        else:
            if run:
                parts.append(render_run(run))
                run = 0
            buf.append(int(t))
    if run:
        parts.append(render_run(run))
    if buf:
        parts.append(tokenizer.decode(buf, skip_special_tokens=True)
                     if hasattr(tokenizer, "decode") else str(buf))
    return "".join(parts)


def generate_ti2ti_stepwise(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: np.ndarray,
    layout: SequenceLayout,
    opts: TI2TIOptions,
    uncond_text_prefix: Optional[np.ndarray] = None,
    uncond_image_prefix: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    image_step_fraction: float = 0.3,
    yield_every: int = 5,
) -> Iterator[Tuple[int, np.ndarray, np.ndarray, np.ndarray]]:
    """Yields ``(step, ids, image_codes, still_masked)`` per streamed step.

    ``image_codes``/``still_masked`` are the current VQ grid state for the
    preview decode; yields fire every ``yield_every`` steps, on image steps,
    and at the end (``app.py:353-354``).
    """
    steps = opts.text_steps
    img_pos = jnp.asarray(layout.image_positions(), jnp.int32)
    ts, te = layout.text_start, layout.text_end
    tvs, cb = opts.text_vocab_size, opts.codebook_size

    # demo schedule: image refresh over the first-to-last step range
    n_img = max(int(steps * image_step_fraction), 1)
    sched_steps = set(np.round(np.linspace(0, steps - 1, n_img)).astype(int)
                      .tolist())
    sched = S.get_mask_schedule(opts.schedule)

    need_ut = opts.cfg_scale != 0.0 and uncond_text_prefix is not None
    need_ui = opts.cfg_img != 0.0 and uncond_image_prefix is not None
    ut = jnp.asarray(uncond_text_prefix, jnp.int32) if need_ut else None
    ui = jnp.asarray(uncond_image_prefix, jnp.int32) if need_ui else None

    @jax.jit
    def cond_heads(ids):
        hidden = llada_hidden(params, cfg, ids)
        text_h = jax.lax.dynamic_slice_in_dim(hidden, ts, te - ts, axis=1)
        text_logits = llada_head(params, cfg, text_h)
        img_h = jnp.take_along_axis(hidden, img_pos[None, :, None], axis=1)
        vq = llada_head(params, cfg, img_h, vocab_slice=(tvs, cb))
        return text_logits, vq

    @jax.jit
    def text_step(ids, text_logits, budget, k):
        return _text_update(ids, text_logits, budget, opts, layout, k)

    @jax.jit
    def uncond_heads(ids):
        B = ids.shape[0]
        rows = []
        if need_ut:
            rows.append(jax.lax.dynamic_update_slice_in_dim(
                ids, jnp.broadcast_to(ut, (B,) + ut.shape), 0, axis=1))
        if need_ui:
            rows.append(jax.lax.dynamic_update_slice_in_dim(
                ids, jnp.broadcast_to(ui, (B,) + ui.shape), 0, axis=1))
        stacked = jnp.concatenate(rows, axis=0)
        hidden = llada_hidden(params, cfg, stacked)
        img_h = jnp.take_along_axis(hidden, img_pos[None, :, None], axis=1)
        vq = llada_head(params, cfg, img_h, vocab_slice=(tvs, cb))
        if need_ut and need_ui:
            return vq[:B], vq[B:]
        zero = jnp.zeros_like(vq)
        return (vq, zero) if need_ut else (zero, vq)

    @jax.jit
    def image_step(ids, cond_vq, ut_vq, ui_vq, ratio, k):
        mask_ratio = sched(ratio)
        img_temp = opts.temperature * (1.0 - ratio)
        return _image_update(ids, cond_vq, ut_vq, ui_vq, img_pos, mask_ratio,
                             img_temp, opts, k)

    ids = jnp.asarray(input_ids)
    if ids.ndim == 1:
        ids = ids[None]
    masked0 = (ids[:, ts:te] == opts.mask_token).sum(axis=1)
    budgets = S.get_num_transfer_tokens(masked0, steps)

    for step in range(steps):
        if key is not None:
            key, k1, k2 = jax.random.split(key, 3)
        else:
            k1 = k2 = None
        text_logits, cond_vq = cond_heads(ids)
        ids = text_step(ids, text_logits, budgets[:, step], k1)
        is_img = step in sched_steps
        if is_img:
            if need_ut or need_ui:
                ut_vq, ui_vq = uncond_heads(ids)
            else:
                ut_vq = ui_vq = jnp.zeros_like(cond_vq)
            ratio = jnp.asarray((step + 1) / steps, jnp.float32)
            ids = image_step(ids, cond_vq, ut_vq, ui_vq, ratio, k2)
        if is_img or step % yield_every == 0 or step == steps - 1:
            ids_np = np.asarray(ids)[0]
            img_tokens = ids_np[layout.image_positions()]
            still_masked = img_tokens == opts.mask_token
            codes = np.clip(img_tokens - tvs, 0, cb - 1)
            yield step + 1, ids_np, codes, still_masked


def t2i_generate_stepwise(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: np.ndarray,
    uncond_input_ids: Optional[np.ndarray],
    prompt_len: int,
    num_vq_tokens: int,
    opts,
    key: Optional[jax.Array] = None,
) -> Iterator[Tuple[int, np.ndarray, np.ndarray]]:
    """Streaming M-variant t2i decode.

    Mirrors ``t2i_generate_decoding_stepwise``
    (``MMaDA-Parallel-M/models/modeling_mmada.py:768-873``): identical math
    to :func:`mmada_parallel_tpu.samplers.t2i.t2i_generate`, yielding
    ``(step, codes, still_masked)`` after every MaskGit step for demo
    rendering.  ``opts`` is a ``T2IOptions``.
    """
    from mmada_parallel_tpu.samplers.t2i import T2IOptions  # noqa: F401

    ids = jnp.asarray(input_ids)
    if ids.ndim == 1:
        ids = ids[None]
    B, L = ids.shape
    tvs, cb = opts.text_vocab_size, opts.codebook_size
    ist = L - (num_vq_tokens + 1)
    T = opts.timesteps
    sched = S.get_mask_schedule(opts.schedule)
    use_cfg = opts.guidance_scale > 0 and uncond_input_ids is not None
    if use_cfg:
        un = jnp.asarray(uncond_input_ids)
        if un.ndim == 1:
            un = un[None]
        un_prefix = un[:, :prompt_len + 1]
    else:
        un_prefix = None

    @jax.jit
    def vq_logits(ids):
        if use_cfg:
            un = jnp.concatenate(
                [jnp.broadcast_to(un_prefix, (B, prompt_len + 1)),
                 ids[:, prompt_len + 1:]], axis=1)
            both = jnp.concatenate([ids, un], axis=0)
            hidden = llada_hidden(params, cfg, both)
        else:
            hidden = llada_hidden(params, cfg, ids)
        h = jax.lax.dynamic_slice_in_dim(hidden, ist, num_vq_tokens, axis=1)
        vq = llada_head(params, cfg, h, vocab_slice=(tvs, cb))
        if use_cfg:
            return ((1 + opts.guidance_scale) * vq[:B]
                    - opts.guidance_scale * vq[B:])
        return vq

    @jax.jit
    def update(ids, logits, mask_ratio, temp, k1, k2):
        cur = jax.lax.dynamic_slice_in_dim(ids, ist, num_vq_tokens, axis=1)
        unknown = cur == opts.mask_token
        cur_codes = cur - tvs
        sampled = S.categorical_sample(
            k1, logits, temperature_is_zero=(opts.temperature == 0))
        sampled = jnp.where(unknown, sampled, cur_codes)
        probs = jax.nn.softmax(logits, axis=-1)
        sel = jnp.take_along_axis(
            probs, jnp.clip(sampled, 0, cb - 1)[..., None], axis=-1)[..., 0]
        sel = jnp.where(unknown, sel, jnp.finfo(sel.dtype).max)
        mask_len = jnp.floor(num_vq_tokens * mask_ratio).astype(jnp.int32)
        mask_len = jnp.maximum(1, jnp.minimum(unknown.sum(-1) - 1, mask_len))
        remask = S.remask_below_cutoff(
            k2 if (k2 is not None and opts.temperature != 0) else None,
            jnp.broadcast_to(mask_len, (B,)), sel, temp)
        new_img = jnp.where(remask, opts.mask_token, sampled + tvs)
        ids = jax.lax.dynamic_update_slice_in_dim(ids, new_img, ist, axis=1)
        return ids, sampled

    for step in range(T):
        if key is not None:
            key, k1, k2 = jax.random.split(key, 3)
        else:
            k1 = k2 = None
        ratio = (step + 1) / T
        logits = vq_logits(ids)
        ids, sampled = update(ids, logits, sched(jnp.asarray(ratio)),
                              jnp.asarray(opts.temperature * (1 - ratio)),
                              k1, k2)
        # yield the pre-remask sampled codes (the reference decodes these
        # for the preview) + the post-remask mask state for overlays
        cur = np.asarray(ids)[0, ist:ist + num_vq_tokens]
        still = cur == opts.mask_token
        codes = np.clip(np.asarray(sampled)[0], 0, cb - 1)
        yield step + 1, codes, still


def interleave_generate_stepwise(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: np.ndarray,
    uncond_input_ids: np.ndarray,
    layout: SequenceLayout,
    opts: Any = None,
    key: Optional[jax.Array] = None,
    yield_every: int = 5,
) -> Iterator[Tuple[int, np.ndarray, np.ndarray, np.ndarray]]:
    """M-variant streaming generation: yields ``(step, ids, image_codes,
    still_masked)`` per streamed step.

    The step math is EXACTLY :func:`~mmada_parallel_tpu.samplers.\
interleave.interleave_generate`'s (both consume ``_make_update_core``), so
    at temperature 0 the final frame equals the fused sampler's output
    token-for-token; only the driving loop differs (one dispatch per step —
    the right shape for a human-latency demo stream).
    """
    from mmada_parallel_tpu.samplers.interleave import (InterleaveOptions,
                                                        _make_update_core,
                                                        make_interleave_heads)
    opts = opts if opts is not None else InterleaveOptions()
    if opts.remasking == "random" and key is None:
        raise ValueError("remasking='random' requires a PRNG key")
    ids = jnp.asarray(input_ids)
    if ids.ndim == 1:
        ids = ids[None]
    un = jnp.asarray(uncond_input_ids)
    if un.ndim == 1:
        un = un[None]
    B, L = ids.shape
    ts, te = layout.text_start, layout.text_end
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
    img_step_np = np.asarray(img_step)

    masked0 = (ids[:, ts:te] == opts.mask_token).sum(axis=1)
    budgets = S.get_num_transfer_tokens_frontloaded(masked0, steps)
    uncond_prompt = un[:, :prompt_len]
    apply_updates = _make_update_core(opts, layout, mask_ratios, img_temps,
                                      img_step)

    heads = make_interleave_heads(params, cfg, layout, opts)

    @jax.jit
    def one_step(ids, last_sampled, step_idx, budget, k):
        keys = jax.random.split(k, 5) if k is not None else (None,) * 5
        uncond_ids = jnp.concatenate(
            [uncond_prompt, ids[:, prompt_len:]], axis=1)
        both = jnp.concatenate([ids, uncond_ids], axis=0)
        text_logits, vq = heads(both)
        return apply_updates(ids, last_sampled, text_logits[:B],
                             text_logits[B:], vq[:B], vq[B:], step_idx,
                             budget, keys, have_key=k is not None)

    last_sampled = jnp.zeros((B, n_vq), ids.dtype)
    for step in range(steps):
        if key is not None:
            key, k1 = jax.random.split(key)
        else:
            k1 = None
        ids, last_sampled = one_step(ids, last_sampled,
                                     jnp.asarray(step), budgets[:, step], k1)
        if (bool(img_step_np[step]) or step % yield_every == 0
                or step == steps - 1):
            ids_np = np.asarray(ids)[0]
            img_tokens = ids_np[ist:ien]
            still_masked = img_tokens == opts.mask_token
            codes = np.asarray(jnp.clip(last_sampled[0], 0, cb - 1))
            yield step + 1, ids_np, codes, still_masked
