"""Variant-A pure image generation (MaskGit decode) as a fused scan.

Mirrors ``MMaDA-Parallel-A/generators/image_generation_generator.py:15-251``
(``generate_image``): per step, sample ALL currently-masked image positions
via Gumbel-max (``utils/generation_utils.py:40-45``), write them, then
re-mask the ``keep_n`` lowest-confidence ones where ``keep_n =
floor(initial_masks * cos(pi/2 * (s+1)/T))`` (clamped to >=1, 0 on the last
step).  CFG is muse-style ``(1+s)*cond - s*uncond``
(``image_generation_generator.py:154``) with the uncond sequence built as
``cat(uncon_ids, x[:, code_start-2:])`` — a *different length* than the cond
sequence, so the two forwards stay separate (matching the reference's two
calls rather than a batched one).

Static-shape redesign: the reference gathers logits at the dynamic set of
masked positions; here the codebook head runs at all image positions and
updates are masked writes.  The re-mask cutoff index is clamped to
``unknown_cnt - 1`` exactly as the reference's subset-array gather clamps
(``generation_utils.py:59-60``).

The reference's adaptive feature cache (``use_cache``/``cache_ratio``
partial recompute, ``:226-237``) is provided by
:func:`generate_image_cached` — full forwards on warmup/refresh steps,
static-size lowest-confidence partial recompute against per-layer k/v
caches in between.
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

__all__ = ["ImageGenOptions", "generate_image", "generate_image_cached",
           "dump_trajectory"]


@dataclasses.dataclass(frozen=True)
class ImageGenOptions:
    timesteps: int = 18
    temperature: float = 1.0
    cfg_scale: float = 0.0
    schedule: str = "cosine"
    text_vocab_size: int = 126356
    codebook_size: int = 8192
    mask_token: int = 126336
    # adaptive feature cache (image_generation_generator.py:34-38,70-75):
    # full forwards during warmup and every refresh_interval-th step; in
    # between, only the (1 - cache_ratio) lowest-confidence fraction of the
    # sequence is recomputed against cached per-layer k/v.
    use_cache: bool = False
    cache_ratio: float = 0.9
    refresh_interval: int = 5
    warmup_ratio: float = 0.3


def generate_image(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    layout: SequenceLayout,
    opts: ImageGenOptions = ImageGenOptions(),
    uncond_ids: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
    record_trajectory: bool = False,
    record_logits: bool = False,
):
    """Returns ``(final_ids [B, L], image_codes [B, N_vq])``.

    ``layout.code_start`` marks ``<answer_start>`` as in the TI2TI layout;
    the image span (with newlines) sits at ``[image_start, image_end)``.
    ``opts.use_cache`` dispatches to :func:`generate_image_cached`.

    ``record_trajectory=True`` additionally returns a per-step trajectory
    dict matching the reference sampler's ``debug=True`` npy dumps
    (``image_generation_generator.py:214-223``): ``x`` = full sequence after
    write-back + re-mask, ``vq_mask`` = post-re-mask ``x == mask_token``
    over the full sequence, ``sampled_full`` = sampled codes in full token
    space (``sampled + vocab_offset``, ``:172``; static ``[B, n_vq]`` — the
    reference dumps only the masked subset, here unmasked slots carry the
    would-be sample); plus ``logits`` when ``record_logits``.  The scan
    records on-device and :func:`dump_trajectory` writes reference-named
    files.
    """
    if opts.use_cache:
        if record_trajectory or record_logits:
            raise ValueError(
                "record_trajectory/record_logits require the exact sampler; "
                "the cached path (use_cache=True) does not record — run "
                "with use_cache=False to dump a trajectory")
        return generate_image_cached(params, cfg, input_ids, layout, opts,
                                     uncond_ids=uncond_ids, key=key)
    B, L = input_ids.shape
    tvs, cb = opts.text_vocab_size, opts.codebook_size
    img_pos = jnp.asarray(layout.image_positions(), dtype=jnp.int32)
    n_vq = img_pos.shape[0]
    T = opts.timesteps

    sched = S.get_mask_schedule(opts.schedule)
    fracs = sched((jnp.arange(T, dtype=jnp.float32) + 1) / T)

    vq_len0 = (jnp.take_along_axis(input_ids, img_pos[None, :], axis=1)
               == opts.mask_token).sum(axis=1)  # [B] initial masks

    use_cfg = opts.cfg_scale > 0 and uncond_ids is not None
    if use_cfg:
        un_prefix = jnp.asarray(uncond_ids, jnp.int32)
        tail_start = layout.code_start  # reference: x[:, code_start-2:] where
        # code_start there points at <boi>; our code_start is <answer_start>,
        # and the reference slices from 2 before its <boi>+... — the tail is
        # everything from <answer_start> on.
        tail_len = L - tail_start

    def vq_logits_at(ids, positions):
        hidden = llada_hidden(params, cfg, ids)
        h = jnp.take_along_axis(hidden, positions[None, :, None], axis=1)
        return llada_head(params, cfg, h, vocab_slice=(tvs, cb))

    # uncond image positions are the same grid, shifted into the uncond seq
    if use_cfg:
        shift = un_prefix.shape[0] - tail_start
        un_img_pos = img_pos + shift

    def step_fn(carry, xs):
        ids, k = carry
        step_idx, frac = xs
        keys = jax.random.split(k, 3) if k is not None else (None,) * 3
        next_key = keys[0] if k is not None else None

        cur = jnp.take_along_axis(ids, img_pos[None, :], axis=1)
        masked = cur == opts.mask_token
        unknown_cnt = masked.sum(axis=1)

        cond_vq = vq_logits_at(ids, img_pos)
        if use_cfg:
            tail = jax.lax.dynamic_slice_in_dim(ids, tail_start, tail_len, axis=1)
            un = jnp.concatenate(
                [jnp.broadcast_to(un_prefix, (B,) + un_prefix.shape), tail],
                axis=1)
            un_vq = vq_logits_at(un, un_img_pos)
            logits = (1 + opts.cfg_scale) * cond_vq - opts.cfg_scale * un_vq
        else:
            logits = cond_vq

        # Gumbel-max sample (generation_utils.py:40-45)
        if opts.temperature == 0 or k is None:
            sampled = jnp.argmax(logits, axis=-1)
        else:
            u = jax.random.uniform(keys[1], logits.shape)
            g = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
            sampled = jnp.argmax(logits / opts.temperature + g, axis=-1)

        probs = jax.nn.softmax(logits, axis=-1)
        conf = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]

        # keep_n: floor(initial_masks * frac), >=1, 0 on last step
        keep_n = jnp.floor(vq_len0.astype(jnp.float32) * frac).astype(jnp.int32)
        keep_n = jnp.maximum(keep_n, 1)
        keep_n = jnp.where(step_idx == T - 1, 0, keep_n)
        # reference clamps the cutoff gather to the masked-subset length
        keep_n = jnp.minimum(keep_n, jnp.maximum(unknown_cnt - 1, 0))

        # only previously-masked positions participate; unmasked get +inf conf
        conf = jnp.where(masked, conf, jnp.inf)
        remask = S.remask_below_cutoff(
            keys[2] if (k is not None and opts.temperature != 0) else None,
            keep_n, conf, opts.temperature)
        remask = remask & masked

        new_vals = jnp.where(masked, sampled + tvs, cur)
        new_vals = jnp.where(remask, opts.mask_token, new_vals)
        idx = jnp.broadcast_to(img_pos[None, :], new_vals.shape)
        ids = jnp.put_along_axis(ids, idx, new_vals.astype(ids.dtype), axis=1,
                                 inplace=False)
        ys = None
        if record_trajectory:
            # reference dump semantics (image_generation_generator.py:214-223):
            # x/vq_mask are post-write-back + post-re-mask; sampled_full is
            # offset into full token space (:172)
            ys = {"x": ids, "vq_mask": ids == opts.mask_token,
                  "sampled_full": sampled + tvs}
            if record_logits:
                ys["logits"] = logits.astype(jnp.float32)
        return (ids, next_key), ys

    (final_ids, _), traj = jax.lax.scan(
        step_fn, (input_ids, key), (jnp.arange(T), fracs))

    img_tokens = jnp.take_along_axis(final_ids, img_pos[None, :], axis=1)
    codes = jnp.clip(img_tokens - tvs, 0, cb - 1)
    if record_trajectory:
        return final_ids, codes, traj
    return final_ids, codes


def dump_trajectory(traj, out_dir: str) -> None:
    """Write a recorded trajectory as the reference's per-step npy files
    (``step_{i}_{x,vq_mask,sampled_full[,logits]}.npy``,
    ``image_generation_generator.py:214-223``) — the golden-file mechanism
    for offline inspection / cross-checking against reference dumps."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    host = {k: np.asarray(v) for k, v in traj.items()}
    T = next(iter(host.values())).shape[0]
    for i in range(T):
        for name, arr in host.items():
            np.save(os.path.join(out_dir, f"step_{i}_{name}.npy"), arr[i])


def generate_image_cached(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    layout: SequenceLayout,
    opts: ImageGenOptions,
    uncond_ids: Optional[np.ndarray] = None,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """MaskGit decode with the adaptive feature cache.

    The reference's ``use_cache`` path
    (``image_generation_generator.py:70-75,104-108,226-237``): full forwards
    during warmup and every ``refresh_interval``-th step; in between, only
    the lowest-confidence fraction of *image slots* is recomputed through
    :func:`llada_hidden_partial` against the cached per-layer k/v; logits at
    unrecomputed slots are reused from the last computation.

    TPU redesign: the recompute set has a *static* size
    ``n = ceil((1 - cache_ratio) * n_vq)`` chosen by confidence rank (the
    reference uses a dynamic quantile threshold over the whole sequence —
    prompt positions here are never recomputed, which only helps: prompt
    tokens never change).  With ``cfg_scale > 0`` and ``uncond_ids``, the
    cond and uncond branches keep independent caches and confidence-chosen
    recompute sets (the reference's per-branch thresholds,
    ``image_generation_generator.py:226-237``).
    """
    B, L = input_ids.shape
    tvs, cb = opts.text_vocab_size, opts.codebook_size
    img_pos = jnp.asarray(layout.image_positions(), dtype=jnp.int32)
    n_vq = int(img_pos.shape[0])
    T = opts.timesteps
    n_compute = max(int(np.ceil((1.0 - opts.cache_ratio) * n_vq)), 1)

    use_cfg = opts.cfg_scale > 0 and uncond_ids is not None
    if use_cfg:
        un_prefix = jnp.asarray(uncond_ids, jnp.int32)
        tail_start = layout.code_start
        Lu = int(un_prefix.shape[0]) + (L - tail_start)
        shift = int(un_prefix.shape[0]) - tail_start
        un_img_pos = img_pos + shift

    sched = S.get_mask_schedule(opts.schedule)
    fracs = sched((jnp.arange(T, dtype=jnp.float32) + 1) / T)
    warmup_step = int(T * opts.warmup_ratio)
    refresh = np.zeros(T, bool)
    for step in range(T):
        if step <= warmup_step or (step - warmup_step) % opts.refresh_interval == 0:
            refresh[step] = True
    refresh = jnp.asarray(refresh)

    vq_len0 = (jnp.take_along_axis(input_ids, img_pos[None, :], axis=1)
               == opts.mask_token).sum(axis=1)

    def full_branch(seq_ids, positions):
        hidden, cache = llada_hidden_with_cache(params, cfg, seq_ids)
        img_h = jnp.take_along_axis(hidden, positions[None, :, None], axis=1)
        vq = llada_head(params, cfg, img_h, vocab_slice=(tvs, cb))
        return vq, cache

    def partial_branch(seq_ids, positions, cache, vq_logits):
        conf = vq_logits.max(axis=-1)                     # [B, n_vq]
        sel_slot = jnp.argsort(conf, axis=-1)[:, :n_compute]  # lowest-conf
        sel_pos = jnp.take(positions, sel_slot)           # [B, n]
        sel_ids = jnp.take_along_axis(seq_ids, sel_pos, axis=1)
        h_sel, cache = llada_hidden_partial(params, cfg, sel_ids, sel_pos,
                                            cache)
        vq_sel = llada_head(params, cfg, h_sel, vocab_slice=(tvs, cb))
        # gather+select instead of a large scatter (TPU scatters serialize)
        bidx = jnp.arange(B)[:, None]
        inv = jnp.zeros((B, n_vq), jnp.int32).at[bidx, sel_slot].set(
            jnp.broadcast_to(jnp.arange(n_compute, dtype=jnp.int32),
                             sel_slot.shape))
        is_sel = jnp.zeros((B, n_vq), bool).at[bidx, sel_slot].set(True)
        expanded = jnp.take_along_axis(vq_sel.astype(vq_logits.dtype),
                                       inv[:, :, None], axis=1, mode="clip")
        vq = jnp.where(is_sel[:, :, None], expanded, vq_logits)
        return vq, cache

    def uncond_seq(ids):
        tail = jax.lax.dynamic_slice_in_dim(ids, tail_start, L - tail_start,
                                            axis=1)
        return jnp.concatenate(
            [jnp.broadcast_to(un_prefix, (B,) + un_prefix.shape), tail],
            axis=1)

    def step_fn(carry, xs):
        ids, k, state = carry
        step_idx, frac = xs
        keys = jax.random.split(k, 3) if k is not None else (None,) * 3
        next_key = keys[0] if k is not None else None

        cur = jnp.take_along_axis(ids, img_pos[None, :], axis=1)
        masked = cur == opts.mask_token
        unknown_cnt = masked.sum(axis=1)

        if use_cfg:
            def full_both(ids, state):
                c_vq, c_cache = full_branch(ids, img_pos)
                u_vq, u_cache = full_branch(uncond_seq(ids), un_img_pos)
                return {"cache": c_cache, "vq": c_vq,
                        "un_cache": u_cache, "un_vq": u_vq}

            def partial_both(ids, state):
                c_vq, c_cache = partial_branch(ids, img_pos, state["cache"],
                                               state["vq"])
                u_vq, u_cache = partial_branch(uncond_seq(ids), un_img_pos,
                                               state["un_cache"],
                                               state["un_vq"])
                return {"cache": c_cache, "vq": c_vq,
                        "un_cache": u_cache, "un_vq": u_vq}

            state = jax.lax.cond(refresh[step_idx], full_both, partial_both,
                                 ids, state)
            logits = ((1 + opts.cfg_scale) * state["vq"]
                      - opts.cfg_scale * state["un_vq"])
        else:
            def full_one(ids, state):
                vq, cache = full_branch(ids, img_pos)
                return {"cache": cache, "vq": vq}

            def partial_one(ids, state):
                vq, cache = partial_branch(ids, img_pos, state["cache"],
                                           state["vq"])
                return {"cache": cache, "vq": vq}

            state = jax.lax.cond(refresh[step_idx], full_one, partial_one,
                                 ids, state)
            logits = state["vq"]

        if opts.temperature == 0 or keys[1] is None:
            sampled = jnp.argmax(logits, axis=-1)
        else:
            u = jax.random.uniform(keys[1], logits.shape)
            g = -jnp.log(-jnp.log(u + 1e-20) + 1e-20)
            sampled = jnp.argmax(logits / opts.temperature + g, axis=-1)

        probs = jax.nn.softmax(logits, axis=-1)
        conf = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]

        keep_n = jnp.floor(vq_len0.astype(jnp.float32) * frac).astype(jnp.int32)
        keep_n = jnp.maximum(keep_n, 1)
        keep_n = jnp.where(step_idx == T - 1, 0, keep_n)
        keep_n = jnp.minimum(keep_n, jnp.maximum(unknown_cnt - 1, 0))

        conf = jnp.where(masked, conf, jnp.inf)
        remask = S.remask_below_cutoff(
            keys[2] if (k is not None and opts.temperature != 0) else None,
            keep_n, conf, opts.temperature)
        remask = remask & masked

        new_vals = jnp.where(masked, sampled + tvs, cur)
        new_vals = jnp.where(remask, opts.mask_token, new_vals)
        idx = jnp.broadcast_to(img_pos[None, :], new_vals.shape)
        ids = jnp.put_along_axis(ids, idx, new_vals.astype(ids.dtype), axis=1,
                                 inplace=False)
        return (ids, next_key, state), None

    # init caches/logits with zeros; step 0 is always a refresh
    nkv, hd = cfg.effective_n_kv_heads, cfg.head_dim

    def zero_cache(length):
        return {"k": jnp.zeros((cfg.n_layers, B, length, nkv * hd),
                               cfg.compute_dtype),
                "v": jnp.zeros((cfg.n_layers, B, length, nkv * hd),
                               cfg.compute_dtype)}

    state0 = {"cache": zero_cache(L),
              "vq": jnp.zeros((B, n_vq, cb), jnp.float32)}
    if use_cfg:
        state0["un_cache"] = zero_cache(Lu)
        state0["un_vq"] = jnp.zeros((B, n_vq, cb), jnp.float32)

    (final_ids, _, _), _ = jax.lax.scan(
        step_fn, (input_ids, key, state0),
        (jnp.arange(T), fracs))

    img_tokens = jnp.take_along_axis(final_ids, img_pos[None, :], axis=1)
    codes = jnp.clip(img_tokens - tvs, 0, cb - 1)
    return final_ids, codes
