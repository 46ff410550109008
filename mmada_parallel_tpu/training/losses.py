"""Training losses for both variants, fully vectorized.

* A-variant (``MMaDA-Parallel-A/model/modeling_xllmx_dimoo.py:86-194``):
  masked CE over all labeled positions ("interleave loss") plus separate
  text/image diagnostics obtained by scanning each row for the
  ``<answer_start>/<image_start>/<image_end>`` region boundaries — the
  reference's per-row python scan becomes first-index arithmetic on
  ``[B, L]`` masks.
* M interleave (``MMaDA-Parallel-M/training/train_interleave.py:859-878``):
  ``text_coeff * (sum(CE_text / t) / max_seq_len) + image_coeff *
  mean(CE_image)`` over fixed tail slices.
* M ``forward_process`` (``models/modeling_mmada.py:361-430``): t2i CE on
  the image tail, lm/mmu CE at masked positions weighted ``1/p_mask`` and
  ``1/answer_length``.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "token_cross_entropy",
    "masked_mean",
    "a_variant_losses",
    "m_interleave_loss",
    "m_forward_process_losses",
    "soft_target_cross_entropy",
    "masking_loss_weight",
]


def soft_target_cross_entropy(logits: jax.Array, targets: jax.Array,
                              soft_targets: jax.Array) -> jax.Array:
    """Soft-target CE over the class-conditional t2i head
    (``MMaDA-Parallel-M/training/utils.py:54-71``): drops the leading
    class-id token, truncates logits to the soft-target width, zeroes
    ``-100``-padded positions, and normalizes by the active count."""
    logits = logits[:, 1:, :soft_targets.shape[-1]].astype(jnp.float32)
    targets = targets[:, 1:]
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    loss = -(soft_targets * log_probs).sum(-1)
    padding = targets == -100
    loss = jnp.where(padding, 0.0, loss)
    num_active = padding.size - padding.sum()
    return loss.sum() / jnp.maximum(num_active, 1)


def masking_loss_weight(t: jax.Array, mask: jax.Array,
                        min_val: float = 0.3) -> jax.Array:
    """Per-position loss weight for ``predict_all_tokens`` training
    (``get_loss_weight``, ``MMaDA-Parallel-M/training/utils.py:73-75``):
    masked positions weigh 1, unmasked decay toward ``min_val`` as the
    timestep ``t`` (the mask probability) falls."""
    return 1.0 - (1.0 - mask) * ((1.0 - t) * (1.0 - min_val))[:, None]


def token_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-token CE ``[B, L]`` with ``-100`` ignored (0 there), fp32.

    The label-logit selection is a masked reduction over the vocab axis
    (fused by XLA, never materialized) rather than ``take_along_axis``:
    a gather over a tensor-sharded vocab axis makes GSPMD all-gather the
    full logits (~700 MB/shard at 8B dims), while a reduction partitions
    into a local reduce + a [B, L] psum.
    """
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    vocab = jnp.arange(logits.shape[-1], dtype=safe.dtype)
    sel = jnp.sum(jnp.where(safe[..., None] == vocab, logits, 0.0), axis=-1)
    return jnp.where(valid, lse - sel, 0.0)


def masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    denom = jnp.maximum(mask.sum(), 1)
    return jnp.where(mask.sum() > 0,
                     (values * mask).sum() / denom, 0.0)


def _first_index(cond: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-row ``(first_true_index, found)`` for ``[B, L]`` bool."""
    found = cond.any(axis=1)
    idx = jnp.argmax(cond, axis=1)
    return idx, found


def a_variant_losses(
    logits: jax.Array,
    input_ids: jax.Array,
    labels: jax.Array,
    lengths: Optional[jax.Array] = None,
    t: Optional[jax.Array] = None,
    answer_start_token: int = 126354,
    answer_end_token: int = 126355,
    image_start_token: int = 126349,
    image_end_token: int = 126350,
    newline_token: int = 126084,
    debug_stats: bool = False,
) -> Dict[str, jax.Array]:
    """``{loss, interleave_loss, text_loss, image_loss}``.

    ``lengths``: true (unpadded) lengths, the reference's
    ``original_lengths`` fallback for a missing ``<answer_end>``.
    ``debug_stats`` adds per-population token counts and CE min/max
    (the reference's first-3-steps loss debug prints).
    """
    B, L = input_ids.shape
    ce = token_cross_entropy(logits, labels)
    valid = labels != -100
    interleave = masked_mean(ce, valid)

    pos = jnp.arange(L)[None, :]
    if lengths is None:
        lengths = jnp.full((B,), L)

    ans_start, has_ans = _first_index(input_ids == answer_start_token)
    after_ans = pos >= ans_start[:, None]
    ans_end_idx, has_ans_end = _first_index(
        (input_ids == answer_end_token) & after_ans)
    ans_end = jnp.where(has_ans_end, ans_end_idx, lengths)

    in_answer = after_ans & (pos < ans_end[:, None]) & has_ans[:, None]
    img_start, has_img_start = _first_index(
        (input_ids == image_start_token) & in_answer)
    after_img = pos >= img_start[:, None]
    img_end_idx, has_img_end = _first_index(
        (input_ids == image_end_token) & after_img)
    has_img = has_img_start & has_img_end

    # image positions: (img_start, img_end) exclusive, skipping newlines
    # (note: includes label==-100 positions, whose CE is 0 — faithful to
    # modeling_xllmx_dimoo.py:133-136)
    img_region = (has_img[:, None]
                  & (pos > img_start[:, None]) & (pos < img_end_idx[:, None])
                  & (input_ids != newline_token))

    # text positions: after image (img_end+1, ans_end) with labels, or the
    # whole answer when no image started (ans_start+1, ans_end).  A row with
    # <image_start> but no <image_end> contributes nothing — the reference's
    # scan finds no end and falls through (modeling_xllmx_dimoo.py:126-143).
    text_with_img = (has_img[:, None]
                     & (pos > img_end_idx[:, None]) & (pos < ans_end[:, None]))
    text_no_img = ((~has_img_start)[:, None] & has_ans[:, None]
                   & (pos > ans_start[:, None]) & (pos < ans_end[:, None]))
    text_region = (text_with_img | text_no_img) & valid

    text_loss = masked_mean(ce, text_region)
    image_loss = masked_mean(ce, img_region)
    if t is not None:
        text_loss = jnp.where(
            text_region.sum() > 0,
            text_loss / jnp.clip(t.mean(), 0.01, None), text_loss)

    out = {"loss": interleave, "interleave_loss": interleave,
           "text_loss": text_loss, "image_loss": image_loss}
    if debug_stats:
        # population stats the reference prints on its first 3 steps
        # (modeling_xllmx_dimoo.py:100-160), as jit-friendly metrics
        big = jnp.asarray(jnp.finfo(ce.dtype).max, ce.dtype)
        for name, region in (("text", text_region), ("image", img_region)):
            n = region.sum()
            out[f"{name}_n_tokens"] = n
            out[f"{name}_loss_min"] = jnp.where(
                n > 0, jnp.min(jnp.where(region, ce, big)), 0.0)
            out[f"{name}_loss_max"] = jnp.max(jnp.where(region, ce, 0.0))
    return out


def m_interleave_loss(
    logits: jax.Array,
    labels: jax.Array,
    t: jax.Array,
    max_seq_length: int,
    num_vq_tokens: int,
    text_coeff: float = 1.0,
    image_coeff: float = 1.0,
) -> Dict[str, jax.Array]:
    """Exact tail-slice loss of ``train_interleave.py:859-878``."""
    B = logits.shape[0]
    ce = token_cross_entropy(logits, labels)
    text_ce = ce[:, -max_seq_length:] / t[:, None]
    text_loss = text_ce.sum() / max_seq_length
    img_slice = ce[:, -max_seq_length - num_vq_tokens - 2:-max_seq_length]
    image_loss = img_slice.mean()
    loss = text_coeff * text_loss + image_coeff * image_loss
    return {"loss": loss, "text_loss": text_loss, "image_loss": image_loss}


def m_forward_process_losses(
    logits: jax.Array,
    input_ids: jax.Array,
    labels: jax.Array,
    batch_size_t2i: int,
    batch_size_lm: int,
    batch_size_mmu: int,
    max_seq_length: int,
    p_mask_lm: Optional[jax.Array] = None,
    p_mask_mmu: Optional[jax.Array] = None,
    answer_lengths_mmu: Optional[jax.Array] = None,
    answer_lengths_lm: Optional[jax.Array] = None,
    mask_token: int = 126336,
) -> Dict[str, jax.Array]:
    """The three-task loss of ``modeling_mmada.py:361-430``.

    The batch is the concat ``[t2i | lm | mmu]``; t2i CE runs over the image
    tail (positions ``max_seq_length+1:``), lm/mmu CE at masked positions
    weighted ``1/p_mask`` (and mmu additionally ``1/answer_length``).
    """
    ce = token_cross_entropy(logits, labels)
    masked = input_ids == mask_token
    valid = labels != -100
    out: Dict[str, jax.Array] = {}

    if batch_size_t2i > 0:
        sl = ce[:batch_size_t2i, max_seq_length + 1:]
        vm = valid[:batch_size_t2i, max_seq_length + 1:]
        out["loss_t2i"] = masked_mean(sl, vm)
    else:
        out["loss_t2i"] = jnp.asarray(0.0)

    lm_lo, lm_hi = batch_size_t2i, batch_size_t2i + batch_size_lm
    if batch_size_lm > 0:
        if p_mask_lm is None:
            p_mask_lm = jnp.ones(())
        m = masked[lm_lo:lm_hi] & valid[lm_lo:lm_hi]
        w = ce[lm_lo:lm_hi] / jnp.clip(p_mask_lm, 1e-9, None)
        if answer_lengths_lm is not None:
            w = w / jnp.clip(answer_lengths_lm, 1, None)
            out["loss_lm"] = (w * m).sum() / batch_size_lm
        else:
            out["loss_lm"] = (w * m).sum() / (batch_size_lm * logits.shape[1])
    else:
        out["loss_lm"] = jnp.asarray(0.0)

    if batch_size_mmu > 0:
        if p_mask_mmu is None:
            p_mask_mmu = jnp.ones(())
        if answer_lengths_mmu is None:
            answer_lengths_mmu = jnp.ones(())
        m = masked[-batch_size_mmu:] & valid[-batch_size_mmu:]
        w = (ce[-batch_size_mmu:] / jnp.clip(p_mask_mmu, 1e-9, None)
             / jnp.clip(answer_lengths_mmu, 1, None))
        out["loss_mmu"] = (w * m).sum() / batch_size_mmu
    else:
        out["loss_mmu"] = jnp.asarray(0.0)
    return out
