"""M-variant multi-task training forwards.

The reference exposes three flavors on ``MMadaModelLM``
(``models/modeling_mmada.py:361-612``); here they are model-free functions:

* :func:`forward_process` — ONE concatenated ``[t2i | lm | mmu]`` batch,
  t2i rows get the pairwise padding bias, one forward, three losses
  (``:361-430``).
* :func:`forward_process_separate` — per-task forwards (``:433-516``),
  for when task sequence lengths differ too much to pad together; each
  task forward carries its own pairwise padding mask
  (``attention_mask_lm``/``attention_mask_mmu``, ref ``:474-478,492-496``).
* :func:`forward_process_separate_full_attn` — same split but every
  forward is maskless and the t2i CE runs over the WHOLE sequence, not
  just the image tail (``:518-587``, t2i loss at ``:533-547``).
* :func:`forward_t2i` — t2i-only (``:589-612``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mmada_parallel_tpu.models.llada import LLaDAConfig, llada_forward
from mmada_parallel_tpu.training.losses import (m_forward_process_losses,
                                                token_cross_entropy,
                                                masked_mean)

__all__ = ["forward_process", "forward_process_separate",
           "forward_process_separate_full_attn", "forward_t2i"]


def forward_process(
    params: Any,
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    labels: jax.Array,
    batch_size_t2i: int,
    batch_size_lm: int,
    batch_size_mmu: int,
    max_seq_length: int,
    t2i_masks: Optional[jax.Array] = None,
    p_mask_lm: Optional[jax.Array] = None,
    p_mask_mmu: Optional[jax.Array] = None,
    answer_lengths_mmu: Optional[jax.Array] = None,
    answer_lengths_lm: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """One forward over the concatenated batch; returns the loss dict.

    The reference builds an all-ones bias and overwrites the t2i rows with
    the pairwise padding bias (``:376-379``); expressed here as a [B, L]
    attention mask that is all-True for non-t2i rows.
    """
    B, L = input_ids.shape
    attn_mask = jnp.ones((B, L), bool)
    if t2i_masks is not None and batch_size_t2i > 0:
        attn_mask = attn_mask.at[:batch_size_t2i].set(
            t2i_masks.astype(bool))
    logits = llada_forward(params, cfg, input_ids, attn_mask)
    return m_forward_process_losses(
        logits, input_ids, labels, batch_size_t2i, batch_size_lm,
        batch_size_mmu, max_seq_length, p_mask_lm, p_mask_mmu,
        answer_lengths_mmu, answer_lengths_lm,
        mask_token=cfg.mask_token_id)


def forward_t2i(params: Any, cfg: LLaDAConfig, input_ids: jax.Array,
                labels: jax.Array, max_seq_length: int,
                t2i_masks: Optional[jax.Array] = None) -> jax.Array:
    """t2i-only CE on the image tail (``modeling_mmada.py:589-612``)."""
    logits = llada_forward(params, cfg, input_ids,
                           t2i_masks.astype(bool) if t2i_masks is not None
                           else None)
    ce = token_cross_entropy(logits[:, max_seq_length + 1:],
                             labels[:, max_seq_length + 1:])
    return masked_mean(ce, labels[:, max_seq_length + 1:] != -100)


def _separate_losses(
    params: Any,
    cfg: LLaDAConfig,
    max_seq_length: int,
    t2i: Optional[Dict[str, jax.Array]],
    lm: Optional[Dict[str, jax.Array]],
    mmu: Optional[Dict[str, jax.Array]],
    use_masks: bool,
    t2i_whole_sequence: bool,
) -> Dict[str, jax.Array]:
    """Shared body of the two ``_separate`` flavors."""
    out: Dict[str, jax.Array] = {"loss_t2i": jnp.asarray(0.0),
                                 "loss_lm": jnp.asarray(0.0),
                                 "loss_mmu": jnp.asarray(0.0)}
    if t2i is not None:
        if t2i_whole_sequence:
            # CE over the entire sequence, maskless forward (ref :533-547).
            logits = llada_forward(params, cfg, t2i["input_ids"])
            ce = token_cross_entropy(logits, t2i["labels"])
            out["loss_t2i"] = masked_mean(ce, t2i["labels"] != -100)
        else:
            out["loss_t2i"] = forward_t2i(
                params, cfg, t2i["input_ids"], t2i["labels"],
                max_seq_length,
                t2i.get("t2i_masks") if use_masks else None)
    if lm is not None:
        attn = lm.get("attention_mask") if use_masks else None
        logits = llada_forward(
            params, cfg, lm["input_ids"],
            attn.astype(bool) if attn is not None else None)
        d = m_forward_process_losses(
            logits, lm["input_ids"], lm["labels"], 0,
            lm["input_ids"].shape[0], 0, max_seq_length,
            p_mask_lm=lm.get("p_mask"),
            answer_lengths_lm=lm.get("answer_lengths"),
            mask_token=cfg.mask_token_id)
        out["loss_lm"] = d["loss_lm"]
    if mmu is not None:
        attn = mmu.get("attention_mask") if use_masks else None
        logits = llada_forward(
            params, cfg, mmu["input_ids"],
            attn.astype(bool) if attn is not None else None)
        d = m_forward_process_losses(
            logits, mmu["input_ids"], mmu["labels"], 0, 0,
            mmu["input_ids"].shape[0], max_seq_length,
            p_mask_mmu=mmu.get("p_mask"),
            answer_lengths_mmu=mmu.get("answer_lengths"),
            mask_token=cfg.mask_token_id)
        out["loss_mmu"] = d["loss_mmu"]
    return out


def forward_process_separate(
    params: Any,
    cfg: LLaDAConfig,
    max_seq_length: int,
    t2i: Optional[Dict[str, jax.Array]] = None,
    lm: Optional[Dict[str, jax.Array]] = None,
    mmu: Optional[Dict[str, jax.Array]] = None,
) -> Dict[str, jax.Array]:
    """Per-task forwards (``modeling_mmada.py:433-516``).

    Each task dict: ``{"input_ids", "labels"}`` plus per-task extras —
    ``t2i_masks`` for t2i, ``attention_mask`` / ``p_mask`` /
    ``answer_lengths`` for lm/mmu. Each forward carries the task's own
    pairwise padding mask (ref ``:463-466,474-478,492-496``); the t2i CE
    runs over the image tail only.
    """
    return _separate_losses(params, cfg, max_seq_length, t2i, lm, mmu,
                            use_masks=True, t2i_whole_sequence=False)


def forward_process_separate_full_attn(
    params: Any,
    cfg: LLaDAConfig,
    max_seq_length: int,
    t2i: Optional[Dict[str, jax.Array]] = None,
    lm: Optional[Dict[str, jax.Array]] = None,
    mmu: Optional[Dict[str, jax.Array]] = None,
) -> Dict[str, jax.Array]:
    """Per-task forwards, full attention (``modeling_mmada.py:518-587``).

    Differs from :func:`forward_process_separate` in two ways: every
    forward is maskless (full attention, no padding bias), and the t2i
    loss is CE over the WHOLE sequence rather than the image tail
    (ref ``:533-547``). ``max_seq_length`` is accepted for signature
    parity but unused by the t2i branch.
    """
    return _separate_losses(params, cfg, max_seq_length, t2i, lm, mmu,
                            use_masks=False, t2i_whole_sequence=True)
