"""M-variant multi-task training forwards.

The reference exposes three flavors on ``MMadaModelLM``
(``models/modeling_mmada.py:361-612``); here they are model-free functions:

* :func:`forward_process` — ONE concatenated ``[t2i | lm | mmu]`` batch,
  t2i rows get the pairwise padding bias, one forward, three losses
  (``:361-430``).
* :func:`forward_process_separate` — per-task forwards (``:433-513``),
  for when task sequence lengths differ too much to pad together.
* :func:`forward_t2i` — t2i-only (``:589-612``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from mmada_parallel_tpu.models.llada import LLaDAConfig, llada_forward
from mmada_parallel_tpu.ops.masks import pairwise_padding_mask, to_bias
from mmada_parallel_tpu.training.losses import (m_forward_process_losses,
                                                token_cross_entropy,
                                                masked_mean)

__all__ = ["forward_process", "forward_process_separate", "forward_t2i"]


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


def forward_process_separate(
    params: Any,
    cfg: LLaDAConfig,
    max_seq_length: int,
    t2i: Optional[Dict[str, jax.Array]] = None,
    lm: Optional[Dict[str, jax.Array]] = None,
    mmu: Optional[Dict[str, jax.Array]] = None,
) -> Dict[str, jax.Array]:
    """Per-task forwards (``modeling_mmada.py:433-513``).

    Each task dict: ``{"input_ids", "labels"}`` plus per-task extras
    (``t2i_masks`` / ``p_mask`` / ``answer_lengths``).
    """
    out: Dict[str, jax.Array] = {"loss_t2i": jnp.asarray(0.0),
                                 "loss_lm": jnp.asarray(0.0),
                                 "loss_mmu": jnp.asarray(0.0)}
    if t2i is not None:
        out["loss_t2i"] = forward_t2i(params, cfg, t2i["input_ids"],
                                      t2i["labels"], max_seq_length,
                                      t2i.get("t2i_masks"))
    if lm is not None:
        logits = llada_forward(params, cfg, lm["input_ids"])
        d = m_forward_process_losses(
            logits, lm["input_ids"], lm["labels"], 0,
            lm["input_ids"].shape[0], 0, max_seq_length,
            p_mask_lm=lm.get("p_mask"),
            answer_lengths_lm=lm.get("answer_lengths"),
            mask_token=cfg.mask_token_id)
        out["loss_lm"] = d["loss_lm"]
    if mmu is not None:
        logits = llada_forward(params, cfg, mmu["input_ids"])
        d = m_forward_process_losses(
            logits, mmu["input_ids"], mmu["labels"], 0, 0,
            mmu["input_ids"].shape[0], max_seq_length,
            p_mask_mmu=mmu.get("p_mask"),
            answer_lengths_mmu=mmu.get("answer_lengths"),
            mask_token=cfg.mask_token_id)
        out["loss_mmu"] = d["loss_mmu"]
    return out
