"""Variant-M text-to-image MaskGit sampler as a fused scan.

Mirrors ``MMaDA-Parallel-M/models/modeling_mmada.py:264-359``
(``t2i_generate``): the image region is ``input_ids[:, -(num_vq+1):-1]``;
per step one batched ``cat([cond, uncond])`` forward with the uncond row
rebuilt as ``cat(uncond_prefix, cond[:, prompt_len:])``; muse-style CFG
``(1+g)*cond - g*uncond`` over the codebook slice; multinomial sample;
strict-cutoff re-mask with ``mask_len = clamp(floor(num_vq * schedule(r)),
1, unknown-1)`` and temperature decay ``temp*(1-r)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mmada_parallel_tpu.models.llada import LLaDAConfig, llada_head, llada_hidden
from mmada_parallel_tpu.ops import sampling as S

__all__ = ["T2IOptions", "t2i_generate"]


@dataclasses.dataclass(frozen=True)
class T2IOptions:
    timesteps: int = 18
    temperature: float = 1.0
    guidance_scale: float = 0.0
    schedule: str = "cosine"
    text_vocab_size: int = 126464
    codebook_size: int = 8192
    mask_token: int = 126336


def t2i_generate(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    uncond_input_ids: Optional[jax.Array] = None,
    prompt_len: int = 0,
    num_vq_tokens: int = 1024,
    opts: T2IOptions = T2IOptions(),
    attn_mask: Optional[jax.Array] = None,
    uncond_attn_mask: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns sampled image codes ``[B, num_vq_tokens]``.

    ``prompt_len`` plays the reference's ``resolution`` role
    (``modeling_mmada.py:299``): the uncond row is
    ``cat(uncond[:, :prompt_len+1], cond[:, prompt_len+1:])``.
    """
    B, L = input_ids.shape
    tvs, cb = opts.text_vocab_size, opts.codebook_size
    ist = L - (num_vq_tokens + 1)  # image region start: [-(n+1):-1]
    T = opts.timesteps

    sched = S.get_mask_schedule(opts.schedule)
    ratios = (jnp.arange(T, dtype=jnp.float32) + 1) / T
    mask_ratios = sched(ratios)
    temps = opts.temperature * (1.0 - ratios)

    use_cfg = opts.guidance_scale > 0 and uncond_input_ids is not None
    if use_cfg:
        un_prefix = uncond_input_ids[:, :prompt_len + 1]
        if attn_mask is not None and uncond_attn_mask is not None:
            both_mask = jnp.concatenate([attn_mask, uncond_attn_mask], axis=0)
        else:
            both_mask = None
    else:
        both_mask = attn_mask

    def vq_logits(ids, mask):
        hidden = llada_hidden(params, cfg, ids, mask)
        h = jax.lax.dynamic_slice_in_dim(hidden, ist, num_vq_tokens, axis=1)
        return llada_head(params, cfg, h, vocab_slice=(tvs, cb))

    def step_fn(carry, xs):
        ids, last_sampled, k = carry
        step_idx, mask_ratio, temp = xs
        keys = jax.random.split(k, 3) if k is not None else (None,) * 3
        next_key = keys[0] if k is not None else None

        cur = jax.lax.dynamic_slice_in_dim(ids, ist, num_vq_tokens, axis=1)
        unknown = cur == opts.mask_token
        cur_codes = cur - tvs

        if use_cfg:
            un = jnp.concatenate([un_prefix, ids[:, prompt_len + 1:]], axis=1)
            both = jnp.concatenate([ids, un], axis=0)
            vq2 = vq_logits(both, both_mask)
            logits = ((1 + opts.guidance_scale) * vq2[:B]
                      - opts.guidance_scale * vq2[B:])
        else:
            logits = vq_logits(ids, both_mask)

        sampled = S.categorical_sample(
            keys[1] if k is not None else None, logits,
            temperature_is_zero=(opts.temperature == 0))
        sampled = jnp.where(unknown, sampled, cur_codes)

        probs = jax.nn.softmax(logits, axis=-1)
        sel = jnp.take_along_axis(
            probs, jnp.clip(sampled, 0, cb - 1)[..., None], axis=-1)[..., 0]
        sel = jnp.where(unknown, sel, jnp.finfo(sel.dtype).max)

        mask_len = jnp.floor(num_vq_tokens * mask_ratio).astype(jnp.int32)
        mask_len = jnp.maximum(
            1, jnp.minimum(unknown.sum(axis=-1) - 1, mask_len))
        remask = S.remask_below_cutoff(
            keys[2] if (k is not None and opts.temperature != 0) else None,
            jnp.broadcast_to(mask_len, (B,)), sel, temp)

        new_img = jnp.where(remask, opts.mask_token, sampled + tvs)
        ids = jax.lax.dynamic_update_slice_in_dim(ids, new_img, ist, axis=1)
        return (ids, sampled, next_key), None

    # the reference returns the final step's pre-remask `sampled_ids`
    # (modeling_mmada.py:359) — every slot filled, no MASK leakage
    sampled0 = jnp.zeros((B, num_vq_tokens), input_ids.dtype)
    (final_ids, last_sampled, _), _ = jax.lax.scan(
        step_fn, (input_ids, sampled0, key),
        (jnp.arange(T), mask_ratios, temps))

    return jnp.clip(last_sampled, 0, cb - 1)
