"""Semi-autoregressive block text decoding (MMU) as a fused scan.

Mirrors ``MMaDA-Parallel-M/models/modeling_mmada.py:618-691``
(``mmu_generate``): the answer is decoded in blocks of ``block_length``;
within a block, ``steps_per_block`` confidence top-k transfer steps run with
confidence beyond the current block forced to ``-inf``, so blocks complete
left-to-right.  Optional CFG masks the prompt in the uncond row
(``un_x[prompt_index] = mask``) with guidance
``uncond + (cfg+1)*(cond - uncond)`` (``modeling_mmada.py:661-666``).

The two nested python loops (blocks x steps) flatten into ONE scan over
``total_steps`` with the block index derived from the step counter; the
per-block transfer budget is static because every block starts fully masked
(confidence beyond the block boundary is -inf until the previous block
finishes).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from mmada_parallel_tpu.models.llada import LLaDAConfig, llada_forward
from mmada_parallel_tpu.ops import sampling as S

__all__ = ["MMUOptions", "mmu_generate", "mmu_generate_fast"]


def _extend_prompt_mask(attn_mask, B: int, P: int, L: int):
    """Normalize a ``[B, P]`` prompt mask (or ``[B, L]`` full mask) to a
    full-sequence bool mask + re-ranked RoPE position ids; the answer span
    is always real."""
    if attn_mask is None:
        return None, None
    from mmada_parallel_tpu.ops.masks import ragged_positions
    m = attn_mask.astype(bool)
    if m.shape[1] == P and P != L:
        m = jnp.concatenate([m, jnp.ones((B, L - P), bool)], axis=1)
    elif m.shape[1] != L:
        raise ValueError(
            f"attn_mask length {m.shape[1]} matches neither the prompt "
            f"({P}) nor the full sequence ({L})")
    return m, ragged_positions(m)


@dataclasses.dataclass(frozen=True)
class MMUOptions:
    max_new_tokens: int = 128
    steps: int = 128
    block_length: int = 128
    temperature: float = 0.0
    cfg_scale: float = 0.0
    remasking: str = "low_confidence"
    mask_token: int = 126336


def mmu_generate(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    prompt_ids: jax.Array,
    opts: MMUOptions = MMUOptions(),
    attn_mask: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """Returns the full ``[B, prompt_len + max_new_tokens]`` sequence.

    ``attn_mask`` (``[B, prompt_len]`` bool, True = real; a full-sequence
    ``[B, prompt_len + max_new_tokens]`` mask is also accepted) enables
    ragged batched prompts: pads are hidden from attention and RoPE
    positions are re-ranked (``ops.masks.ragged_positions``) so each row
    generates exactly what its unpadded single run would.

    Note: with ``cfg_scale > 0`` the batched cond/uncond forward runs
    without ``attn_mask`` — the reference has the same quirk
    (``modeling_mmada.py:661``), preserved for parity."""
    if opts.remasking == "random" and key is None:
        raise ValueError("remasking='random' requires a PRNG key")
    if opts.max_new_tokens % opts.block_length:
        raise ValueError("max_new_tokens must be a multiple of block_length")
    num_blocks = opts.max_new_tokens // opts.block_length
    if opts.steps % num_blocks:
        raise ValueError("steps must be a multiple of num_blocks")
    spb = opts.steps // num_blocks  # steps per block

    B, P = prompt_ids.shape
    L = P + opts.max_new_tokens
    x0_init = jnp.concatenate(
        [prompt_ids,
         jnp.full((B, opts.max_new_tokens), opts.mask_token, prompt_ids.dtype)],
        axis=1)
    prompt_index = x0_init != opts.mask_token
    attn_mask, pos_ids = _extend_prompt_mask(attn_mask, B, P, L)

    # per-block budget: block starts fully masked -> static schedule
    # (M's front-loaded remainder form, modeling_mmada.py:63-81)
    budgets = S.get_num_transfer_tokens_frontloaded(
        jnp.full((1,), opts.block_length), spb)[0]          # [spb]

    # per-step block end boundary (absolute position)
    step_ids = jnp.arange(opts.steps)
    block_of_step = step_ids // spb
    block_end = P + (block_of_step + 1) * opts.block_length  # [steps]
    step_in_block = step_ids % spb

    # answer-span coordinates: the prompt is never masked, so argmax/
    # confidence/transfer only ever act on [P, L) — the 134k-vocab head
    # runs on max_new_tokens positions instead of the whole sequence
    # (the reference projects every position, modeling_mmada.py:661-666)
    N = opts.max_new_tokens
    ans_pos = P + jnp.arange(N)[None, :]  # [1, N] absolute positions

    def answer_logits(x):
        from mmada_parallel_tpu.models.llada import llada_head, llada_hidden
        if opts.cfg_scale > 0.0:
            un_x = jnp.where(prompt_index, opts.mask_token, x)
            both = jnp.concatenate([x, un_x], axis=0)
            hidden = llada_hidden(params, cfg, both)
            h = jax.lax.dynamic_slice_in_dim(hidden, P, N, axis=1)
            logits2 = llada_head(params, cfg, h)
            cond, uncond = logits2[:B], logits2[B:]
            return uncond + (opts.cfg_scale + 1) * (cond - uncond)
        hidden = llada_hidden(params, cfg, x, attn_mask, pos_ids)
        h = jax.lax.dynamic_slice_in_dim(hidden, P, N, axis=1)
        return llada_head(params, cfg, h)

    def step_fn(carry, xs):
        x, k = carry
        bend, sib = xs
        keys = jax.random.split(k, 3) if k is not None else (None,) * 3
        next_key = keys[0] if k is not None else None

        cur = jax.lax.dynamic_slice_in_dim(x, P, N, axis=1)
        mask_index = cur == opts.mask_token
        logits = answer_logits(x)

        x0 = S.gumbel_argmax(
            logits, opts.temperature,
            keys[1] if (k is not None and opts.temperature != 0) else None)
        if opts.remasking == "low_confidence":
            conf = S.token_confidence(logits, x0)
        else:
            conf = jax.random.uniform(keys[2], x0.shape)

        # confidence beyond the current block boundary -> -inf
        conf = jnp.where(ans_pos >= bend, S.NEG_INF, conf)
        x0 = jnp.where(mask_index, x0, cur)
        conf = jnp.where(mask_index, conf, S.NEG_INF)

        k_budget = jnp.broadcast_to(budgets[sib], (B,))
        transfer = S.topk_transfer_mask(conf, k_budget)
        new_ans = jnp.where(transfer, x0, cur)
        x = jax.lax.dynamic_update_slice_in_dim(x, new_ans, P, axis=1)
        return (x, next_key), None

    (final_x, _), _ = jax.lax.scan(
        step_fn, (x0_init, key), (block_end, step_in_block))
    return final_x


def mmu_generate_fast(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    prompt_ids: jax.Array,
    opts: MMUOptions = MMUOptions(),
    eot_token: Optional[int] = None,
    attn_mask: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
) -> jax.Array:
    """``mmu_generate`` with the early-exit of ``modeling_mmada.py:693-766``:
    after each block, stop if every row's block-final token is ``eot``.

    Implemented as ``lax.while_loop`` over blocks (dynamic trip count) with
    an inner ``fori_loop`` over the per-block steps, so the saved blocks are
    genuinely not computed.
    """
    if eot_token is None:
        return mmu_generate(params, cfg, prompt_ids, opts, attn_mask, key)
    if opts.remasking == "random" and key is None:
        raise ValueError("remasking='random' requires a PRNG key")
    if opts.max_new_tokens % opts.block_length:
        raise ValueError("max_new_tokens must be a multiple of block_length")
    num_blocks = opts.max_new_tokens // opts.block_length
    if opts.steps % num_blocks:
        raise ValueError("steps must be a multiple of num_blocks")
    spb = opts.steps // num_blocks

    B, P = prompt_ids.shape
    L = P + opts.max_new_tokens
    x0_init = jnp.concatenate(
        [prompt_ids,
         jnp.full((B, opts.max_new_tokens), opts.mask_token, prompt_ids.dtype)],
        axis=1)
    prompt_index = x0_init != opts.mask_token
    attn_mask, pos_ids = _extend_prompt_mask(attn_mask, B, P, L)
    budgets = S.get_num_transfer_tokens_frontloaded(
        jnp.full((1,), opts.block_length), spb)[0]

    N = opts.max_new_tokens
    ans_pos = P + jnp.arange(N)[None, :]

    def block_step(x, bend, sib, k):
        from mmada_parallel_tpu.models.llada import llada_head, llada_hidden
        cur = jax.lax.dynamic_slice_in_dim(x, P, N, axis=1)
        mask_index = cur == opts.mask_token
        if opts.cfg_scale > 0.0:
            un_x = jnp.where(prompt_index, opts.mask_token, x)
            hidden = llada_hidden(params, cfg,
                                  jnp.concatenate([x, un_x], axis=0))
            h = jax.lax.dynamic_slice_in_dim(hidden, P, N, axis=1)
            logits2 = llada_head(params, cfg, h)
            cond, uncond = logits2[:B], logits2[B:]
            logits = uncond + (opts.cfg_scale + 1) * (cond - uncond)
        else:
            hidden = llada_hidden(params, cfg, x, attn_mask, pos_ids)
            h = jax.lax.dynamic_slice_in_dim(hidden, P, N, axis=1)
            logits = llada_head(params, cfg, h)
        if k is not None:
            k_noise, k_rand = jax.random.split(k)
        else:
            k_noise = k_rand = None
        x0 = S.gumbel_argmax(logits, opts.temperature,
                             k_noise if opts.temperature != 0 else None)
        if opts.remasking == "low_confidence":
            conf = S.token_confidence(logits, x0)
        else:
            conf = jax.random.uniform(k_rand, x0.shape)
        conf = jnp.where(ans_pos >= bend, S.NEG_INF, conf)
        x0 = jnp.where(mask_index, x0, cur)
        conf = jnp.where(mask_index, conf, S.NEG_INF)
        transfer = S.topk_transfer_mask(conf, jnp.broadcast_to(budgets[sib],
                                                               (B,)))
        new_ans = jnp.where(transfer, x0, cur)
        return jax.lax.dynamic_update_slice_in_dim(x, new_ans, P, axis=1)

    def outer_cond(state):
        b, x, k, done = state
        return (b < num_blocks) & (~done)

    def outer_body(state):
        b, x, k, done = state
        bend = P + (b + 1) * opts.block_length

        def inner(i, carry):
            x, k = carry
            if k is not None:
                k, sub = jax.random.split(k)
            else:
                sub = None
            return block_step(x, bend, i, sub), k

        x, k = jax.lax.fori_loop(0, spb, inner, (x, k))
        done = jnp.all(x[:, bend - 1] == eot_token)
        return b + 1, x, k, done

    _, final_x, _, _ = jax.lax.while_loop(
        outer_cond, outer_body,
        (jnp.asarray(0), x0_init, key, jnp.asarray(False)))
    return final_x
