"""ParaRL scaffold: trajectory-level RL with semantic rewards.

The paper's ParaRL stage (``README.md:51`` — "trajectory-level RL with
semantic rewards"; +1.5 Output Alignment over SFT) ships with **no training
code in the reference snapshot**, so this scaffold is designed from the
paper description: sample full denoising trajectories from the SFT policy,
score the final (text, image) pair with semantic reward models, and push
policy gradients through the per-step token-commit log-probabilities along
the whole trajectory (not just the final sample).

Pieces:

* :func:`rollout_ti2ti` — the fused sampler instrumented to record, per
  denoise step, the pre-step sequence state and the committed tokens
  (text transfers and image commits).  One scan, on-device.
* :func:`trajectory_log_prob` — re-evaluates the log-probability of the
  recorded commits under (current) ``params``; subsampling steps keeps the
  update affordable.
* :func:`pararl_loss` — REINFORCE with a moving baseline:
  ``-(R - b) * sum_t log pi(commit_t | state_t)``.
* :class:`RewardSpec` — pluggable reward callables (text quality /
  image-text alignment scorers live outside; any callable
  ``(final_ids, codes, meta) -> [B] float`` works).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from mmada_parallel_tpu.models.llada import LLaDAConfig, llada_forward
from mmada_parallel_tpu.ops import sampling as S
from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                        make_ti2ti_step)
from mmada_parallel_tpu.tokens import SequenceLayout

__all__ = ["rollout_ti2ti", "trajectory_log_prob", "pararl_loss",
           "RewardSpec", "extract_image_codes", "code_diversity_reward",
           "make_target_match_reward", "make_keyword_reward"]


@dataclasses.dataclass
class RewardSpec:
    """Weighted semantic rewards over the final (text, image) pair."""

    fns: Sequence[Callable[..., jax.Array]]
    weights: Sequence[float]

    def __call__(self, final_ids, codes, meta=None) -> jax.Array:
        total = 0.0
        for w, fn in zip(self.weights, self.fns):
            total = total + w * fn(final_ids, codes, meta)
        return total


# ---------------------------------------------------------------------------
# Concrete rewards
#
# The paper's semantic scorers are external VLM/CLIP services; these are
# self-contained proxies usable for smoke-training, unit tests, and as
# templates for wiring real scorers (any (final_ids, codes, meta) -> [B]
# float callable plugs into RewardSpec).
# ---------------------------------------------------------------------------


def extract_image_codes(final_ids, image_positions, text_vocab_size: int,
                        codebook_size: int, mask_token: int) -> jax.Array:
    """Reward-side code extraction: ``[B, N_vq]`` raw codes with ``-1`` at
    still-masked cells.

    The sampler's re-mask can leave cells masked through the final step;
    clipping ``mask_token - text_vocab_size`` into range would alias those
    cells to a real code (0 at the usual offsets) and grant unearned
    target-match reward for generating nothing.  ``-1`` never matches a
    target and is excluded by :func:`code_diversity_reward`.
    """
    img_pos = jnp.asarray(image_positions, jnp.int32)
    raw = final_ids[:, img_pos]
    codes = jnp.clip(raw - text_vocab_size, 0, codebook_size - 1)
    return jnp.where(raw == mask_token, -1, codes)


def code_diversity_reward(final_ids, codes, meta=None) -> jax.Array:
    """Fraction of distinct codebook entries per image — penalizes the
    collapsed-image failure mode.  Cells marked ``-1`` (still masked, see
    :func:`extract_image_codes`) count as neither a code nor a slot."""
    valid = codes >= 0
    s = jnp.sort(codes, axis=-1)
    distinct = 1 + (jnp.diff(s, axis=-1) != 0).sum(axis=-1)
    distinct = distinct - (~valid).any(axis=-1).astype(distinct.dtype)
    return distinct / jnp.maximum(valid.sum(axis=-1), 1)


def make_target_match_reward(target_codes) -> Callable:
    """Token-level alignment proxy: fraction of image codes matching a
    reference image's codes.  ``target_codes``: ``[N_vq]`` or ``[B, N_vq]``."""
    target = jnp.asarray(target_codes)

    def reward(final_ids, codes, meta=None) -> jax.Array:
        t = target if target.ndim == 2 else target[None, :]
        return (codes == t).mean(axis=-1)

    return reward


def make_keyword_reward(keyword_ids: Sequence[int],
                        text_start: int, text_end: int) -> Callable:
    """Text-instruction adherence proxy: fraction of required token ids
    present anywhere in the generated text span."""
    kw = jnp.asarray(list(keyword_ids), jnp.int32)

    def reward(final_ids, codes, meta=None) -> jax.Array:
        span = final_ids[:, text_start:text_end]            # [B, T]
        hit = (span[:, :, None] == kw[None, None, :]).any(axis=1)  # [B, K]
        return hit.mean(axis=-1)

    return reward


def rollout_ti2ti(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    input_ids: jax.Array,
    layout: SequenceLayout,
    opts: TI2TIOptions,
    key: jax.Array,
    uncond_text_prefix: Optional[np.ndarray] = None,
    uncond_image_prefix: Optional[np.ndarray] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Sample a trajectory, recording per-step states and commits.

    Returns ``(final_ids, traj)`` with ``traj`` containing::

        states       [steps, B, L]  sequence before each step
        commit_mask  [steps, B, L]  positions committed at that step
        committed    [steps, B, L]  tokens written (undefined off-mask)
    """
    step_fn = make_ti2ti_step(params, cfg, layout, opts,
                              uncond_text_prefix, uncond_image_prefix)
    ts, te = layout.text_start, layout.text_end
    masked0 = (input_ids[:, ts:te] == opts.mask_token).sum(axis=1)
    budgets = S.get_num_transfer_tokens(masked0, opts.text_steps)

    def wrapped(carry, xs):
        ids, k = carry
        (new_ids, new_key), _ = step_fn((ids, k), xs)
        commit = (new_ids != ids)
        return (new_ids, new_key), {"states": ids, "commit_mask": commit,
                                    "committed": new_ids}

    (final_ids, _), traj = jax.lax.scan(
        wrapped, (input_ids, key),
        (jnp.arange(opts.text_steps), budgets.T))
    return final_ids, traj


def trajectory_log_prob(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    traj: Dict[str, jax.Array],
    opts: TI2TIOptions,
    step_indices: Optional[jax.Array] = None,
) -> jax.Array:
    """``[B]`` summed log-prob of the recorded commits under ``params``.

    Image-position commits are scored on the codebook slice; text commits on
    the full vocab — both via one full forward per (sub)step.
    ``step_indices`` subsamples trajectory steps (e.g. 8 of 128).
    """
    states = traj["states"]
    commit_mask = traj["commit_mask"]
    committed = traj["committed"]
    if step_indices is not None:
        states = jnp.take(states, step_indices, axis=0)
        commit_mask = jnp.take(commit_mask, step_indices, axis=0)
        committed = jnp.take(committed, step_indices, axis=0)

    def per_step(carry, xs):
        state, mask, tokens = xs
        logits = llada_forward(params, cfg, state)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tok_logp = jnp.take_along_axis(
            logp, jnp.clip(tokens, 0, logits.shape[-1] - 1)[..., None],
            axis=-1)[..., 0]
        step_lp = jnp.where(mask, tok_logp, 0.0).sum(axis=1)   # [B]
        return carry + step_lp, None

    B = states.shape[1]
    total, _ = jax.lax.scan(per_step, jnp.zeros((B,)),
                            (states, commit_mask, committed))
    return total


def pararl_loss(
    params: Dict[str, Any],
    cfg: LLaDAConfig,
    traj: Dict[str, jax.Array],
    rewards: jax.Array,
    opts: TI2TIOptions,
    baseline: Optional[jax.Array] = None,
    step_indices: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """REINFORCE over the trajectory: ``-(R - b) * log pi(traj)``."""
    logp = trajectory_log_prob(params, cfg, traj, opts, step_indices)
    b = baseline if baseline is not None else jax.lax.stop_gradient(
        rewards.mean())
    advantage = jax.lax.stop_gradient(rewards - b)
    loss = -(advantage * logp).mean()
    return loss, {"reward_mean": rewards.mean(), "advantage_std":
                  advantage.std(), "traj_logp": logp.mean()}
