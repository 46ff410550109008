"""Masked-diffusion sampling math as pure, vectorized jnp ops.

The reference implements these with per-row python loops and `.item()` syncs
(``MMaDA-Parallel-A/generators/parallel_generator.py:23-99``,
``MMaDA-Parallel-M/models/sampling.py:31-36``).  Here every op is batched,
shape-static and differentiable-free, so the fused samplers can run them
inside ``jax.lax.scan`` without host round-trips.

Numerical notes
---------------
* The reference computes text confidence as a float64 softmax
  (``parallel_generator.py:193``, rationale in arXiv:2409.02908).  TPUs have
  no native f64, so confidences here default to float32; the parity test
  suite runs on CPU with ``jax_enable_x64`` to check the f64 path.
* Schedules return the *mask ratio* (fraction that remains masked), matching
  ``models/sampling.py:39-78``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

__all__ = [
    "cosine_schedule",
    "linear_schedule",
    "pow_schedule",
    "sigmoid_schedule",
    "get_mask_schedule",
    "add_gumbel_noise",
    "gumbel_argmax",
    "token_confidence",
    "get_num_transfer_tokens",
    "get_num_transfer_tokens_frontloaded",
    "topk_transfer_mask",
    "remask_lowest_exact",
    "remask_below_cutoff",
    "categorical_sample",
    "image_step_mask",
]

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# Mask-ratio schedules (MMaDA-Parallel-M/models/sampling.py:39-78)
# ---------------------------------------------------------------------------


def cosine_schedule(t: jax.Array) -> jax.Array:
    return jnp.cos(t * math.pi * 0.5)


def linear_schedule(t: jax.Array) -> jax.Array:
    return jnp.clip(1.0 - t, 1e-6, 1.0)


def pow_schedule(t: jax.Array, exponent: float) -> jax.Array:
    return jnp.clip(1.0 - t ** exponent, 1e-6, 1.0)


def sigmoid_schedule(t: jax.Array, start: float = -3.0, end: float = 3.0,
                     tau: float = 1.0, clip_min: float = 1e-6) -> jax.Array:
    v_start = jax.nn.sigmoid(jnp.asarray(start / tau))
    v_end = jax.nn.sigmoid(jnp.asarray(end / tau))
    out = jax.nn.sigmoid((t * (end - start) + start) / tau)
    out = (v_end - out) / (v_end - v_start)
    return jnp.clip(out, clip_min, 1.0)


def get_mask_schedule(method: str, **kwargs) -> Callable[[jax.Array], jax.Array]:
    """Schedule factory mirroring ``models/sampling.py:68-78``."""
    if method == "cosine":
        return cosine_schedule
    if method == "linear":
        return linear_schedule
    if method.startswith("pow"):
        return partial(pow_schedule, exponent=float(method[3:]))
    if method == "sigmoid":
        return partial(sigmoid_schedule, **kwargs)
    raise ValueError(f"Unknown schedule method: {method}")


# ---------------------------------------------------------------------------
# Gumbel sampling and confidence
# ---------------------------------------------------------------------------


def add_gumbel_noise(logits: jax.Array, temperature: float,
                     key: Optional[jax.Array]) -> jax.Array:
    """``logits + temperature * Gumbel`` (``parallel_generator.py:8-20``).

    ``temperature == 0`` (or ``key is None``) returns logits unchanged, which
    makes the subsequent argmax deterministic — the parity contract at temp 0.
    """
    if key is None or temperature == 0:
        return logits
    # Matches the reference's explicit -log(-log(u + eps) + eps) with
    # uniform u, rather than jax.random.gumbel, so the clipping behaviour
    # near u=0 is identical.
    u = jax.random.uniform(key, logits.shape, dtype=logits.dtype)
    g = -jnp.log(-jnp.log(u + 1e-10) + 1e-10)
    return logits + temperature * g


def gumbel_argmax(logits: jax.Array, temperature: float,
                  key: Optional[jax.Array]) -> jax.Array:
    """Gumbel-max sample (argmax at temperature 0)."""
    return jnp.argmax(add_gumbel_noise(logits, temperature, key), axis=-1)


def token_confidence(logits: jax.Array, chosen: jax.Array,
                     dtype=jnp.float32) -> jax.Array:
    """Softmax probability of each chosen token: ``[B, L]``.

    Reference: ``p = softmax(logits.float64); gather(p, chosen)``
    (``parallel_generator.py:192-194``).  Computed here as an exp of the
    log-softmax at the gathered index — one pass, no [B, L, V] probability
    tensor materialized.
    """
    logits = logits.astype(dtype)
    lse = jax.nn.logsumexp(logits, axis=-1)
    sel = jnp.take_along_axis(logits, chosen[..., None], axis=-1)[..., 0]
    return jnp.exp(sel - lse)


# ---------------------------------------------------------------------------
# Transfer budgets and top-k unmasking
# ---------------------------------------------------------------------------


def get_num_transfer_tokens(masked_counts: jax.Array, steps: int) -> jax.Array:
    """Per-step unmask budget ``[B, steps]``.

    Vectorized closed form of the reference's loop
    (``parallel_generator.py:78-99``): with ``T`` initial masks, after step
    ``s`` the target remaining is ``floor(T * (steps-1-s) / steps)``, so the
    step-``s`` budget is ``target(s-1) - target(s)``.  Sums to ``T`` exactly.
    """
    t = masked_counts.astype(jnp.int32)[:, None]          # [B, 1]
    s = jnp.arange(steps, dtype=jnp.int32)[None, :]       # [1, steps]
    target_after = (t * (steps - 1 - s)) // steps         # [B, steps]
    target_before = jnp.concatenate([t, target_after[:, :-1]], axis=1)
    return target_before - target_after


def get_num_transfer_tokens_frontloaded(masked_counts: jax.Array,
                                        steps: int) -> jax.Array:
    """M-variant per-step budget ``[B, steps]``.

    ``base + 1`` for the first ``remainder`` steps
    (``MMaDA-Parallel-M/models/modeling_mmada.py:63-81``) — note this
    differs from variant A's target-based schedule above (e.g. 10 masks over
    4 steps: A gives [3,2,3,2], M gives [3,3,2,2]); both are preserved.
    """
    t = masked_counts.astype(jnp.int32)[:, None]
    base = t // steps
    rem = t % steps
    s = jnp.arange(steps, dtype=jnp.int32)[None, :]
    return base + (s < rem).astype(jnp.int32)


def _rank_desc(values: jax.Array) -> jax.Array:
    """Rank of each element when sorted descending (0 = largest).

    Stable: ties resolve to the lower index first, matching torch.topk's
    sorted output order on contiguous tensors.
    """
    order = jnp.argsort(-values, axis=-1, stable=True)
    put = jnp.broadcast_to(jnp.arange(values.shape[-1], dtype=jnp.int32),
                           values.shape)
    ranks = jnp.zeros(values.shape, dtype=jnp.int32)
    return jnp.put_along_axis(ranks, order, put, axis=-1, inplace=False)


def topk_transfer_mask(confidence: jax.Array, k: jax.Array) -> jax.Array:
    """Boolean ``[B, L]`` mask selecting the per-row top-``k[b]`` confidences.

    Replaces the reference's per-row ``torch.topk`` loop
    (``parallel_generator.py:209-214``).  Selects exactly ``k[b]`` entries.
    """
    ranks = _rank_desc(confidence)
    return ranks < k[:, None]


def remask_lowest_exact(key: Optional[jax.Array], mask_len: jax.Array,
                        probs: jax.Array, temperature: float) -> jax.Array:
    """A-variant ``mask_by_random_topk`` (``parallel_generator.py:23-70``).

    ``confidence = log(probs + 1e-10) + temperature * N(0,1)``; returns True
    for exactly the ``mask_len[b]`` lowest-confidence positions (the tokens
    that remain masked).  Note variant A jitters with *gaussian* noise.
    """
    conf = jnp.log(probs + 1e-10)
    # Noise is gated on `key is not None` (a trace-time decision) so
    # `temperature` may be a traced per-step scalar (the reference decays it
    # as ``temp * (1 - ratio)``, parallel_generator.py:330).
    if key is not None:
        conf = conf + temperature * jax.random.normal(key, probs.shape,
                                                      dtype=probs.dtype)
    mask_len = jnp.clip(mask_len.astype(jnp.int32), 0, probs.shape[-1] - 1)
    ranks = _rank_desc(-conf)  # ascending rank: 0 = lowest confidence
    return ranks < mask_len[:, None]


def remask_below_cutoff(key: Optional[jax.Array], mask_len: jax.Array,
                        probs: jax.Array, temperature: float) -> jax.Array:
    """M-variant ``mask_by_random_topk`` (``models/sampling.py:31-36``).

    ``confidence = log(clamp(probs, 1e-20)) + temperature * Gumbel``; cutoff
    is the ``mask_len``-th smallest confidence and the result is
    ``confidence < cutoff`` (strict, so ties at the cutoff stay unmasked).
    """
    conf = jnp.log(jnp.clip(probs, 1e-20, None))
    if key is not None:
        u = jax.random.uniform(key, probs.shape, dtype=probs.dtype)
        g = -jnp.log(-jnp.log(jnp.clip(u, 1e-20, None)))
        conf = conf + temperature * g
    sorted_conf = jnp.sort(conf, axis=-1)
    k = jnp.clip(mask_len.astype(jnp.int32), 0, probs.shape[-1] - 1)
    cutoff = jnp.take_along_axis(sorted_conf, k[:, None], axis=-1)
    return conf < cutoff


def categorical_sample(key: Optional[jax.Array], logits: jax.Array,
                       temperature_is_zero: bool = False) -> jax.Array:
    """Multinomial over ``softmax(logits)`` — argmax when temp is 0.

    Mirrors ``parallel_generator.py:296-308``.
    """
    if temperature_is_zero or key is None:
        return jnp.argmax(logits, axis=-1)
    return jax.random.categorical(key, logits, axis=-1)


def top_k_top_p_filtering(logits: jax.Array, top_k: int = 0,
                          top_p: float = 1.0,
                          min_tokens_to_keep: int = 1) -> jax.Array:
    """Top-k / nucleus filtering (``models/sampling.py:80-118``).

    Returns logits with filtered entries set to ``-inf``-like NEG_INF.
    """
    V = logits.shape[-1]
    out = logits
    if top_k > 0:
        k = min(max(top_k, min_tokens_to_keep), V)
        kth = jnp.sort(out, axis=-1)[..., V - k][..., None]
        out = jnp.where(out < kth, NEG_INF, out)
    if top_p < 1.0:
        sort_idx = jnp.argsort(-out, axis=-1)
        sorted_logits = jnp.take_along_axis(out, sort_idx, axis=-1)
        cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
        remove = cum > top_p
        if min_tokens_to_keep > 1:
            remove = remove.at[..., :min_tokens_to_keep].set(False)
        # shift right so the first token above the threshold survives
        remove = jnp.concatenate(
            [jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
        scatter = jnp.put_along_axis(
            jnp.zeros_like(remove), sort_idx, remove, axis=-1, inplace=False)
        out = jnp.where(scatter, NEG_INF, out)
    return out


# ---------------------------------------------------------------------------
# Step scheduling
# ---------------------------------------------------------------------------


def image_step_mask(text_steps: int, timesteps: int) -> jnp.ndarray:
    """Boolean ``[text_steps]`` mask of the scheduled image-refresh steps.

    The reference tests ``step in linspace(text_steps//4, text_steps-1,
    timesteps).round()`` per step (``parallel_generator.py:157-159``).  Inside
    ``lax.scan`` that becomes this precomputed mask, indexed by the loop
    counter.
    """
    import numpy as np
    steps = np.linspace(text_steps // 4, text_steps - 1, timesteps)
    steps = np.round(steps).astype(np.int64)
    mask = np.zeros(text_steps, dtype=bool)
    mask[steps] = True
    return jnp.asarray(mask)
