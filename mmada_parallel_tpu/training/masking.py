"""Forward-process (noising) masking for training, batched jnp.

Covers the reference's three masking recipes:

* A-variant ``mask_codes`` (``MMaDA-Parallel-A/train/train.py:28-53``):
  cosine/linear per-item mask ratio, uniform position choice, labels at
  masked positions only.
* M-variant ``mask_or_random_replace_tokens``
  (``MMaDA-Parallel-M/training/utils.py:77-175``, main path): per-image
  timestep -> schedule -> rounded mask count, random-permutation masking.
* M interleave "double cosine"
  (``training/train_interleave.py:652-670``): ``t ~ U(eps, 1)``;
  ``mask_prob = cos(clip(schedule(t), eps) * pi/2)``; image masked by
  random top-k to ``round(seq * p)`` clamped >=1, text by per-position
  Bernoulli(p) with the first token protected.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from mmada_parallel_tpu.ops import sampling as S

__all__ = ["mask_codes", "mask_tokens_schedule", "interleave_noising"]


def mask_codes(key: jax.Array, codes: jax.Array, schedule: str = "cosine",
               force_full_below: int = 0,
               mask_token: int = 126336) -> Tuple[jax.Array, jax.Array]:
    """A-variant per-sequence masking: ``(masked_codes, labels)``.

    ``codes``: ``[B, L]``.  Ratio = ``cos(u * pi/2)`` (or linear with the
    reference's ``r<0.05 -> r+0.05`` bump); at least 1 position masked.
    ``force_full_below``: sequences shorter than this mask everything
    (reference: ``len(codes) <= 5`` -> ratio 1.0 — caller passes true
    lengths via a padded batch and this threshold).
    """
    B, L = codes.shape
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (B,))
    if schedule == "cosine":
        ratio = jnp.cos(u * math.pi / 2)
    elif schedule == "linear":
        ratio = jnp.where(u < 0.05, u + 0.05, u)
    else:
        raise ValueError(schedule)
    if force_full_below > 0 and L <= force_full_below:
        ratio = jnp.ones_like(ratio)
    num = jnp.maximum((L * ratio).astype(jnp.int32), 1)
    # uniform random size-num subset via a random permutation threshold
    # (equivalent to the reference's random.sample draw)
    mask = jnp.argsort(jax.random.uniform(k2, (B, L)), axis=-1) < num[:, None]
    masked = jnp.where(mask, mask_token, codes)
    labels = jnp.where(mask, codes, -100)
    return masked, labels


def mask_tokens_schedule(
    key: jax.Array,
    image_tokens: jax.Array,
    schedule: Callable[[jax.Array], jax.Array] = S.cosine_schedule,
    min_masking_rate: float = 0.0,
    mask_token: int = 126336,
    noise_type: str = "mask",
    codebook_size: int = 8192,
    mask_contiguous_region: bool = False,
    predict_all_tokens: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """M-variant t2i masking: ``(input_ids, labels, mask_prob)``.

    Mirrors ``training/utils.py:77-175`` including the optional paths:
    ``noise_type="random_replace"`` substitutes random codebook tokens
    instead of MASK; ``mask_contiguous_region`` masks an approximate
    rectangle of the square token grid; ``predict_all_tokens`` labels every
    position (the reference pairs it with a ``1/p`` loss weight — returned
    here via ``mask_prob``).
    """
    B, L = image_tokens.shape
    k1, k2, k3, k4 = jax.random.split(key, 4)
    t = jax.random.uniform(k1, (B,))
    mask_prob = jnp.clip(schedule(t), min_masking_rate, None)
    num = jnp.clip(jnp.round(L * mask_prob).astype(jnp.int32), 1, None)

    if mask_contiguous_region:
        # approximate-rectangle masking on the sqrt(L) grid
        # (training/utils.py:117-144), vectorized: pick height ~ U within
        # the valid range, width = ceil(num/height), random top-left corner
        res = int(round(L ** 0.5))
        hmin = jnp.ceil(num / res).astype(jnp.int32)
        hmax = jnp.minimum(res, num)
        u = jax.random.uniform(k2, (B,))
        h = (hmin + (u * (hmax - hmin + 1)).astype(jnp.int32)).clip(1, res)
        w = jnp.minimum(jnp.ceil(num / h).astype(jnp.int32), res)
        ty = (jax.random.uniform(k3, (B,)) * (res - h + 1)).astype(jnp.int32)
        tx = (jax.random.uniform(k4, (B,)) * (res - w + 1)).astype(jnp.int32)
        rows = jnp.arange(res)[None, :, None]
        cols = jnp.arange(res)[None, None, :]
        grid = ((rows >= ty[:, None, None]) & (rows < (ty + h)[:, None, None])
                & (cols >= tx[:, None, None]) & (cols < (tx + w)[:, None, None]))
        mask = grid.reshape(B, res * res)[:, :L]
    else:
        # the reference's single-argsort draw (utils.py:115-116):
        # mask position j iff randperm[j] < num — draw-exact given the
        # same uniforms, and a uniform size-num subset either way
        mask = (jnp.argsort(jax.random.uniform(k2, (B, L)), axis=-1)
                < num[:, None])

    if noise_type == "mask":
        input_ids = jnp.where(mask, mask_token, image_tokens)
    elif noise_type == "random_replace":
        rnd = jax.random.randint(k3, (B, L), 0, codebook_size,
                                 image_tokens.dtype)
        input_ids = jnp.where(mask, rnd, image_tokens)
    else:
        raise ValueError(noise_type)

    if predict_all_tokens or noise_type == "random_replace":
        labels = image_tokens
    else:
        labels = jnp.where(mask, image_tokens, -100)
    return input_ids, labels, mask_prob


def interleave_noising(
    key: jax.Array,
    output_image_tokens: jax.Array,   # [B, N_vq] (already vocab-offset)
    output_text_ids: jax.Array,       # [B, max_text_len]
    eps: float = 1e-3,
    schedule: Callable[[jax.Array], jax.Array] = S.cosine_schedule,
    mask_token: int = 126336,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """M interleave noising: ``(noisy_img, img_labels, noisy_text,
    text_labels, t)``.

    Faithful to ``train_interleave.py:652-670`` including the *double
    cosine*: ``mask_prob = cos(clip(schedule(t), eps) * pi/2)``.
    """
    B, N = output_image_tokens.shape
    _, T = output_text_ids.shape
    k1, k2, k3 = jax.random.split(key, 3)
    t = jax.random.uniform(k1, (B,)) * (1 - eps) + eps
    mask_prob = jnp.cos(jnp.clip(schedule(t), eps, None) * math.pi * 0.5)

    num = jnp.clip(jnp.round(N * mask_prob).astype(jnp.int32), 1, None)
    # single-argsort permutation threshold, draw-exact vs the reference's
    # `torch.rand(...).argsort(-1) < num` (train_interleave.py:661-662)
    img_mask = (jnp.argsort(jax.random.uniform(k2, (B, N)), axis=-1)
                < num[:, None])
    noisy_img = jnp.where(img_mask, mask_token, output_image_tokens)
    img_labels = jnp.where(img_mask, output_image_tokens, -100)

    text_mask = jax.random.uniform(k3, (B, T)) < mask_prob[:, None]
    text_mask = text_mask.at[:, 0].set(False)  # first token protected
    noisy_text = jnp.where(text_mask, mask_token, output_text_ids)
    text_labels = jnp.where(text_mask, output_text_ids, -100)
    return noisy_img, img_labels, noisy_text, text_labels, t
