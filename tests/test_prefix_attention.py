"""Prefix-masked (block-skip) attention — the FlexAttention counterpart.

Pins: (a) the prefix-bounds spec is EXACTLY the dense task masks
(``kv < bounds``), for every family the reference compiles block masks
for (``omni_attention.py:22-135``); (b) the skipping Pallas kernel
(interpret mode) matches the dense-bias XLA chain bitwise-closely;
(c) the custom VJP's gradients match dense-path gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmada_parallel_tpu.ops import masks
from mmada_parallel_tpu.ops.attention import (_prefix_dense_bias,
                                              _packed_prefix_diff_fn,
                                              rope_attention,
                                              rope_attention_prefix)
from mmada_parallel_tpu.ops.rope_attention import (
    flash_attention_rope_prefix)

L = 21
SPANS = ((3, 9),)
MMU_PREFIX = 7


def _dense(kind):
    if kind == "causal":
        return masks.causal_mask(L)
    if kind == "mmu":
        return masks.mmu_mask(L, MMU_PREFIX)
    return masks.t2i_mask(L, SPANS)


def _bounds(kind):
    if kind == "causal":
        return masks.prefix_bounds(L)
    if kind == "mmu":
        return masks.prefix_bounds(L, MMU_PREFIX)
    return masks.prefix_bounds(L, 0, SPANS)


@pytest.mark.parametrize("kind", ["causal", "mmu", "t2i"])
def test_prefix_bounds_equal_dense_masks(kind):
    dense = np.asarray(_dense(kind))[0, 0]
    hi = np.asarray(_bounds(kind))
    cols = np.arange(L)
    np.testing.assert_array_equal(dense, cols[None, :] < hi[:, None])


def test_mixed_prefix_bounds_equal_mixed_mask():
    dense = np.asarray(masks.mixed_mask(L, 2, 1, 2, SPANS, MMU_PREFIX))
    hi = np.asarray(masks.mixed_prefix_bounds(L, 2, 1, 2, SPANS,
                                              MMU_PREFIX))
    cols = np.arange(L)
    np.testing.assert_array_equal(dense[:, 0],
                                  cols[None, None, :] < hi[:, :, None])


def _toy(B=2, Lq=160, H=2, KV=2, D=128, seed=0):
    ks = jax.random.split(jax.random.key(seed), 5)
    HD, KVD = H * D, KV * D
    q = jax.random.normal(ks[0], (B, Lq, HD), jnp.float32)
    k = jax.random.normal(ks[1], (B, Lq, KVD), jnp.float32)
    v = jax.random.normal(ks[2], (B, Lq, KVD), jnp.float32)
    pos = jnp.arange(Lq, dtype=jnp.float32)
    inv = 1.0 / (10000.0 ** (jnp.arange(0, D, 2, jnp.float32) / D))
    ang = pos[:, None] * inv[None, :]
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)
    return q, k, v, sin, cos


@pytest.mark.parametrize("kind,gqa", [("causal", False), ("mmu", False),
                                      ("t2i", False), ("causal", True)])
def test_prefix_kernel_matches_dense_bias(kind, gqa):
    """Interpret-mode kernel vs the dense-bias XLA chain; odd L exercises
    the q/k padding and the partial last chunk."""
    Lq = 160
    H, KV = (4, 2) if gqa else (2, 2)
    q, k, v, sin, cos = _toy(Lq=Lq, H=H, KV=KV)
    spans = ((16, 80),) if kind == "t2i" else ()
    pe = 48 if kind == "mmu" else 0
    hi = jnp.broadcast_to(masks.prefix_bounds(Lq, pe, spans)[None],
                          (q.shape[0], Lq))
    got = flash_attention_rope_prefix(q, k, v, sin, cos, hi, n_heads=H,
                                      n_kv_heads=KV, block_q=128,
                                      block_k=128, interpret=True)
    bias = masks.to_bias(_prefix_dense_bias(hi, Lq))
    want = rope_attention(q, k, v, sin, cos, bias, n_heads=H,
                          n_kv_heads=KV, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("block_k", [256, 1024, 1 << 20])
def test_prefix_kernel_block_k_sweep(block_k):
    """Coarser chunks (incl. block_k >= Lk -> ONE bounds-masked dot, the
    no-skip fast path) are numerically identical; the wrapper clamps
    oversized block_k instead of inflating the K padding."""
    Lq = 160
    q, k, v, sin, cos = _toy(Lq=Lq)
    hi = jnp.broadcast_to(masks.prefix_bounds(Lq, 48)[None],
                          (q.shape[0], Lq))
    got = flash_attention_rope_prefix(q, k, v, sin, cos, hi, n_heads=2,
                                      block_k=block_k, interpret=True)
    bias = masks.to_bias(_prefix_dense_bias(hi, Lq))
    want = rope_attention(q, k, v, sin, cos, bias, n_heads=2, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_impl_pallas_refuses_silent_fallback():
    """Forcing the skip kernel must error loudly when it can't run —
    not quietly measure the dense path (r5 review finding)."""
    q, k, v, sin, cos = _toy(B=1, Lq=96)
    hi = jnp.broadcast_to(masks.prefix_bounds(96, 24)[None], (1, 96))
    with pytest.raises(ValueError, match="TPU backend"):
        rope_attention_prefix(q, k, v, sin, cos, hi, n_heads=2,
                              impl="pallas")
    with pytest.raises(ValueError, match="head_dim"):
        rope_attention_prefix(q[:, :, :128], k[:, :, :128], v[:, :, :128],
                              sin[:, :32], cos[:, :32], hi, n_heads=4,
                              impl="pallas")


def test_prefix_kernel_rejects_bad_bounds_shape():
    q, k, v, sin, cos = _toy(B=1, Lq=160)
    hi = jnp.ones((2, 160), jnp.int32)   # batch mismatch
    with pytest.raises(ValueError, match="kv_hi"):
        flash_attention_rope_prefix(q, k, v, sin, cos, hi, n_heads=2,
                                    interpret=True)


def test_prefix_kernel_mixed_batch():
    Lq = 160
    q, k, v, sin, cos = _toy(B=3, Lq=Lq)
    hi = masks.mixed_prefix_bounds(Lq, 1, 1, 1, ((16, 96),), 32)
    got = flash_attention_rope_prefix(q, k, v, sin, cos, hi, n_heads=2,
                                      block_k=128, interpret=True)
    bias = masks.to_bias(_prefix_dense_bias(hi, Lq))
    want = rope_attention(q, k, v, sin, cos, bias, n_heads=2, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=2e-5)


def test_prefix_custom_vjp_gradients_match_dense():
    q, k, v, sin, cos = _toy(B=1, Lq=140)
    hi = jnp.broadcast_to(masks.prefix_bounds(140, 32)[None], (1, 140))
    f = _packed_prefix_diff_fn(2, 2, interpret=True)

    def loss_fast(q, k, v):
        return jnp.sum(f(q, k, v, sin, cos, hi) ** 2)

    def loss_dense(q, k, v):
        bias = masks.to_bias(_prefix_dense_bias(hi, 140))
        return jnp.sum(rope_attention(q, k, v, sin, cos, bias, n_heads=2,
                                      impl="xla") ** 2)

    g_fast = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_fast, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_rope_attention_prefix_cpu_fallback_matches():
    """Off-TPU the dispatcher materializes the dense bias: same numbers."""
    q, k, v, sin, cos = _toy(B=1, Lq=96)
    hi = jnp.broadcast_to(masks.prefix_bounds(96, 24)[None], (1, 96))
    got = rope_attention_prefix(q, k, v, sin, cos, hi, n_heads=2)
    bias = masks.to_bias(_prefix_dense_bias(hi, 96))
    want = rope_attention(q, k, v, sin, cos, bias, n_heads=2, impl="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6)
