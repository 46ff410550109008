"""Pallas flash-attention parity (interpreter mode on CPU — exact math)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu.ops.flash_attention import flash_attention
from mmada_parallel_tpu.ops.attention import _xla_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.default_rng(seed).normal(size=shape),
                       jnp.float32)


@pytest.mark.parametrize("L", [128, 256, 300])
def test_flash_matches_xla(L):
    B, H, KV, D = 2, 4, 4, 128
    q, k, v = (_rand((B, L, H, D), 0), _rand((B, L, KV, D), 1),
               _rand((B, L, KV, D), 2))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True))
    want = np.asarray(_xla_attention(q, k, v, None))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_gqa():
    B, L, H, KV, D = 1, 128, 8, 2, 128
    q, k, v = (_rand((B, L, H, D), 3), _rand((B, L, KV, D), 4),
               _rand((B, L, KV, D), 5))
    got = np.asarray(flash_attention(q, k, v, block_q=128, block_k=128,
                                     interpret=True))
    want = np.asarray(_xla_attention(q, k, v, None))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_flash_bias_padding_mask():
    B, L, H, D = 1, 256, 2, 128
    q, k, v = (_rand((B, L, H, D), 6), _rand((B, L, H, D), 7),
               _rand((B, L, H, D), 8))
    mask = np.ones((B, L), bool)
    mask[:, 200:] = False
    pair = (mask[:, :, None] & mask[:, None, :])[:, None]
    bias = jnp.asarray(np.where(pair, 0.0, -1e30), jnp.float32)
    got = np.asarray(flash_attention(q, k, v, bias=bias, block_q=128,
                                     block_k=128, interpret=True))
    want = np.asarray(_xla_attention(q, k, v, bias))
    np.testing.assert_allclose(got[:, :200], want[:, :200], atol=2e-5,
                               rtol=1e-4)


def test_flash_block_sparse_bias():
    """A fully-masked key block must not poison the online softmax."""
    B, L, H, D = 1, 256, 1, 128
    q, k, v = (_rand((B, L, H, D), 9), _rand((B, L, H, D), 10),
               _rand((B, L, H, D), 11))
    allow = np.zeros((1, 1, L, L), bool)
    allow[..., :128] = True  # queries attend only to the first key block
    bias = jnp.asarray(np.where(allow, 0.0, -1e30), jnp.float32)
    got = np.asarray(flash_attention(q, k, v, bias=bias, block_q=128,
                                     block_k=128, interpret=True))
    want = np.asarray(_xla_attention(q, k, v, bias))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
