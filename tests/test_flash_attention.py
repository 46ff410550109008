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


def _rope_tables(L, D, theta=10000.0):
    from mmada_parallel_tpu.models.llada import _rope_sin_cos
    return _rope_sin_cos(L, D, theta)


class TestPackedRope:
    """Fused-RoPE packed-layout kernel (ops/rope_attention.py) vs the
    unpacked reshape->rope->einsum chain it replaces."""

    def _reference(self, q, k, v, sin, cos, bias, H, KV):
        from mmada_parallel_tpu.ops.attention import _packed_reference
        return _packed_reference(q, k, v, sin, cos, bias, H, KV)

    @pytest.mark.parametrize("L", [128, 300])
    def test_matches_reference_mha(self, L):
        from mmada_parallel_tpu.ops.rope_attention import flash_attention_rope
        B, H, D = 2, 4, 128
        q, k, v = (_rand((B, L, H * D), 0), _rand((B, L, H * D), 1),
                   _rand((B, L, H * D), 2))
        sin, cos = _rope_tables(L, D)
        got = np.asarray(flash_attention_rope(
            q, k, v, sin, cos, n_heads=H, interpret=True))
        want = np.asarray(self._reference(q, k, v, sin, cos, None, H, H))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_matches_reference_gqa(self):
        from mmada_parallel_tpu.ops.rope_attention import flash_attention_rope
        B, L, H, KV, D = 1, 128, 8, 2, 128
        q = _rand((B, L, H * D), 3)
        k, v = _rand((B, L, KV * D), 4), _rand((B, L, KV * D), 5)
        sin, cos = _rope_tables(L, D)
        got = np.asarray(flash_attention_rope(
            q, k, v, sin, cos, n_heads=H, n_kv_heads=KV, interpret=True))
        want = np.asarray(self._reference(q, k, v, sin, cos, None, H, KV))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_bias_and_ragged_positions(self):
        from mmada_parallel_tpu.ops.rope_attention import flash_attention_rope
        B, L, H, D = 2, 200, 2, 128
        q, k, v = (_rand((B, L, H * D), 6), _rand((B, L, H * D), 7),
                   _rand((B, L, H * D), 8))
        mask = np.ones((B, L), bool)
        mask[0, 150:] = False
        mask[1, 100:] = False
        pair = (mask[:, :, None] & mask[:, None, :])[:, None]
        bias = jnp.asarray(np.where(pair, 0.0, -1e30), jnp.float32)
        # per-row positions = rank among real tokens (the serving path)
        pos = np.maximum(np.cumsum(mask, axis=1) - 1, 0)
        sin, cos = _rope_tables(L, D)
        sin_b = jnp.take(sin, jnp.asarray(pos), axis=0)
        cos_b = jnp.take(cos, jnp.asarray(pos), axis=0)
        got = np.array(flash_attention_rope(
            q, k, v, sin_b, cos_b, bias, n_heads=H, interpret=True))
        want = np.array(self._reference(q, k, v, sin_b, cos_b, bias, H, H))
        got[~mask] = 0
        want[~mask] = 0
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_fully_masked_rows_are_finite(self):
        from mmada_parallel_tpu.ops.rope_attention import flash_attention_rope
        B, L, H, D = 1, 128, 1, 128
        q, k, v = (_rand((B, L, H * D), 9), _rand((B, L, H * D), 10),
                   _rand((B, L, H * D), 11))
        bias = jnp.full((B, 1, L, L), -1e30, jnp.float32)
        sin, cos = _rope_tables(L, D)
        got = np.asarray(flash_attention_rope(
            q, k, v, sin, cos, bias, n_heads=H, interpret=True))
        assert np.isfinite(got).all()

    def test_grad_through_custom_vjp(self):
        """Training differentiates through the kernel: the custom VJP's
        XLA-recompute backward must match grads of the reference chain."""
        from mmada_parallel_tpu.ops.attention import (_packed_diff_fn,
                                                      _packed_reference)
        B, L, H, D = 1, 128, 2, 128
        q, k, v = (_rand((B, L, H * D), 12), _rand((B, L, H * D), 13),
                   _rand((B, L, H * D), 14))
        sin, cos = _rope_tables(L, D)
        f = _packed_diff_fn(H, H, True)

        def loss_fused(q, k, v):
            return (f(q, k, v, sin, cos, None) ** 2).sum()

        def loss_ref(q, k, v):
            return (_packed_reference(q, k, v, sin, cos, None, H, H)
                    ** 2).sum()

        gq, gk, gv = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        wq, wk, wv = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(gq), np.asarray(wq),
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                                   atol=2e-3, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                                   atol=2e-3, rtol=1e-3)


def test_flash_grad_through_custom_vjp():
    """jax.grad through the BLHD flash path (dot_product_attention on TPU)
    must work — pallas_call itself is not reverse-differentiable."""
    from mmada_parallel_tpu.ops.attention import _flash_diff_fn, _xla_attention
    B, L, H, D = 1, 128, 2, 128
    q, k, v = (_rand((B, L, H, D), 15), _rand((B, L, H, D), 16),
               _rand((B, L, H, D), 17))
    f = _flash_diff_fn(True)
    gq = jax.grad(lambda q: (f(q, k, v, None) ** 2).sum())(q)
    wq = jax.grad(lambda q: (_xla_attention(q, k, v, None) ** 2).sum())(q)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(wq),
                               atol=2e-3, rtol=1e-3)


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


class TestPartitionedRope:
    """custom_partitioning rule for the packed kernel: per-shard lowering
    with local head counts must reproduce the global computation on the
    8-virtual-device CPU mesh (interpret-mode Pallas)."""

    def _run(self, tensor_axis_size, H, shard_heads=True):
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        from mmada_parallel_tpu.ops.rope_attention import partitioned_flash_rope
        from mmada_parallel_tpu.ops.attention import _packed_reference
        B, L, D = 2, 128, 128
        q, k, v = (_rand((B, L, H * D), 20), _rand((B, L, H * D), 21),
                   _rand((B, L, H * D), 22))
        from mmada_parallel_tpu.models.llada import _rope_sin_cos
        sin, cos = _rope_sin_cos(L, D, 10000.0)
        devs = np.array(jax.devices()[:tensor_axis_size]).reshape(
            1, tensor_axis_size)
        mesh = Mesh(devs, ("data", "tensor"))
        sh = NamedSharding(mesh, P("data", None, "tensor" if shard_heads
                                   else None))
        qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
        fn = partitioned_flash_rope(H, H, False, interpret=True)
        out = jax.jit(fn, out_shardings=sh)(qs, ks, vs, sin, cos)
        want = _packed_reference(q, k, v, sin, cos, None, H, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)

    def test_heads_sharded_tp4(self):
        self._run(4, 8)

    def test_heads_not_divisible_falls_back(self):
        # H=2 over tensor=4: rule must replicate heads instead of crashing
        self._run(4, 2)

    def test_unsharded_heads(self):
        self._run(2, 4, shard_heads=False)

    def test_dispatch_routes_multidevice(self):
        """_packed_diff_fn must route through the partitioned wrapper when
        more than one device exists (the CPU test env has 8) and still
        match the reference."""
        from mmada_parallel_tpu.ops.attention import (_packed_diff_fn,
                                                      _packed_reference)
        from mmada_parallel_tpu.models.llada import _rope_sin_cos
        assert len(jax.devices()) > 1
        B, L, H, D = 1, 128, 2, 128
        q, k, v = (_rand((B, L, H * D), 23), _rand((B, L, H * D), 24),
                   _rand((B, L, H * D), 25))
        sin, cos = _rope_sin_cos(L, D, 10000.0)
        got = _packed_diff_fn(H, H, True)(q, k, v, sin, cos, None)
        want = _packed_reference(q, k, v, sin, cos, None, H, H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-5, rtol=1e-4)


class TestPackedQOnly:
    """flash_attention_rope_qonly: pre-rotated K/V + fused q-rope at true
    absolute positions (the feature-cache hot path)."""

    def _case(self, B, n, L, H, D=128, bias=None, seed=30):
        from mmada_parallel_tpu.ops.rope_attention import (
            flash_attention_rope_qonly)
        from mmada_parallel_tpu.ops.attention import _packed_qonly_reference
        from mmada_parallel_tpu.models.llada import _rope_sin_cos
        rng = np.random.default_rng(seed)
        q = _rand((B, n, H * D), seed)
        k = _rand((B, L, H * D), seed + 1)
        v = _rand((B, L, H * D), seed + 2)
        sin, cos = _rope_sin_cos(L, D, 10000.0)
        pos = jnp.asarray(
            np.sort(rng.choice(L, size=(B, n), replace=False), axis=1))
        sin_q = jnp.take(sin, pos, axis=0)
        cos_q = jnp.take(cos, pos, axis=0)
        got = np.asarray(flash_attention_rope_qonly(
            q, k, v, sin_q, cos_q, bias, n_heads=H, interpret=True))
        want = np.asarray(_packed_qonly_reference(
            q, k, v, sin_q, cos_q, bias, H, H))
        np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)

    def test_subset_positions(self):
        self._case(2, 16, 300, 2)

    def test_full_width_q_block(self):
        self._case(1, 128, 256, 4)

    def test_bias(self):
        B, n, L, H = 1, 8, 200, 2
        bias = jnp.asarray(
            np.where(np.arange(L) < 150, 0.0, -1e30), jnp.float32
        ).reshape(1, 1, 1, L) * jnp.ones((1, 1, n, 1), jnp.float32)
        self._case(B, n, L, H, bias=bias)

    def test_model_partial_equals_full(self):
        """llada_hidden_partial over the packed cache must reproduce the
        full forward at the selected positions (kernel fallback on CPU,
        interpret-tested above; this guards the packed merge plumbing)."""
        from mmada_parallel_tpu.models.llada import (
            LLaDAConfig, init_llada_params, llada_hidden,
            llada_hidden_with_cache, llada_hidden_partial)
        cfg = LLaDAConfig.tiny(d_model=64, n_heads=2, n_kv_heads=2,
                               n_layers=2, mlp_hidden_size=96,
                               vocab_size=128)
        params = init_llada_params(jax.random.key(3), cfg)
        ids = jnp.asarray(
            np.random.default_rng(4).integers(0, 128, (2, 14)))
        h_full = np.asarray(llada_hidden(params, cfg, ids))
        _, cache = llada_hidden_with_cache(params, cfg, ids)
        sel = jnp.asarray([[1, 4, 9], [0, 7, 13]])
        sel_ids = jnp.take_along_axis(ids, sel, axis=1)
        h_part, _ = llada_hidden_partial(params, cfg, sel_ids, sel, cache)
        for b in range(2):
            np.testing.assert_allclose(
                np.asarray(h_part)[b], h_full[b, np.asarray(sel)[b]],
                atol=1e-5)


def test_partitioned_qonly_heads_sharded():
    """partitioned_flash_rope_qonly under a tensor mesh must reproduce the
    unsharded reference (lane shard = whole-head shard, local head counts)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from mmada_parallel_tpu.ops.rope_attention import (
        partitioned_flash_rope_qonly)
    from mmada_parallel_tpu.ops.attention import _packed_qonly_reference
    from mmada_parallel_tpu.models.llada import _rope_sin_cos
    B, n, L, H, D = 2, 16, 256, 4, 128
    q = _rand((B, n, H * D), 40)
    k, v = _rand((B, L, H * D), 41), _rand((B, L, H * D), 42)
    sin, cos = _rope_sin_cos(L, D, 10000.0)
    pos = jnp.asarray(np.stack([np.arange(n), np.arange(10, 10 + n)]))
    sin_q = jnp.take(sin, pos, axis=0)
    cos_q = jnp.take(cos, pos, axis=0)
    mesh = Mesh(np.array(jax.devices()[:4]).reshape(1, 4),
                ("data", "tensor"))
    sh = NamedSharding(mesh, P("data", None, "tensor"))
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))
    fn = partitioned_flash_rope_qonly(H, H, False, True, True)
    out = jax.jit(fn, out_shardings=sh)(qs, ks, vs, sin_q, cos_q)
    want = _packed_qonly_reference(q, k, v, sin_q, cos_q, None, H, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
