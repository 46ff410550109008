"""Property and oracle tests for the sampling ops.

Oracles are re-derivations of the reference loops
(``parallel_generator.py:23-99``), executed in plain numpy.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu.ops import sampling as S


def _reference_num_transfer(total_masks: int, steps: int):
    """Literal port of the reference python loop (parallel_generator.py:85-99)."""
    remaining = total_masks
    out = []
    for step in range(steps):
        ratio = (step + 1) / steps
        target_remaining = int(total_masks * (1 - ratio))
        tokens_to_unmask = max(0, remaining - target_remaining)
        out.append(tokens_to_unmask)
        remaining -= tokens_to_unmask
    return out


@pytest.mark.parametrize("total,steps", [(256, 128), (255, 16), (1, 4),
                                         (0, 8), (1024, 64), (37, 7)])
def test_num_transfer_matches_reference_loop(total, steps):
    got = S.get_num_transfer_tokens(jnp.asarray([total]), steps)[0]
    want = _reference_num_transfer(total, steps)
    assert list(np.asarray(got)) == want
    assert int(np.sum(np.asarray(got))) == total


def test_num_transfer_batched():
    counts = jnp.asarray([10, 0, 999])
    got = np.asarray(S.get_num_transfer_tokens(counts, 13))
    assert got.shape == (3, 13)
    assert list(got.sum(axis=1)) == [10, 0, 999]


def test_topk_transfer_mask_exact_k():
    rng = np.random.default_rng(1)
    conf = jnp.asarray(rng.normal(size=(4, 50)).astype(np.float32))
    k = jnp.asarray([0, 1, 17, 50])
    mask = np.asarray(S.topk_transfer_mask(conf, k))
    assert list(mask.sum(axis=1)) == [0, 1, 17, 50]
    # selected entries are exactly the k largest
    c = np.asarray(conf)
    for b, kk in enumerate([0, 1, 17, 50]):
        if 0 < kk < 50:
            thresh = np.sort(c[b])[::-1][kk - 1]
            assert c[b][mask[b]].min() >= thresh


def test_topk_transfer_mask_tie_stability():
    # ties resolve to the lower index, like stable sort / torch.topk
    conf = jnp.asarray([[1.0, 2.0, 2.0, 2.0, 0.0]])
    mask = np.asarray(S.topk_transfer_mask(conf, jnp.asarray([2])))
    assert list(mask[0]) == [False, True, True, False, False]


def test_remask_lowest_exact_zero_temp():
    probs = jnp.asarray([[0.5, 0.1, 0.9, 0.3, 0.7]])
    out = np.asarray(S.remask_lowest_exact(None, jnp.asarray([2]), probs, 0.0))
    # two lowest-confidence positions stay masked
    assert list(out[0]) == [False, True, False, True, False]
    assert out.sum() == 2


def test_remask_below_cutoff_zero_temp():
    probs = jnp.asarray([[0.5, 0.1, 0.9, 0.3, 0.7]])
    out = np.asarray(S.remask_below_cutoff(None, jnp.asarray([2]), probs, 0.0))
    # strict < cutoff: cutoff is the 2nd-smallest value (0.3); 0.1 < 0.3 only
    # — wait, sorted [0.1 0.3 0.5 0.7 0.9], k=2 -> cutoff=0.5 -> {0.1, 0.3}
    assert list(out[0]) == [False, True, False, True, False]


def test_gumbel_zero_temperature_is_identity():
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(2, 5, 7)))
    out = S.add_gumbel_noise(logits, 0.0, jax.random.key(0))
    assert np.array_equal(np.asarray(out), np.asarray(logits))
    out2 = S.add_gumbel_noise(logits, 1.0, None)
    assert np.array_equal(np.asarray(out2), np.asarray(logits))


def test_token_confidence_matches_softmax_gather():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(2, 6, 11)).astype(np.float32)
    chosen = rng.integers(0, 11, size=(2, 6))
    got = np.asarray(S.token_confidence(jnp.asarray(logits), jnp.asarray(chosen)))
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want = np.take_along_axis(p, chosen[..., None], axis=-1)[..., 0]
    np.testing.assert_allclose(got, want, rtol=2e-4)


def test_token_confidence_f64_path():
    """The reference computes confidence at f64 (parallel_generator.py:193);
    on CPU with x64 enabled the same path is available here."""
    rng = np.random.default_rng(7)
    logits = rng.normal(size=(1, 4, 9)).astype(np.float64)
    chosen = rng.integers(0, 9, size=(1, 4))
    with jax.enable_x64():
        got = np.asarray(S.token_confidence(jnp.asarray(logits),
                                            jnp.asarray(chosen),
                                            dtype=jnp.float64))
        assert got.dtype == np.float64
    e = np.exp(logits - logits.max(-1, keepdims=True))
    p = e / e.sum(-1, keepdims=True)
    want = np.take_along_axis(p, chosen[..., None], -1)[..., 0]
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_image_step_mask_matches_linspace_membership():
    text_steps, timesteps = 128, 64
    mask = np.asarray(S.image_step_mask(text_steps, timesteps))
    want_steps = set(
        np.round(np.linspace(text_steps // 4, text_steps - 1, timesteps))
        .astype(int).tolist())
    got_steps = set(np.nonzero(mask)[0].tolist())
    assert got_steps == want_steps


def test_schedules_monotone_and_bounded():
    t = jnp.linspace(0.0, 1.0, 33)
    for sched in [S.cosine_schedule, S.linear_schedule,
                  S.get_mask_schedule("pow2"), S.get_mask_schedule("sigmoid")]:
        v = np.asarray(sched(t))
        assert v.min() >= -1e-6 and v.max() <= 1.0 + 1e-6
        assert np.all(np.diff(v) <= 1e-6)  # non-increasing


def test_categorical_zero_temp_is_argmax():
    logits = jnp.asarray(np.random.default_rng(5).normal(size=(3, 9)))
    out = S.categorical_sample(jax.random.key(1), logits, temperature_is_zero=True)
    assert np.array_equal(np.asarray(out), np.argmax(np.asarray(logits), -1))
