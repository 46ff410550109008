"""Tests: m_tasks forwards, diagnostics, determinism, imagenet dataset,
tokenizer wrapper probing."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu.models.llada import LLaDAConfig, init_llada_params
from mmada_parallel_tpu.training import m_tasks as MT
from mmada_parallel_tpu.utils.diagnostics import masking_bucket_metrics
from mmada_parallel_tpu.utils.determinism import set_seed
from mmada_parallel_tpu.data.imagenet import ImageFolderCaptionDataset
from mmada_parallel_tpu.data.tokenizer import Tokenizer, ConversationTemplate

MASK = 250


@pytest.fixture(scope="module")
def model():
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=288,
                           mask_token_id=MASK)
    return cfg, init_llada_params(jax.random.key(0), cfg)


def test_forward_process_mixed_batch(model):
    cfg, params = model
    rng = np.random.default_rng(0)
    B, L, msl = 3, 20, 8
    ids = rng.integers(0, 200, (B, L)).astype(np.int32)
    ids[1, 5:9] = MASK   # lm row masked positions
    ids[2, 12:15] = MASK  # mmu row
    labels = np.where(rng.uniform(size=(B, L)) < 0.5,
                      rng.integers(0, 200, (B, L)), -100).astype(np.int32)
    t2i_masks = np.ones((1, L), np.int32)
    t2i_masks[0, :3] = 0
    out = MT.forward_process(
        params, cfg, jnp.asarray(ids), jnp.asarray(labels),
        1, 1, 1, msl, t2i_masks=jnp.asarray(t2i_masks),
        p_mask_lm=jnp.full((1, L), 0.5),
        p_mask_mmu=jnp.full((1, L), 0.5),
        answer_lengths_mmu=jnp.full((1, L), 4.0))
    for k in ["loss_t2i", "loss_lm", "loss_mmu"]:
        assert np.isfinite(float(out[k])), k


def test_forward_process_separate(model):
    cfg, params = model
    rng = np.random.default_rng(1)
    msl = 8
    mk = lambda B, L: {
        "input_ids": jnp.asarray(rng.integers(0, 200, (B, L))),
        "labels": jnp.asarray(np.where(rng.uniform(size=(B, L)) < 0.5,
                                       rng.integers(0, 200, (B, L)), -100)),
    }
    out = MT.forward_process_separate(params, cfg, msl, t2i=mk(1, 16),
                                      lm=mk(2, 12), mmu=mk(1, 14))
    assert all(np.isfinite(float(v)) for v in out.values())


def test_masking_bucket_metrics(model):
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(4, 6, 16)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 16, (4, 6)))
    frac = jnp.asarray([0.05, 0.35, 0.65, 0.95])
    out = masking_bucket_metrics(logits, labels, frac)
    assert int(out["count_bucket_0.1"]) == 1
    assert int(out["count_bucket_0.4"]) == 1
    assert float(out["ce_bucket_0.1"]) > 0
    # empty bucket reports 0
    assert float(out["ce_bucket_0.2"]) == 0.0


def test_set_seed_reproducible():
    set_seed(123)
    a = np.random.rand(3)
    set_seed(123)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)


def test_imagefolder_captions(tmp_path):
    from PIL import Image
    for cls in ["tabby_cat", "dog"]:
        d = tmp_path / cls
        d.mkdir()
        Image.new("RGB", (8, 8)).save(d / "a.png")
    ds = ImageFolderCaptionDataset(str(tmp_path))
    assert len(ds) == 2
    item = ds[1]  # sorted: dog < tabby_cat -> idx 1 is tabby
    assert item["caption"] == "An image of tabby cat."
    assert item["image"].size == (8, 8)


class _SpacedTok:
    """HF-like tokenizer where segments need a leading space."""
    bos_token_id, eos_token_id = 1, 2

    def encode(self, s, **kw):
        return [100 + ord(c) for c in s]

    def decode(self, ids, **kw):
        return "".join(chr(i - 100) for i in ids)


def test_tokenizer_wrapper_probe(monkeypatch, tmp_path):
    import mmada_parallel_tpu.data.tokenizer as TKZ

    class FakeAuto:
        @staticmethod
        def from_pretrained(path, **kw):
            return _SpacedTok()

    import transformers
    monkeypatch.setattr(transformers, "AutoTokenizer", FakeAuto)
    tok = Tokenizer(str(tmp_path))
    # char-level fake: "Hi my darling"[-len("my darling"):] == "my darling"
    assert tok.need_space_before_segment is False
    assert tok.encode("ab", bos=True, eos=True) == [1, 100 + ord("a"),
                                                    100 + ord("b"), 2]
    assert tok.encode_segment("  x") == [100 + ord("x")]


def test_conversation_template():
    c = ConversationTemplate()
    c.append_message("user", "hello")
    c.append_message("assistant", "hi")
    assert c.messages == [["user", "hello"], ["assistant", "hi"]]
    c.clear()
    assert c.messages == []


def test_compile_cache_enable(tmp_path, monkeypatch):
    """utils/compile_cache: persistent XLA cache dir is created and picked
    up by jax; opt-out env wins."""
    import jax
    from mmada_parallel_tpu.utils.compile_cache import enable_compilation_cache

    session_dir = jax.config.jax_compilation_cache_dir   # conftest's
    d = str(tmp_path / "xla")
    got = enable_compilation_cache(d, min_compile_secs=0.0)
    assert got == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d

    # env default: an explicit arg is absent, MMADA_TPU_COMPILE_CACHE wins
    env_d = str(tmp_path / "env_xla")
    monkeypatch.setenv("MMADA_TPU_COMPILE_CACHE", env_d)
    assert enable_compilation_cache() == env_d

    monkeypatch.setenv("MMADA_TPU_NO_COMPILE_CACHE", "1")
    assert enable_compilation_cache(str(tmp_path / "other")) is None
    # restore the session cache (the tmp dirs die with this test)
    jax.config.update("jax_compilation_cache_dir", session_dir)
