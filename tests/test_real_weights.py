"""Real released-checkpoint readiness: one command when weights exist.

No code path on this host has ever loaded the released
``tyfeld/MMaDA-Parallel-{A,M}`` weights (no egress; the 8B-dims
converter name audits in ``tests/test_convert.py`` run against the
reference MODULES, not real tensors).  These tests close that gap the
moment a copy is reachable: point the env vars at HF checkpoint dirs
(the layout ``inference.py:82-96`` loads) and run pytest —

    MMADA_REAL_CKPT_A=/ckpts/MMaDA-Parallel-A \\
    MMADA_REAL_CKPT_M=/ckpts/MMaDA-Parallel-M \\
    pytest tests/test_real_weights.py -q

Per variant: (1) convert -> EXACT fp32 per-tensor parity against every
safetensors entry through the inverse name map (round-trip, so nothing
is silently dropped or transposed); (2) one tiny-step generation with
the real weights through the real sampler (bf16, few steps — a smoke
that the 8B graph runs end-to-end, not a quality eval).  Skips cleanly
— loudly — when the env vars are unset."""

import os

import numpy as np
import pytest

ENV_A = "MMADA_REAL_CKPT_A"
ENV_M = "MMADA_REAL_CKPT_M"


def _ckpt_or_skip(env):
    path = os.environ.get(env, "")
    if not path:
        pytest.skip(f"{env} unset — point it at the released HF "
                    "checkpoint dir to run real-weights parity")
    if not os.path.isdir(path):
        pytest.fail(f"{env}={path!r} is not a directory")
    return path


def _convert_and_audit(path):
    """Load + convert, then round-trip back to a state dict and compare
    EVERY tensor bit-exactly against the on-disk safetensors."""
    from mmada_parallel_tpu.models import convert as CV

    tensors = CV.load_safetensors_dir(path)
    cfg, params = CV.load_llada_checkpoint(path, dtype=np.float32)
    back = CV.llada_state_dict_from_params(params, cfg)
    missing = sorted(set(tensors) - set(back))
    extra = sorted(set(back) - set(tensors))
    assert not missing, f"converter dropped tensors: {missing[:8]} ..."
    assert not extra, f"converter invented tensors: {extra[:8]} ..."
    for name in tensors:
        np.testing.assert_array_equal(
            np.asarray(back[name], np.float32),
            np.asarray(tensors[name], np.float32),
            err_msg=f"per-tensor parity failed at {name}")
    return cfg, params


@pytest.mark.heavy
def test_real_weights_a_convert_and_tiny_edit():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                            generate_ti2ti)

    path = _ckpt_or_skip(ENV_A)
    cfg, params = _convert_and_audit(path)
    assert cfg.vocab_size >= tk.TOKENS_A.full_vocab_size

    # one tiny-step 8B edit (bf16, 2 text + 2 image steps, small grid)
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), params)
    T = tk.TOKENS_A
    prompt = list(range(1000, 1032))
    ids, lay = tk.assemble_ti2ti_sequence(prompt, 16, 4, 4, [T.answer_end],
                                          tokens=T)
    opts = TI2TIOptions(text_steps=2, timesteps=2, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0)
    fin, codes = generate_ti2ti(params, cfg, jnp.asarray(ids)[None], lay,
                                opts, key=jax.random.key(0))
    codes = np.asarray(codes)
    assert codes.shape == (1, 16)
    assert ((codes >= 0) & (codes < T.codebook_size)).all()
    txt = np.asarray(fin)[0, lay.text_start:lay.text_end]
    assert (txt != T.mask).all(), "text span still masked after full budget"


@pytest.mark.heavy
def test_real_weights_m_convert_and_tiny_interleave():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.samplers.interleave import (InterleaveOptions,
                                                        interleave_generate)

    path = _ckpt_or_skip(ENV_M)
    cfg, params = _convert_and_audit(path)
    T = tk.TOKENS_M
    assert cfg.mask_token_id == T.mask

    cfg = dataclasses.replace(cfg, compute_dtype=jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda a: jnp.asarray(a, jnp.bfloat16), params)
    n_vq, msl = 16, 8
    prompt = ([T.interleave, T.soi] + [T.vq_offset + 5] * n_vq + [T.eoi]
              + [T.bos] + list(range(1000, 1006)) + [T.eos])
    un = ([T.interleave, T.soi] + [0] * n_vq + [T.eoi]
          + [T.bos, T.eos] + [T.eos] * 5)
    ids, lay = tk.assemble_interleave_sequence(prompt, n_vq, msl, T)
    un_ids, _ = tk.assemble_interleave_sequence(un, n_vq, msl, T)
    opts = InterleaveOptions(text_steps=2, image_steps=2,
                             text_temperature=0.0, image_temperature=0.0)
    fin, codes = interleave_generate(params, cfg, jnp.asarray(ids)[None],
                                     jnp.asarray(un_ids)[None], lay, opts,
                                     key=jax.random.key(0))
    codes = np.asarray(codes)
    assert codes.shape == (1, n_vq)
    assert ((codes >= 0) & (codes < T.codebook_size)).all()


def test_readiness_skips_cleanly_here():
    """On this host the env vars are unset: the gate must SKIP (not
    fail), and the converter helpers it relies on must import."""
    from mmada_parallel_tpu.models import convert as CV
    assert callable(CV.load_llada_checkpoint)
    assert callable(CV.llada_state_dict_from_params)
    if os.environ.get(ENV_A) or os.environ.get(ENV_M):
        pytest.skip("real checkpoints ARE configured; gate exercised by "
                    "the heavy tests above")
