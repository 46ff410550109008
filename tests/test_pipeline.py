"""End-to-end pipeline tests (tiny models): image in -> tokens -> fused
sampler -> decoded image + text out, for both variants."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models import LLaDAConfig, init_llada_params
from mmada_parallel_tpu.models import amused_vq as AVQ
from mmada_parallel_tpu.models import magvit2 as MVQ
from mmada_parallel_tpu.pipeline import TI2TIPipeline, InterleavePipeline
from mmada_parallel_tpu.samplers.parallel_ti2ti import TI2TIOptions
from mmada_parallel_tpu.samplers.interleave import InterleaveOptions


class FakeTok:
    bos_token_id, eos_token_id = 1, 2

    def __call__(self, t, **kw):
        return {"input_ids": [1] + [10 + ord(c) % 80 for c in t[:8]] + [2]}

    def decode(self, ids, **kw):
        return " ".join(map(str, ids))


@pytest.fixture(scope="module")
def ti2ti_pipe():
    acfg = AVQ.AmusedVQConfig.tiny()
    vqp = AVQ.init_amused_vq_params(jax.random.key(0), acfg)
    cfg = LLaDAConfig.tiny(vocab_size=tk.TOKENS_A.full_vocab_size)
    params = init_llada_params(jax.random.key(1), cfg)
    return TI2TIPipeline(cfg, params, acfg, vqp, FakeTok())


def _img(size=32):
    from PIL import Image
    return Image.new("RGB", (size, size), (120, 80, 200))


def test_ti2ti_pipeline_end_to_end(ti2ti_pipe):
    opts = TI2TIOptions(text_steps=4, timesteps=2, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=1.0)
    out, text, info = ti2ti_pipe("add a hat", _img(), 32, 32, opts,
                                 text_gen_length=8, seed=7)
    assert out.size == (32, 32)
    assert isinstance(text, str) and len(text) > 0
    assert info["codes"].shape == (1, (32 // ti2ti_pipe.vq_cfg.scale) ** 2)
    # determinism: same seed -> same codes
    out2, text2, info2 = ti2ti_pipe("add a hat", _img(), 32, 32, opts,
                                    text_gen_length=8, seed=7)
    assert np.array_equal(info["codes"], info2["codes"])
    assert text == text2


def test_ti2ti_pipeline_painting_mode(ti2ti_pipe):
    opts = TI2TIOptions(text_steps=4, timesteps=2, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0)
    out, text, info = ti2ti_pipe("fill", _img(), 32, 32, opts,
                                 text_gen_length=8, seed=3,
                                 painting_mode="inpainting",
                                 mask_h_ratio=0.5, mask_w_ratio=0.5)
    assert out.size == (32, 32)


def test_ti2ti_encode_img_with_breaks_layout(ti2ti_pipe):
    toks = ti2ti_pipe.encode_img_with_breaks(_img())
    T = tk.TOKENS_A
    g = 32 // ti2ti_pipe.vq_cfg.scale
    assert toks[0] == T.boi and toks[-1] == T.eoi
    assert len(toks) == 2 + g * (g + 1)
    # newline after each row
    span = toks[1:-1]
    assert all(span[(i + 1) * (g + 1) - 1] == T.newline for i in range(g))
    # VQ tokens offset into image vocab
    non_nl = [t for t in span if t != T.newline]
    assert all(T.vq_offset <= t < T.vq_offset + T.codebook_size
               for t in non_nl)


def test_interleave_pipeline_end_to_end():
    mcfg = MVQ.MagvitConfig.tiny()
    mvp = MVQ.init_magvit_params(jax.random.key(2), mcfg)
    TKM = tk.VariantMTokens(text_vocab_size=126464)
    cfg2 = LLaDAConfig.tiny(vocab_size=TKM.full_vocab_size)
    p2 = init_llada_params(jax.random.key(3), cfg2)
    pipe = InterleavePipeline(cfg2, p2, mcfg, mvp, FakeTok(),
                              num_vq_tokens=64, max_seq_length=8,
                              resolution=16)
    opts = InterleaveOptions(text_steps=4, image_steps=2, text_cfg=1.0,
                             image_cfg=1.0, text_temperature=0.0,
                             image_temperature=0.0)
    img, text, info = pipe("make it red", _img(), opts, seed=5)
    assert img.size == (16, 16)
    assert info["codes"].shape == (1, 64)
    assert (info["codes"] >= 0).all()

    # opt-in cached sampler path through the same pipeline surface
    img_c, text_c, info_c = pipe(
        "make it red", _img(), opts, seed=5, use_cache=True,
        cache_kw={"cache_ratio": 0.5, "refresh_interval": 2})
    assert img_c.size == (16, 16)
    assert info_c["codes"].shape == (1, 64)


def test_interleave_demo_stream_frames(tmp_path):
    """run_stream_m writes frames + status.jsonl with shrinking mask
    coverage, and the final text matches the fused pipeline output
    (both consume the exact sampler math)."""
    import json
    from mmada_parallel_tpu.cli.demo import run_stream_m

    mcfg = MVQ.MagvitConfig.tiny()
    mvp = MVQ.init_magvit_params(jax.random.key(2), mcfg)
    TKM = tk.VariantMTokens(text_vocab_size=126464)
    cfg2 = LLaDAConfig.tiny(vocab_size=TKM.full_vocab_size)
    p2 = init_llada_params(jax.random.key(3), cfg2)
    pipe = InterleavePipeline(cfg2, p2, mcfg, mvp, FakeTok(),
                              num_vq_tokens=64, max_seq_length=8,
                              resolution=16)
    opts = InterleaveOptions(text_steps=6, image_steps=3, text_cfg=1.0,
                             image_cfg=1.0, text_temperature=0.0,
                             image_temperature=0.0)
    out = tmp_path / "frames"
    text, preview = run_stream_m(pipe, "make it red", _img(), opts, 0,
                                 str(out))
    recs = [json.loads(l) for l in open(out / "status.jsonl")]
    assert recs, "no frames streamed"
    assert recs[0]["image_masked_pct"] > 0
    assert recs[-1]["step"] == opts.text_steps
    assert (out / f"frame_{recs[-1]['step']:04d}.png").exists()
    pcts = [r["image_masked_pct"] for r in recs]
    assert all(a >= b for a, b in zip(pcts, pcts[1:]))
    assert preview.size == (16, 16)


def test_ti2ti_demo_stream_full_knobs(ti2ti_pipe, tmp_path):
    """run_stream drives the A-variant stepwise sampler with the full demo
    knob surface — painting mode AND both CFG prefixes (reference
    ``app.py:460-522``) — and streams shrinking-mask frames."""
    import json
    from mmada_parallel_tpu.cli.demo import run_stream

    opts = TI2TIOptions(text_steps=6, timesteps=2, temperature=0.0,
                        text_temperature=0.0, cfg_scale=2.5, cfg_img=4.0)
    out = tmp_path / "frames"
    text, preview = run_stream(ti2ti_pipe, "fill the hole", _img(), 32, 32,
                               opts, 8, 3, str(out),
                               painting_mode="inpainting",
                               mask_h_ratio=0.5, mask_w_ratio=0.5)
    recs = [json.loads(l) for l in open(out / "status.jsonl")]
    assert recs and recs[-1]["step"] == opts.text_steps
    pcts = [r["image_masked_pct"] for r in recs]
    # inpainting: visible tokens mean the span never starts fully masked
    assert pcts[0] < 100.0
    assert all(a >= b for a, b in zip(pcts, pcts[1:]))
    assert preview.size == (32, 32)
    assert isinstance(text, str) and text


def test_demo_knobs_to_options():
    """The UI knob mapper mirrors the reference panel's functional knobs
    (``app.py:646-681``; its Block Length slider is collected but never
    forwarded to the sampler, so it is deliberately absent here)."""
    from mmada_parallel_tpu.cli.demo import knobs_to_options

    opts, paint = knobs_to_options(
        text_steps=64, cfg_scale=2.5, cfg_img=4.0, temperature=1.0,
        text_temperature=0.7, remasking="random",
        painting_mode="outpainting", mask_h_ratio=0.3, mask_w_ratio=0.9)
    assert opts.text_steps == 64 and opts.timesteps == 19
    assert opts.cfg_scale == 2.5 and opts.cfg_img == 4.0
    assert opts.remasking == "random"
    assert paint == {"painting_mode": "outpainting",
                     "mask_h_ratio": 0.3, "mask_w_ratio": 0.9}
    # gradio's None dropdown value stays falsy for run_stream
    _, paint_off = knobs_to_options(32, 0, 0, 1, 0, "low_confidence",
                                    None, 0.5, 0.5)
    assert paint_off["painting_mode"] is None
