"""Disk -> CLI -> artifacts: the last untested seam.

Converter round-trips (``test_convert.py``) and sampler parity cover the
pieces; these tests drive the whole chain through the CLI surface — a
tiny HF-format checkpoint DIRECTORY on disk (safetensors with the exact
reference name sets, written by ``save_llada_checkpoint`` and the
converter-test state-dict emitters) plus a real saved tokenizer, loaded
by ``cli/infer_a.main()`` / ``cli/infer_m.main()`` exactly as a user
would: load -> convert -> pipeline -> fused sampler -> VQ decode -> PNG +
thinking text.  (Reference load path: ``MMaDA-Parallel-A/inference.py:
82-96``; M: ``MMaDA-Parallel-M/inference.py:33-60``.)
"""

import json
import os

import numpy as np
import jax
import pytest
from PIL import Image

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models import convert as CV
from mmada_parallel_tpu.models import amused_vq as A
from mmada_parallel_tpu.models import magvit2 as M
from mmada_parallel_tpu.models.llada import LLaDAConfig, init_llada_params

from test_convert import _amused_state_dict, _magvit_state_dict

pytestmark = pytest.mark.heavy   # full-vocab tiny models; ~1 min each


def _write_tokenizer(ckpt_dir: str):
    """A real saved-to-disk fast tokenizer (WordLevel + bos/eos template)
    that ``AutoTokenizer.from_pretrained`` loads like the reference's."""
    from tokenizers import Tokenizer, models, pre_tokenizers, processors
    from transformers import PreTrainedTokenizerFast

    words = ("make the sky purple blue edit shift palette by one "
             "<system> </system> <user> </user> <answer> </answer> "
             "<uncondition>").split()
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    vocab.update({w: i + 3 for i, w in enumerate(words)})
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A </s>", pair="<s> $A </s> $B </s>",
        special_tokens=[("<s>", 1), ("</s>", 2)])
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>",
        eos_token="</s>", pad_token="</s>")
    fast.save_pretrained(ckpt_dir)


def _write_llada_checkpoint(ckpt_dir: str, vocab_size: int,
                            mask_token_id: int):
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2,
                           n_layers=2, mlp_hidden_size=64,
                           vocab_size=vocab_size,
                           mask_token_id=mask_token_id)
    params = init_llada_params(jax.random.key(0), cfg)
    CV.save_llada_checkpoint(ckpt_dir, params, cfg)
    _write_tokenizer(ckpt_dir)
    return cfg


def _save_safetensors(path: str, sd):
    from safetensors.numpy import save_file
    save_file({k: np.ascontiguousarray(np.asarray(v)) for k, v in
               sd.items()}, path)


def test_infer_a_cli_from_disk(tmp_path):
    from mmada_parallel_tpu.cli import infer_a

    T = tk.TOKENS_A
    ckpt = str(tmp_path / "ckpt_a")
    _write_llada_checkpoint(ckpt, T.full_vocab_size, T.mask)

    # vqvae subfolder exactly like the HF layout the CLI expects
    vq_dir = os.path.join(ckpt, "vqvae")
    os.makedirs(vq_dir)
    hf_cfg = {"block_out_channels": [8, 8, 8, 8, 8],
              "layers_per_block": 1, "latent_channels": 8,
              "num_vq_embeddings": T.codebook_size, "norm_num_groups": 4}
    with open(os.path.join(vq_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f)
    vq_cfg = CV.amused_config_from_hf(hf_cfg)
    vq_params = A.init_amused_vq_params(jax.random.key(1), vq_cfg)
    _save_safetensors(os.path.join(vq_dir, "model.safetensors"),
                      _amused_state_dict(vq_params, vq_cfg))

    rng = np.random.default_rng(0)
    in_path = str(tmp_path / "in.png")
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
        in_path)

    out_dir = str(tmp_path / "out_a")
    infer_a.main([
        "--checkpoint", ckpt, "--vae_ckpt", ckpt,
        "--prompt", "make the sky purple", "--image_path", in_path,
        "--height", "64", "--width", "64",
        "--timesteps", "2", "--text_steps", "2",
        "--text_gen_length", "8", "--text_block_length", "8",
        "--cfg_scale", "0", "--cfg_img", "0",
        "--temperature", "0", "--text_temperature", "0",
        "--output_dir", out_dir])

    pngs = [p for p in os.listdir(out_dir)
            if p.endswith(".png") and "concat" not in p]
    assert len(pngs) == 1, os.listdir(out_dir)
    img = Image.open(os.path.join(out_dir, pngs[0]))
    assert img.size == (64, 64)
    concat = pngs[0].replace(".png", "_concat.png")
    assert os.path.exists(os.path.join(out_dir, concat))
    txt = pngs[0].replace(".png", "_thinking.txt")
    with open(os.path.join(out_dir, txt)) as f:
        assert f.read() is not None   # thinking text written (may be "")


def test_eval_sweep_vq_encoder_handles_offgrid_pil(tmp_path):
    """The ParaBench path hands encode_edit raw PIL images of arbitrary
    size; the reference crop pipeline must run unconditionally or the
    h*w span layout breaks downstream (r5 review finding)."""
    from mmada_parallel_tpu.cli.eval_sweep import _vq_encode_fn

    T = tk.TOKENS_A
    ckpt = str(tmp_path / "ckpt_vq")
    vq_dir = os.path.join(ckpt, "vqvae")
    os.makedirs(vq_dir)
    hf_cfg = {"block_out_channels": [8, 8, 8, 8, 8],
              "layers_per_block": 1, "latent_channels": 8,
              "num_vq_embeddings": T.codebook_size, "norm_num_groups": 4}
    with open(os.path.join(vq_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f)
    vq_cfg = CV.amused_config_from_hf(hf_cfg)
    vq_params = A.init_amused_vq_params(jax.random.key(1), vq_cfg)
    _save_safetensors(os.path.join(vq_dir, "model.safetensors"),
                      _amused_state_dict(vq_params, vq_cfg))

    encode_edit = _vq_encode_fn(ckpt, "edit")
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (75, 100, 3), np.uint8))
    span, codes = encode_edit(img)   # off-grid size: crop pipeline runs
    # span = [boi] + h rows of (w codes + newline) + [eoi]
    assert span[0] == T.boi and span[-1] == T.eoi
    w = span.index(T.newline) - 1
    h = (len(span) - 2) // (w + 1)
    assert (len(span) - 2) % (w + 1) == 0
    assert len(codes) == h * w, (len(span), len(codes), h, w)
    # the crop list is built from 32px multiples of 512x512 area, so the
    # encoded grid is on-layout (not the raw 100x75 -> 6x4 grid)
    assert (w * vq_cfg.scale) % 32 == 0 and (h * vq_cfg.scale) % 32 == 0


def test_infer_m_cli_from_disk(tmp_path):
    from mmada_parallel_tpu.cli import infer_m

    T = tk.TOKENS_M
    ckpt = str(tmp_path / "ckpt_m")
    _write_llada_checkpoint(ckpt, T.full_vocab_size, T.mask)

    vq_dir = str(tmp_path / "magvit")
    os.makedirs(vq_dir)
    # tiny magvit, z_channels 13 so the codebook matches TOKENS_M's 8192;
    # scale 2 -> resolution 64 yields the production 32x32=1024 VQ grid
    vq_cfg = M.MagvitConfig(ch=16, enc_ch_mult=(1, 2), enc_blocks=(1, 1),
                            dec_ch_mult=(1, 2), dec_blocks=(1, 1),
                            z_channels=13, groups=4)
    assert vq_cfg.codebook_size == T.codebook_size
    with open(os.path.join(vq_dir, "config.json"), "w") as f:
        json.dump({"ch": 16, "enc_ch_mult": [1, 2], "enc_blocks": [1, 1],
                   "dec_ch_mult": [1, 2], "dec_blocks": [1, 1],
                   "z_channels": 13, "groups": 4}, f)
    vq_params = M.init_magvit_params(jax.random.key(2), vq_cfg)
    _save_safetensors(os.path.join(vq_dir, "model.safetensors"),
                      _magvit_state_dict(vq_params))

    root = tmp_path / "interleave_validation"
    root.mkdir()
    rng = np.random.default_rng(1)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8)).save(
        str(root / "case0.png"))
    (root / "case0.txt").write_text("shift the palette by one")

    out_dir = str(tmp_path / "out_m")
    infer_m.main([
        f"checkpoint={ckpt}", f"vq_checkpoint={vq_dir}",
        f"interleave_root={root}", f"output_dir={out_dir}",
        "text_steps=2", "image_steps=2", "text_cfg=0", "image_cfg=0",
        "text_temperature=0", "image_temperature=0",
        "max_seq_length=16", "num_vq_tokens=1024", "resolution=64"])

    assert os.path.exists(os.path.join(out_dir, "case0_out.png"))
    out = Image.open(os.path.join(out_dir, "case0_out.png"))
    assert out.size == (64, 64)
    assert os.path.exists(os.path.join(out_dir, "case0_out.txt"))
