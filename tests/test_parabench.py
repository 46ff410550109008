"""ParaBench dataset adapter (data/parabench.py): the published benchmark
(huggingface.co/datasets/tyfeld/ParaBench, ``/root/reference/README.md:
30-35``) is consumable the moment a local copy exists.

The committed miniature fixture (``tests/fixtures/parabench_mini.
parquet``) is written with the HF ``datasets`` Image feature — the same
on-disk form a hub snapshot has — so loading, field detection, image
decoding, request building, and a full tiny batched sweep all run
offline."""

import os

import jax
import numpy as np
import pytest

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.data.parabench import (detect_fields,
                                               load_parabench,
                                               parabench_requests)
from mmada_parallel_tpu.models.llada import LLaDAConfig, init_llada_params

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "tests", "fixtures", "parabench_mini.parquet")

TVS, CB = 256, 32
TOK_M = tk.VariantMTokens(mask=250, soi=251, eoi=252, bos=249, eos=248,
                          interleave=247, text_vocab_size=TVS,
                          codebook_size=CB)
TOK_A = tk.VariantATokens(mask=250, newline=251, answer_start=252,
                          answer_end=253, boi=254, eoi=255, uncondition=249,
                          pad=248, text_vocab_size=TVS, codebook_size=CB)
N_VQ, MSL = 6, 8


def _tokenize(s):
    """Deterministic stub tokenizer: words -> small text-vocab ids."""
    return [10 + (hash(w) % 100) for w in s.split()[:12]] or [10]


def _encode_m(img):
    """Stub M encoder: raw codes in [0, CB) derived from the pixels."""
    px = np.asarray(img.resize((4, 4))).astype(np.int64)
    return (px.reshape(-1, 3).sum(axis=1) % CB)[:N_VQ]


def _encode_edit(img):
    raw = _encode_m(img)
    grid = [int(c) + TOK_A.vq_offset for c in raw]
    span = [TOK_A.boi] + tk.add_break_line(grid, 2, 3, TOK_A.newline) \
        + [TOK_A.eoi]
    return span, raw


def test_load_and_detect_fields():
    rows = load_parabench(FIXTURE)
    assert len(rows) == 3
    fields = detect_fields(rows[0])
    assert fields["instruction"] == "instruction"
    assert fields["image"] == "input_image"
    assert fields["type"] == "task_type"
    assert fields["id"] == "id"
    assert fields["target_text"] == "output_text"
    # HF Image feature round-trips to a decodable image
    from mmada_parallel_tpu.data.parabench import as_pil
    img = as_pil(rows[0]["input_image"])
    assert img.size == (32, 32)
    assert rows[2]["input_image"] is None      # generation row: no input


def test_field_override_validates():
    rows = load_parabench(FIXTURE)
    with pytest.raises(KeyError, match="not in the dataset"):
        detect_fields(rows[0], {"instruction": "no_such_column"})
    fields = detect_fields(rows[0], {"target_image": ""})
    assert fields["target_image"] is None


def test_edit_requests_shape():
    rows = load_parabench(FIXTURE)
    reqs = parabench_requests(rows[:2], "edit", _tokenize, _encode_edit)
    for r, row in zip(reqs, rows[:2]):
        ids = r["prompt_ids"]
        assert TOK_A.boi in ids and TOK_A.eoi in ids
        # span inserted before the prompt's final token
        assert ids.index(TOK_A.eoi) == len(ids) - 2
        assert len(r["meta"]["input_codes"]) == N_VQ
        assert r["meta"]["id"] == row["id"]
        assert r["meta"]["keywords"]          # from output_text


def test_mixed_rows_without_images_need_no_encoder():
    rows = load_parabench(FIXTURE)
    reqs = parabench_requests([rows[2]], "t2i", _tokenize)
    assert reqs[0]["text_ids"]
    with pytest.raises(ValueError, match="encode_image"):
        parabench_requests(rows[:1], "t2i", _tokenize)


def test_parabench_rows_drive_full_interleave_sweep():
    """End-to-end: fixture -> adapter -> the real batched M sweep with a
    tiny model, scored — the executable path the real dataset will take."""
    from mmada_parallel_tpu.eval_scorers import default_edit_scorer
    from mmada_parallel_tpu.evaluation import (InterleaveEvalRequest,
                                               run_interleave_sweep)
    from mmada_parallel_tpu.samplers.interleave import InterleaveOptions

    rows = load_parabench(FIXTURE)
    raw = parabench_requests(rows[:2], "interleave", _tokenize, _encode_m)
    reqs = [InterleaveEvalRequest(
        instr_ids=r["instr_ids"],
        codes=np.asarray(r["codes"]) + TOK_M.vq_offset,
        meta=r["meta"]) for r in raw]

    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=TVS + CB,
                           mask_token_id=250)
    params = init_llada_params(jax.random.key(7), cfg)
    opts = InterleaveOptions(text_steps=8, image_steps=4, text_cfg=1.5,
                             image_cfg=2.0, text_temperature=0.0,
                             image_temperature=0.0, text_vocab_size=TVS,
                             codebook_size=CB, mask_token=250)
    sweep = run_interleave_sweep(params, cfg, reqs, num_vq_tokens=N_VQ,
                                 opts=opts, max_seq_length=MSL,
                                 batch_size=2, tokens=TOK_M,
                                 scorer=default_edit_scorer())
    assert sweep["num_requests"] == 2
    for r in sweep["results"]:
        assert r["codes"].shape == (N_VQ,)
        assert 0.0 <= r["scores"]["consistency"] <= 1.0


def test_cli_rejects_ambiguous_sources():
    from mmada_parallel_tpu.cli.eval_sweep import main
    with pytest.raises(SystemExit, match="exactly one"):
        main(["--task", "edit", "--tiny_model",
              "--requests", "a.jsonl", "--parabench", FIXTURE])


def test_cli_parabench_needs_tokenizer_before_model_load():
    from mmada_parallel_tpu.cli.eval_sweep import main
    with pytest.raises(SystemExit, match="tokenizer"):
        main(["--task", "edit", "--tiny_model", "--parabench", FIXTURE])


def test_mmu_prompt_is_bos_eos_normalized():
    """MMUServer.submit passes prompt_ids through untouched, so the
    adapter must apply the normalize_text_ids guard itself (the serve
    CLI's /mmu convention, append_eos_always=False)."""
    rows = load_parabench(FIXTURE)
    T = tk.TOKENS_M
    reqs = parabench_requests(rows[:1], "mmu", _tokenize, _encode_m)
    ids = reqs[0]["prompt_ids"]
    assert ids[0] == T.mmu and ids[1] == T.soi
    text = ids[ids.index(T.eoi) + 1:]
    assert text[0] == T.bos and text[-1] == T.eos


def test_field_detection_unions_first_rows():
    """JSONL exports omit null fields per-row: a first row without the
    image column must not disable images for the whole dataset."""
    from PIL import Image
    img = Image.new("RGB", (32, 32), (10, 20, 30))
    rows = [{"instruction": "a text-only row"},
            {"instruction": "an edit row", "input_image": img}]
    reqs = parabench_requests(rows, "edit", _tokenize, _encode_edit)
    assert "input_codes" not in reqs[0]["meta"]
    assert len(reqs[1]["meta"]["input_codes"]) == N_VQ


def test_interleave_rejects_imageless_rows_with_guidance():
    rows = load_parabench(FIXTURE)
    assert rows[2]["input_image"] is None
    with pytest.raises(ValueError, match="input image"):
        parabench_requests([rows[2]], "interleave", _tokenize, _encode_m)
