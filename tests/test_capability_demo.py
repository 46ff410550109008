"""End-to-end capability: the full train -> checkpoint -> restore ->
sample lifecycle solves a synthetic edit task (examples/train_edit_demo.py).

This is the strongest closure test in the suite: it proves the training
objective (``interleave_noising`` + ``m_interleave_loss`` through
``UniversalPrompting``), the optimizer step, orbax checkpointing, and the
reference-template interleave sampler all agree — a systematic mismatch
between any two of them (e.g. a train/inference layout or position skew)
caps generation accuracy near chance (1/16), far below the asserted bar.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def test_edit_demo_learns_and_generates(tmp_path):
    from train_edit_demo import run_demo

    m = run_demo(steps=400, batch=32, lr=3e-3, out_dir=str(tmp_path),
                 log_every=200)
    assert m["eval_code_accuracy"] >= 0.9, m
    assert "rotated" in m["generated_text"][0]
    # artifacts written
    assert (tmp_path / "metrics.json").exists()
    assert (tmp_path / "sample0_generated.png").exists()
    assert (tmp_path / "ckpt").is_dir()


def test_edit_demo_a_learns_and_generates(tmp_path):
    """A-variant closure: AItemProcessor/a_variant_losses training agrees
    with the assemble_ti2ti_sequence/generate_ti2ti inference template.
    Ceiling is 15/16 (one leftover-masked cell, deterministic 0 fill —
    see the demo docstring), so the bar is 0.85."""
    from train_edit_demo_a import run_demo_a

    m = run_demo_a(steps=800, batch=32, lr=3e-3, out_dir=None,
                   log_every=400, work_dir=str(tmp_path / "grids"))
    assert m["eval_code_accuracy"] >= 0.85, m
    assert m["generated_text"][0] == "rotated colors done"
