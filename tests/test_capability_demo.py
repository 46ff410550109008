"""End-to-end capability: the full train -> checkpoint -> restore ->
sample lifecycle solves a synthetic edit task (examples/train_edit_demo.py).

This is the strongest closure test in the suite: it proves the training
objective (``interleave_noising`` + ``m_interleave_loss`` through
``UniversalPrompting``), the optimizer step, orbax checkpointing, and the
reference-template interleave sampler all agree — a systematic mismatch
between any two of them (e.g. a train/inference layout or position skew)
caps generation accuracy near chance (1/16), far below the asserted bar.

The trained model doubles as the peaked-logits fixture for the int8
quality claim (README "W8A8 int8 inference"): unlike the random-weight
worst case in ``test_quant.py``, a trained model's distributions are
peaked, and the quantized trajectory should preserve the task accuracy.
"""

import os
import sys

import numpy as np
import pytest

from conftest import fixture_store_path

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))

pytestmark = pytest.mark.heavy

# sources whose changes must invalidate the cached trained fixtures: the
# demo script plus the training stack it exercises (conftest docstring)
_M_SOURCES = [
    "examples/train_edit_demo.py",
    "mmada_parallel_tpu/models/llada.py",
    "mmada_parallel_tpu/training/losses.py",
    "mmada_parallel_tpu/training/trainer.py",
    "mmada_parallel_tpu/training/masking.py",
    "mmada_parallel_tpu/training/lr_schedules.py",
    "mmada_parallel_tpu/data/prompting.py",
    "mmada_parallel_tpu/samplers/interleave.py",
    "mmada_parallel_tpu/tokens.py",
]
# single source of truth for the A list: the demo itself keys its own
# fixture store off train_edit_demo_a.DEMO_SOURCES with the same scheme,
# so the suite and the standalone demo share one trained fixture
from train_edit_demo_a import DEMO_SOURCES as _A_SOURCES  # noqa: E402


@pytest.fixture(scope="module")
def trained_m(tmp_path_factory):
    from train_edit_demo import run_demo

    out = tmp_path_factory.mktemp("edit_demo")
    # lr 1.5e-3 + warmup + 800 steps: converges to accuracy 1.0 on every
    # seed tried (0-3).  The old 3e-3/400 recipe was stream-lucky — about
    # half of random streams spiked around step 300-400 and plateaued
    # (surfaced in r3 when the masking draw pattern changed to the
    # reference's single-argsort form, which reshuffled the stream)
    kw = dict(steps=800, batch=32, lr=1.5e-3, log_every=200)
    metrics, params, cfg, T, tokz = run_demo(
        out_dir=str(out), return_params=True,
        param_store=fixture_store_path("edit_demo_m", _M_SOURCES, **kw),
        **kw)
    return metrics, params, cfg, T, tokz, out


def test_edit_demo_learns_and_generates(trained_m):
    m, _, _, _, _, out = trained_m
    assert m["eval_code_accuracy"] >= 0.9, m
    assert "rotated" in m["generated_text"][0]
    # artifacts written
    assert (out / "metrics.json").exists()
    assert (out / "sample0_generated.png").exists()
    assert (out / "ckpt").is_dir()


def test_int8_preserves_trained_task_accuracy(trained_m):
    """W8A8 on a TRAINED model keeps the edit-task trajectory: the README
    quantifies random-weight (worst-case) trajectory divergence; this pins
    the peaked-logits claim with a measured end-task number."""
    import functools
    import jax
    from mmada_parallel_tpu.ops.quant import quantize_llada_params
    from train_edit_demo import eval_palette_model

    m, params, cfg, T, tokz, _ = trained_m
    for quantize_head in (True, False):   # int8 head / dense bf16 head
        qparams = jax.jit(functools.partial(
            quantize_llada_params, quantize_head=quantize_head))(params)
        accs, _, texts, _, _ = eval_palette_model(qparams, cfg, T, tokz)
        assert float(np.mean(accs)) >= m["eval_code_accuracy"] - 0.1, (
            quantize_head, accs, m["eval_code_accuracy"])
        assert "rotated" in texts[0], (quantize_head, texts)


def test_cached_sampler_preserves_trained_task_accuracy(trained_m):
    """interleave_generate_cached (real cache schedule, not always-refresh)
    on the trained model keeps the edit-task accuracy — the peaked-logits
    quality story for the M cached sampler."""
    from train_edit_demo import eval_palette_model

    m, params, cfg, T, tokz, _ = trained_m
    for kw in ({"cache_ratio": 0.5, "refresh_interval": 3,
                "warmup_ratio": 0.25},
               {"cache_ratio": 0.5, "refresh_interval": 3,
                "warmup_ratio": 0.25, "refresh_on_image_steps": False}):
        accs, _, texts, _, _ = eval_palette_model(
            params, cfg, T, tokz, use_cached=True, **kw)
        assert float(np.mean(accs)) >= m["eval_code_accuracy"] - 0.1, (
            kw, accs, m["eval_code_accuracy"])
        assert "rotated" in texts[0], (kw, texts)


_MT_SOURCES = [
    "examples/train_multitask_demo.py",
    "mmada_parallel_tpu/models/llada.py",
    "mmada_parallel_tpu/training/losses.py",
    "mmada_parallel_tpu/training/m_tasks.py",
    "mmada_parallel_tpu/training/trainer.py",
    "mmada_parallel_tpu/training/masking.py",
    "mmada_parallel_tpu/data/prompting.py",
    "mmada_parallel_tpu/samplers/t2i.py",
    "mmada_parallel_tpu/samplers/mmu.py",
    "mmada_parallel_tpu/serving.py",
    "mmada_parallel_tpu/evaluation.py",
    "mmada_parallel_tpu/tokens.py",
]


@pytest.fixture(scope="module")
def trained_mt(tmp_path_factory):
    from train_multitask_demo import run_demo

    out = tmp_path_factory.mktemp("multitask_demo")
    kw = dict(steps=1000, batch=16, lr=1.5e-3, log_every=250)
    metrics, params, cfg, T, tokz = run_demo(
        out_dir=str(out), return_params=True,
        param_store=fixture_store_path("multitask_demo", _MT_SOURCES, **kw),
        **kw)
    return metrics, params, cfg, T, tokz, out


def test_multitask_demo_learns_both_tasks_through_sweeps(trained_mt):
    """Joint t2i+mmu training through ``forward_process_separate`` must
    produce a model BOTH eval sweeps score highly: the t2i sweep's
    target_match (through T2IServer's CFG serving path) and the mmu
    sweep's positional keyword alignment (through MMUServer's semi-AR
    decoding).  A train/serve template mismatch in either task caps its
    score near chance (1/8 colors)."""
    m, _, _, _, _, out = trained_mt
    assert m["t2i_target_match"] >= 0.9, m
    assert m["mmu_text_alignment"] >= 0.9, m
    # the t2i worlds are two-color grids: diversity = 2/16 (1/16 when a==b)
    assert 0.05 <= m["t2i_code_diversity"] <= 0.2, m
    assert (out / "metrics.json").exists()
    assert (out / "t2i0_generated.png").exists()


@pytest.fixture(scope="module")
def trained_a(tmp_path_factory):
    from train_edit_demo_a import run_demo_a

    work = tmp_path_factory.mktemp("edit_demo_a")
    kw = dict(steps=800, batch=32, lr=3e-3, log_every=400)
    m, params, cfg, T, tokz = run_demo_a(
        out_dir=None, work_dir=str(work / "grids"), return_params=True,
        param_store=fixture_store_path("edit_demo_a", _A_SOURCES, **kw),
        **kw)
    return m, params, cfg, T, tokz


def test_edit_demo_a_learns_and_generates(trained_a):
    """A-variant closure: AItemProcessor/a_variant_losses training agrees
    with the assemble_ti2ti_sequence/generate_ti2ti inference template.
    Ceiling is 15/16 (one leftover-masked cell, deterministic 0 fill —
    see the demo docstring), so the bar is 0.85."""
    m = trained_a[0]
    assert m["eval_code_accuracy"] >= 0.85, m
    assert m["generated_text"][0] == "rotated colors done"


def test_int8_ring_preserves_trained_task_accuracy(trained_a):
    """The opt-in int8-payload ring (`serve --tp_ring` with
    ``int8_payload=True``) judged by the SAME unified protocol as every
    other opt-in approximation: task-accuracy delta on the trained demo
    checkpoint.  The demo template was sized for this (prompt chosen so
    the eval sequence is 64 tokens — divisible by the ring width 4; see
    ``train_edit_demo_a.PROMPT``).  The exact bf16 ring must match the
    solo run identically at temperature 0; the int8 payload must hold
    the trained-task accuracy within the envelope bar."""
    import jax
    from mmada_parallel_tpu.parallel import MeshConfig, make_mesh
    from mmada_parallel_tpu.parallel.tp_overlap import ring_hidden_fn
    from train_edit_demo_a import eval_a_model

    m, params, cfg, T, tokz = trained_a
    mesh = make_mesh(MeshConfig(data=1, fsdp=1, tensor=4),
                     jax.devices()[:4])
    base = m["eval_code_accuracy"]

    accs, _, texts, _ = eval_a_model(params, cfg, T, tokz,
                                     hidden_fn=ring_hidden_fn(mesh))
    assert float(np.mean(accs)) == pytest.approx(base), (accs, base)
    assert "rotated" in texts[0], texts

    accs_q, _, texts_q, _ = eval_a_model(
        params, cfg, T, tokz,
        hidden_fn=ring_hidden_fn(mesh, int8_payload=True))
    assert float(np.mean(accs_q)) >= base - 0.1, (accs_q, base)
    assert "rotated" in texts_q[0], texts_q


def test_a_cached_sampler_preserves_trained_task_accuracy(trained_a):
    """generate_ti2ti_cached (real cache schedule) on the trained A model
    keeps the edit-task accuracy — the same protocol as the M cached /
    int8 quality tests, so the README envelope table is one comparable
    column of trained-demo accuracy deltas."""
    from train_edit_demo_a import eval_a_model

    m, params, cfg, T, tokz = trained_a
    for kw in ({"cache_ratio": 0.5, "refresh_interval": 3,
                "warmup_ratio": 0.25},
               {"cache_ratio": 0.3, "refresh_interval": 4,
                "warmup_ratio": 0.25}):
        accs, _, texts, _ = eval_a_model(params, cfg, T, tokz,
                                         use_cached=True, **kw)
        assert float(np.mean(accs)) >= m["eval_code_accuracy"] - 0.1, (
            kw, accs, m["eval_code_accuracy"])
        assert "rotated" in texts[0], (kw, texts)
