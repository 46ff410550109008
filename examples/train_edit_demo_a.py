"""A-variant counterpart of ``train_edit_demo.py``: train a tiny model on
the synthetic palette-shift edit THROUGH the production A training path —
``AItemProcessor`` items (pickled VQ grids, ``<system>/<user>`` template,
cosine ``mask_codes``) optimized with ``a_variant_losses`` — then sample
with the reference TI2TI template (``assemble_ti2ti_sequence`` +
``generate_ti2ti``) and check the generated codes/text solve the task.

This closes the A loop the same way the M demo closes M's: a layout or
region-loss mismatch between ``data/item_processor.py`` (training side,
ref ``train/train.py:94-165``) and ``tokens.assemble_ti2ti_sequence`` +
``samplers/parallel_ti2ti.py`` (inference side, ref
``generators/parallel_generator.py``) caps code accuracy near chance.

Expected ceiling: ~15/16 code accuracy — the A sampler's re-mask keeps at
least one image token masked through the final step, and deterministic
extraction fills leftovers with code 0 (the reference fills them with a
RANDOM code, ``parallel_generator.py:356-360``), so one grid cell is a
structural coin-flip, not a learning failure.

Run: ``python examples/train_edit_demo_a.py [--steps 800] [--out results_ti2ti/edit_demo_a]``
"""

import argparse
import json
import os
import random
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TVS, CB = 64, 16
GRID = 4                      # 4x4 codes -> 64x64px at patch 16
N_VQ = GRID * GRID
# 6 words (not 4): the eval sequence lands on total_len 64, divisible by
# the ring-TP width 4 — so the trained demo checkpoint can also judge the
# opt-in int8-payload ring's task-accuracy delta (the ring requires
# L % g == 0; the prompt is a free demo choice)
PROMPT = "shift the palette by one one"

# sources whose changes must invalidate a cached trained fixture: this
# script plus the training stack it exercises (single source of truth —
# tests/test_capability_demo.py keys its session fixture off this list)
DEMO_SOURCES = [
    "examples/train_edit_demo_a.py",
    "mmada_parallel_tpu/models/llada.py",
    "mmada_parallel_tpu/training/losses.py",
    "mmada_parallel_tpu/training/trainer.py",
    "mmada_parallel_tpu/data/item_processor.py",
    "mmada_parallel_tpu/samplers/parallel_ti2ti.py",
    "mmada_parallel_tpu/tokens.py",
]


def demo_param_store(**kwargs) -> str:
    """Source-hash-keyed fixture path — the exact scheme of
    ``tests/conftest.fixture_store_path``, so the standalone demos and the
    test suite share one trained fixture per (sources, run-kwargs) and a
    changed training stack retrains BOTH instead of silently scoring
    stale weights."""
    import hashlib
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for rel in DEMO_SOURCES:
        with open(os.path.join(repo, rel), "rb") as f:
            h.update(f.read())
    h.update(repr(sorted(kwargs.items())).encode())
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "mmada_parallel_tpu", "fixtures")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"edit_demo_a_{h.hexdigest()[:16]}.npz")


class WordTokA:
    """Word/tag-level tokenizer covering the A prompt template."""

    bos_token_id, eos_token_id = 1, 2
    _words = {"<system>": 3, "</system>": 4, "<user>": 5, "</user>": 6,
              "<uncondition>": 7, "</answer>": 8, "edit": 9, "shift": 10,
              "the": 11, "palette": 12, "by": 13, "rotated": 14,
              "colors": 15, "done": 16}

    def _ids(self, text):
        return [self._words.get(w, 17)
                for w in re.findall(r"<[^>]+>|[a-z]+", text)]

    def __call__(self, text, add_special_tokens=True, **kw):
        ids = self._ids(text)
        if add_special_tokens:
            ids = [self.bos_token_id] + ids + [self.eos_token_id]
        return {"input_ids": ids}

    def decode(self, ids, **kw):
        inv = {v: k for k, v in self._words.items()}
        return " ".join(inv.get(int(i), "?") for i in ids
                        if int(i) not in (self.bos_token_id,
                                          self.eos_token_id))


def demo_tokens():
    from mmada_parallel_tpu import tokens as tk
    return tk.VariantATokens(
        mask=60, newline=50, answer_start=51, answer_end=52, boi=53,
        eoi=54, uncondition=55, pad=56, text_vocab_size=TVS,
        codebook_size=CB)


def write_grid_pickles(out_dir, n_items, rng):
    """Pickled pre-tokenized grids, the AItemProcessor input format
    (``pre_tokenizer/pre_tokenize.py`` records: offset ids + pixel dims)."""
    import pickle
    os.makedirs(out_dir, exist_ok=True)
    items = []
    for i in range(n_items):
        codes_in = rng.integers(0, CB, N_VQ)
        codes_out = (codes_in + 1) % CB
        paths = []
        for tag, codes in (("in", codes_in), ("out", codes_out)):
            p = os.path.join(out_dir, f"item{i}_{tag}.pkl")
            with open(p, "wb") as f:
                pickle.dump({"input_ids": (codes + TVS).tolist(),
                             "height": GRID * 16, "width": GRID * 16}, f)
            paths.append(p)
        items.append({"system_prompt": "edit",
                      "user_prompt": PROMPT,
                      "user_image": paths[0], "answer_image": paths[1],
                      "answer_text": "rotated colors done",
                      "_codes_in": codes_in})
    return items


def assemble_eval_sequence(tokz, T, codes_in):
    """Reference TI2TI inference template for one input grid; returns
    ``(ids, layout, ans_len)`` — shared by the demo eval loop and
    ``pararl_resteer_demo.py``."""
    from mmada_parallel_tpu import tokens as tk
    cond, _ = tk.make_ti2ti_prompt(PROMPT, "edit")
    prompt_ids = tokz(cond)["input_ids"]
    end_ids = tokz("</answer>", add_special_tokens=False)["input_ids"]
    ans_len = len(tokz("rotated colors done")["input_ids"])  # bos..eos
    span = tk.add_break_line((np.asarray(codes_in) + TVS).tolist(), GRID,
                             GRID, T.newline)
    con = prompt_ids[:-1] + [T.boi] + span + [T.eoi] + prompt_ids[-1:]
    ids, lay = tk.assemble_ti2ti_sequence(con, ans_len, GRID, GRID, end_ids,
                                          tokens=T)
    return ids, lay, ans_len


def eval_a_model(params, cfg, T, tokz, seed=0, use_cached=False,
                 hidden_fn=None, **cache_kw):
    """Shared eval protocol for the trained A demo model: 4 seeded palette
    edits through the reference TI2TI template; returns ``(accs, codes,
    texts, inputs)``.  ``use_cached=True`` routes through the opt-in
    ``generate_ti2ti_cached`` (the README approximation-envelope protocol:
    every opt-in path is judged by the accuracy delta on this task);
    ``hidden_fn`` swaps the backbone (e.g. ``ring_hidden_fn(mesh,
    int8_payload=True)`` — the eval sequence is ring-compatible: 64
    tokens, maskless, B=1)."""
    import jax.numpy as jnp
    from mmada_parallel_tpu.samplers.parallel_ti2ti import (
        TI2TIOptions, generate_ti2ti, generate_ti2ti_cached)

    ans_len = len(tokz("rotated colors done")["input_ids"])  # bos..eos
    opts = TI2TIOptions(text_steps=ans_len, timesteps=8, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0,
                        text_vocab_size=TVS, codebook_size=CB,
                        mask_token=T.mask)

    eval_rng = np.random.default_rng(seed + 1234)
    accs, gen_codes, gen_texts, inputs = [], [], [], []
    for _ in range(4):
        codes_in = eval_rng.integers(0, CB, N_VQ)
        ids, lay, _ = assemble_eval_sequence(tokz, T, codes_in)
        if use_cached:
            fin, out_codes = generate_ti2ti_cached(
                params, cfg, jnp.asarray(ids)[None], lay, opts, **cache_kw)
        else:
            fin, out_codes = generate_ti2ti(
                params, cfg, jnp.asarray(ids)[None], lay, opts,
                hidden_fn=hidden_fn)
        got = np.asarray(out_codes)[0]   # raw codes
        want = (codes_in + 1) % CB
        accs.append(float((got == want).mean()))
        inputs.append(codes_in)
        gen_codes.append(got)
        gen_texts.append(tokz.decode(
            [t for t in np.asarray(fin)[0][lay.text_start:lay.text_end]
             if int(t) < TVS]))
    return accs, gen_codes, gen_texts, inputs


def run_demo_a(steps=600, batch=32, lr=3e-3, out_dir=None, seed=0,
               log_every=50, work_dir=None, return_params=False,
               param_store=None):
    import jax
    import jax.numpy as jnp
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.models import (LLaDAConfig, init_llada_params,
                                           llada_forward)
    from mmada_parallel_tpu.data.item_processor import AItemProcessor
    from mmada_parallel_tpu.training.losses import a_variant_losses
    from mmada_parallel_tpu.training.trainer import (OptimizerConfig,
                                                     make_optimizer,
                                                     make_train_step,
                                                     TrainState)
    T = demo_tokens()
    tokz = WordTokA()
    cfg = LLaDAConfig.tiny(d_model=128, n_heads=4, n_kv_heads=4,
                           mlp_hidden_size=256, vocab_size=T.full_vocab_size,
                           mask_token_id=T.mask)
    params = init_llada_params(jax.random.key(seed), cfg)
    restored_from_store = False
    if param_store and os.path.exists(param_store):
        from mmada_parallel_tpu.utils.param_store import load_params
        try:
            params = load_params(param_store, params)
            steps, restored_from_store = 0, True
            print(f"[param_store] loaded trained params from "
                  f"{param_store}; skipping training", file=sys.stderr)
        except Exception as e:   # drift -> retrain
            print(f"[param_store] unusable ({e!r}); retraining",
                  file=sys.stderr)

    import atexit
    import shutil
    import tempfile
    work = work_dir or (out_dir and os.path.join(out_dir, "grids"))
    if not work:  # per-run scratch, removed at interpreter exit
        work = tempfile.mkdtemp(prefix="edit_demo_a_grids_")
        atexit.register(shutil.rmtree, work, ignore_errors=True)
    rng = np.random.default_rng(seed)
    items = write_grid_pickles(work, 256, rng)
    proc = AItemProcessor(tokenizer=tokz, tokens=T, uncondition_prob=0.0,
                          rng=random.Random(seed))

    def collate(rows):
        toks, labs = zip(*(proc.process_item(items[r]) for r in rows))
        L = max(len(t) for t in toks)
        ids = np.zeros((len(toks), L), np.int32)
        labels = np.full((len(toks), L), -100, np.int32)
        for r, (t, l) in enumerate(zip(toks, labs)):
            ids[r, :len(t)] = t
            labels[r, :len(l)] = l
        lengths = np.asarray([len(t) for t in toks], np.int32)
        return ids, labels, lengths

    def loss_fn(p, b, key):
        ids, labels, lengths = b
        logits = llada_forward(p, cfg, ids)
        out = a_variant_losses(
            logits, ids, labels, lengths,
            answer_start_token=T.answer_start, answer_end_token=T.answer_end,
            image_start_token=T.boi, image_end_token=T.eoi,
            newline_token=T.newline)
        return out["loss"], {"text_loss": out["text_loss"],
                             "image_loss": out["image_loss"]}

    opt = make_optimizer(OptimizerConfig(lr=lr, weight_decay=0.0), params)
    state = TrainState.create(params, opt)
    step_fn = jax.jit(make_train_step(loss_fn, opt, accum_steps=1))

    key = jax.random.key(seed + 1)
    curve = []
    t0 = time.time()
    for i in range(steps):
        key, k2 = jax.random.split(key)
        rows = rng.integers(0, len(items), batch)
        state, metrics = step_fn(state,
                                 tuple(map(jnp.asarray, collate(rows))), k2)
        if i % log_every == 0 or i == steps - 1:
            loss = float(metrics["loss"])
            curve.append({"step": i, "loss": round(loss, 4),
                          "image_loss": round(float(metrics["image_loss"]), 4),
                          "text_loss": round(float(metrics["text_loss"]), 4)})
            print(f"step {i:4d}  loss {loss:8.4f}  "
                  f"img {float(metrics['image_loss']):8.4f}  "
                  f"txt {float(metrics['text_loss']):8.4f}", file=sys.stderr)
    train_s = time.time() - t0
    if param_store and not restored_from_store:
        from mmada_parallel_tpu.utils.param_store import save_params
        save_params(param_store, state.params)

    # ---- generation via the reference TI2TI template ----
    accs, gen_codes, gen_texts, inputs = eval_a_model(
        state.params, cfg, T, tokz, seed=seed)

    metrics = {
        "task": "palette_shift (+1 mod codebook) edit, variant A",
        "steps": steps, "batch": batch, "train_seconds": round(train_s, 1),
        "final_loss": curve[-1]["loss"] if curve else None,
        "eval_code_accuracy": round(float(np.mean(accs)), 4),
        "per_sample_accuracy": [round(a, 4) for a in accs],
        "generated_text": gen_texts,
    }

    if out_dir:
        from train_edit_demo import render_codes
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "loss_curve.jsonl"), "w") as f:
            for row in curve:
                f.write(json.dumps(row) + "\n")
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        for r in range(len(inputs)):
            render_codes(inputs[r],
                         os.path.join(out_dir, f"sample{r}_input.png"))
            render_codes((inputs[r] + 1) % CB,
                         os.path.join(out_dir, f"sample{r}_target.png"))
            render_codes(gen_codes[r],
                         os.path.join(out_dir, f"sample{r}_generated.png"))
    if return_params:
        return metrics, state.params, cfg, T, tokz
    return metrics


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=800)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--out", default="results_ti2ti/edit_demo_a")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    m = run_demo_a(steps=args.steps, batch=args.batch, lr=args.lr,
                   out_dir=args.out)
    print(json.dumps(m, indent=2))
