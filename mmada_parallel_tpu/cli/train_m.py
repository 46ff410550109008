"""Variant-M interleave SFT trainer CLI.

Mirrors ``MMaDA-Parallel-M/training/train_interleave.py:133-980`` on the
TPU stack: tar-shard (input image, instruction, output image, output text)
stream, on-the-fly MagViT-v2 tokenization, double-cosine noising, the
tail-slice interleave loss, checkpoints, periodic validation generation.

    python -m mmada_parallel_tpu.cli.train_m config=configs/train_m.yaml
"""

import os
import sys
import time

DEFAULTS = {
    "checkpoint": None,           # LLaDA init (None -> tiny debug model)
    "vq_checkpoint": None,        # MagViT-v2 weights (None -> random)
    "output_dir": "out_interleave",
    "shards": None,               # tar pattern with in/out image + texts
    "dataset": {"preprocessing": {"max_seq_length": 256, "resolution": 512},
                "params": {"mmu_validation_prompts_file": "",
                           "mmu_image_root": "",
                           "lm_chat_validation_jsonl": ""}},
    "model": {"mmada": {"num_vq_tokens": 1024, "codebook_size": 8192}},
    "training": {
        "lr": 1e-4, "weight_decay": 0.01, "max_grad_norm": 1.0,
        "batch_size": 1, "gradient_accumulation_steps": 1,
        "max_train_steps": 1000, "text_coeff": 1.0, "image_coeff": 1.0,
        "min_masking_rate": 1e-3, "cond_dropout_prob": 0.1,
        "warmup_steps": 100, "scheduler": "cosine",
        "save_every": 500, "log_every": 10, "seed": 0,
        "generate_every": 0,   # >0: periodic validation generation
        "validate_mmu_every": 0,   # >0: MMU understanding validation
        "validate_chat_every": 0,  # >0: chat text validation
    },
    "mesh": {"fsdp": 1, "tensor": 1},
    "tiny_debug": False,
    # tracker surface of train_interleave.py:179-201 — set a project name
    # to mirror scalars/validation images into wandb when it is installed;
    # TensorBoard/jsonl/PNG sinks are always on regardless
    "wandb": {"project": None, "run_name": None},
}


def _validate(params, mcfg, vq_params, vq_cfg, tokenizer, sample, cfg,
              step):
    """Generate from one validation sample and save the result
    (the reference's ``generate_interleave`` wandb table,
    ``train_interleave.py:986-1169``, minus the wandb sink)."""
    import os as _os
    from mmada_parallel_tpu.pipeline import InterleavePipeline
    from mmada_parallel_tpu.samplers.interleave import InterleaveOptions
    # build the pipeline once and keep its jit caches warm across calls;
    # params are passed as a call argument so updating the attribute does
    # not recompile
    pipe = getattr(_validate, "_pipe", None)
    if pipe is None:
        pipe = InterleavePipeline(
            mcfg, params, vq_cfg, vq_params, tokenizer,
            num_vq_tokens=cfg.model.mmada.num_vq_tokens,
            max_seq_length=cfg.dataset.preprocessing.max_seq_length,
            resolution=cfg.dataset.preprocessing.resolution)
        _validate._pipe = pipe
    pipe.llada_params = params
    opts = InterleaveOptions(text_steps=32, image_steps=8)
    img, text, _ = pipe(sample["instruction"], sample["input_image"], opts,
                        seed=step)
    out = _os.path.join(cfg.output_dir, "validation")
    _os.makedirs(out, exist_ok=True)
    img.save(_os.path.join(out, f"step{step:07d}.png"))
    with open(_os.path.join(out, f"step{step:07d}.txt"), "w") as f:
        f.write(text if isinstance(text, str) else str(text))
    print(f"[validate] step {step}: saved validation sample")


def _chat_prompt_ids(tokenizer, question):
    """The reference's chat template wrap (train_interleave.py:1327-1330)."""
    chat = ("<|start_header_id|>user<|end_header_id|>\n" + question
            + "<eot_id><|start_header_id|>assistant<|end_header_id|>\n")
    ids = tokenizer(chat)["input_ids"]
    bos = getattr(tokenizer, "bos_token_id", None)
    return ([bos] if bos is not None else []) + list(ids)


def _conversation_prompt_ids(tokenizer, messages):
    """Full multi-turn history through the tokenizer's chat template with
    the assistant generation header appended — the reference's
    ``apply_chat_template(messages, add_generation_prompt=True)``
    (``train_interleave.py:1236-1241``).  Falls back to the header-tag
    format of ``:1327-1330`` for tokenizers without a chat template."""
    tmpl = getattr(tokenizer, "apply_chat_template", None)
    if tmpl is not None and getattr(tokenizer, "chat_template", None):
        return list(tmpl(messages, tokenize=True,
                         add_generation_prompt=True))
    chat = "".join(
        f"<|start_header_id|>{m.get('role', 'user')}<|end_header_id|>\n"
        f"{m.get('content', '')}<eot_id>" for m in messages)
    chat += "<|start_header_id|>assistant<|end_header_id|>\n"
    ids = tokenizer(chat)["input_ids"]
    bos = getattr(tokenizer, "bos_token_id", None)
    return ([bos] if bos is not None else []) + list(ids)


def _batched_mmu(params, mcfg, prompt_lists, opts, pad_id):
    """One compiled ``mmu_generate`` call for a batch of ragged prompts.

    Prompts are right-padded to a 32-multiple bucket with a true-length
    ``attn_mask`` (positions re-ranked by the sampler), so each row decodes
    exactly as its unpadded single run and ONE jit trace serves every
    validation invocation — the reference re-runs the full model per item
    (``train_interleave.py:1245-1258``), which on TPU would pay a fresh
    XLA compile per distinct prompt length.

    Returns ``(final_ids [B, P + max_new_tokens], prompt_len P)``.
    """
    import numpy as _np
    import jax as _jax
    import jax.numpy as _jnp
    from mmada_parallel_tpu.samplers.mmu import mmu_generate

    B = len(prompt_lists)
    P = max(32, -(-max(len(p) for p in prompt_lists) // 32) * 32)
    ids = _np.full((B, P), pad_id, _np.int32)
    mask = _np.zeros((B, P), bool)
    for i, p in enumerate(prompt_lists):
        ids[i, :len(p)] = p
        mask[i, :len(p)] = True
    cache = getattr(_batched_mmu, "_cache", None)
    if cache is None:
        cache = _batched_mmu._cache = {}
    ck = (B, P, opts, id(mcfg))
    if ck not in cache:
        cache[ck] = _jax.jit(lambda pr, x, m: mmu_generate(
            pr, mcfg, x, opts, attn_mask=m, key=None))
    fin = _np.asarray(cache[ck](params, _jnp.asarray(ids),
                                _jnp.asarray(mask)))
    return fin, P


def _validate_mmu(params, mcfg, get_code, tokenizer, cfg, step):
    """MMU understanding validation (``understanding_images``,
    ``train_interleave.py:1176-1290``): encode each validation image, build
    the MMU prompt (image span + chat-template question), run the MMU
    sampler; the wandb table becomes ``validation/mmu_step{N}.jsonl``."""
    import json as _json
    import os as _os
    import numpy as _np
    import jax.numpy as _jnp
    from PIL import Image
    from mmada_parallel_tpu import tokens as _tk
    from mmada_parallel_tpu.utils.image import (image_transform,
                                                image_transform_squash)
    from mmada_parallel_tpu.samplers.mmu import MMUOptions

    pf = cfg.dataset.params.mmu_validation_prompts_file
    root = cfg.dataset.params.mmu_image_root
    if not pf or not _os.path.exists(pf):
        print(f"[validate_mmu] prompts file missing: {pf!r}; skipping")
        return
    with open(pf) as f:
        items = _json.load(f)
    T = _tk.TOKENS_M
    msl = cfg.dataset.preprocessing.max_seq_length
    # reference generation params (train_interleave.py:1255-1258)
    opts = MMUOptions(max_new_tokens=msl, steps=msl // 2,
                      block_length=msl // 4, temperature=0.0,
                      mask_token=T.mask)
    out_dir = _os.path.join(cfg.output_dir, "validation")
    _os.makedirs(out_dir, exist_ok=True)
    prompts, kept = [], []
    for item in items:
        name, msgs = item.get("file_name"), item.get("messages")
        if not name or not msgs:
            continue
        path = _os.path.join(root, name)
        if not _os.path.exists(path):
            continue
        img = Image.open(path).convert("RGB")
        # squash transform for document/diagram sets (ref :1224-1228)
        tf = (image_transform_squash if any(
            t in name for t in ("ai2d", "clevr", "docvqa", "geo", "llava"))
            else image_transform)
        px = _jnp.asarray(tf(img, cfg.dataset.preprocessing.resolution))
        codes = _np.asarray(get_code(px))[0] + T.vq_offset
        # full multi-turn history through the chat template (ref :1236-1241)
        msgs = msgs if isinstance(msgs, list) else [
            {"role": "user", "content": str(msgs)}]
        qids = _conversation_prompt_ids(tokenizer, msgs)
        prompts.append([T.mmu, T.soi] + [int(c) for c in codes]
                       + [T.eoi] + [int(q) for q in qids])
        kept.append((name, msgs))
    rows = []
    if prompts:
        fin, P = _batched_mmu(params, mcfg, prompts, opts, T.eos)
        for i, (name, msgs) in enumerate(kept):
            ans = [int(t) for t in fin[i, P:] if int(t) != T.mask]
            text = (tokenizer.decode(ans, skip_special_tokens=True)
                    if hasattr(tokenizer, "decode") else ans)
            rows.append({"file_name": name, "messages": msgs,
                         "response": text})
    with open(_os.path.join(out_dir, f"mmu_step{step:07d}.jsonl"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    print(f"[validate_mmu] step {step}: {len(rows)} items")


def _validate_chat(params, mcfg, tokenizer, cfg, step):
    """Chat text validation (``generate_chat_text``,
    ``train_interleave.py:1292-1359``): lm-chat questions through the text
    sampler; the HTML/wandb sink becomes ``validation/chat_step{N}.jsonl``."""
    import json as _json
    import os as _os
    from mmada_parallel_tpu import tokens as _tk
    from mmada_parallel_tpu.samplers.mmu import MMUOptions

    jl = cfg.dataset.params.lm_chat_validation_jsonl
    if not jl or not _os.path.exists(jl):
        print(f"[validate_chat] jsonl missing: {jl!r}; skipping")
        return
    questions = [_json.loads(l)["question"] for l in open(jl) if l.strip()]
    T = _tk.TOKENS_M
    msl = cfg.dataset.preprocessing.max_seq_length
    # reference generation params (train_interleave.py:1332-1337)
    opts = MMUOptions(max_new_tokens=msl, steps=msl // 2,
                      block_length=msl // 4, temperature=0.0,
                      mask_token=T.mask)
    out_dir = _os.path.join(cfg.output_dir, "validation")
    _os.makedirs(out_dir, exist_ok=True)
    rows = []
    if questions:
        prompts = [_chat_prompt_ids(tokenizer, q) for q in questions]
        fin, P = _batched_mmu(params, mcfg, prompts, opts, T.eos)
        for i, q in enumerate(questions):
            ans = [int(t) for t in fin[i, P:] if int(t) != T.mask]
            text = (tokenizer.decode(ans, skip_special_tokens=True)
                    if hasattr(tokenizer, "decode") else ans)
            rows.append({"question": q, "response": text})
    with open(_os.path.join(out_dir, f"chat_step{step:07d}.jsonl"), "w") as f:
        for r in rows:
            f.write(_json.dumps(r) + "\n")
    print(f"[validate_chat] step {step}: {len(rows)} prompts")


def main(argv=None):
    from mmada_parallel_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # persistent XLA cache (opt-out via env)
    import numpy as np
    import jax
    import jax.numpy as jnp
    import dataclasses

    from mmada_parallel_tpu.config import load_config
    from mmada_parallel_tpu.models import (LLaDAConfig, init_llada_params,
                                           llada_forward, param_shardings)
    from mmada_parallel_tpu.models import convert as CV
    from mmada_parallel_tpu.models import magvit2 as MVQ
    from mmada_parallel_tpu.parallel import (MeshConfig, make_mesh,
                                             batch_sharding)
    from mmada_parallel_tpu.training.masking import interleave_noising
    from mmada_parallel_tpu.training.losses import m_interleave_loss
    from mmada_parallel_tpu.training.trainer import (OptimizerConfig,
                                                     make_optimizer,
                                                     make_train_step,
                                                     TrainState,
                                                     create_sharded_state,
                                                     state_shardings)
    from mmada_parallel_tpu.training.lr_schedules import get_scheduler
    from mmada_parallel_tpu.training.checkpoint import CheckpointManager
    from mmada_parallel_tpu.utils.logging import MetricLogger, ScalarWriter
    from mmada_parallel_tpu.data.prompting import UniversalPrompting
    from mmada_parallel_tpu.tokens import TOKENS_M

    argv = list(sys.argv[1:] if argv is None else argv)
    path = None
    overrides = []
    for a in argv:
        if a.startswith("config="):
            path = a.split("=", 1)[1]
        else:
            overrides.append(a)
    cfg = load_config(path, overrides, DEFAULTS)
    tr = cfg.training
    msl = cfg.dataset.preprocessing.max_seq_length
    n_vq = cfg.model.mmada.num_vq_tokens

    os.makedirs(cfg.output_dir, exist_ok=True)
    mesh = make_mesh(MeshConfig(data=-1, fsdp=cfg.mesh.fsdp,
                                tensor=cfg.mesh.tensor))

    # --- models ---
    if cfg.tiny_debug or cfg.checkpoint is None:
        # tiny width, REAL token space — the full M vocab embedding at
        # d_model 64 is ~35 MB, cheap enough for smoke runs
        mcfg = LLaDAConfig.tiny(vocab_size=TOKENS_M.full_vocab_size,
                                mask_token_id=TOKENS_M.mask)
        params = init_llada_params(jax.random.key(tr.seed), mcfg)
        from transformers import AutoTokenizer
        tokenizer = None
    else:
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(cfg.checkpoint,
                                                  trust_remote_code=True)
        mcfg, params = CV.load_llada_checkpoint(cfg.checkpoint)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    mcfg = dataclasses.replace(mcfg, compute_dtype=jnp.bfloat16,
                               remat="whole_layer")
    # params are placed by create_sharded_state below (per shard_strategy)

    vq_cfg = (MVQ.MagvitConfig.tiny() if cfg.tiny_debug
              else MVQ.MagvitConfig())
    if cfg.vq_checkpoint:
        vq_params = CV.magvit_params_from_torch(
            CV.load_safetensors_dir(cfg.vq_checkpoint), vq_cfg)
    else:
        vq_params = MVQ.init_magvit_params(jax.random.key(1), vq_cfg)
    get_code = jax.jit(lambda px: MVQ.magvit_get_code(vq_params, vq_cfg, px))

    # --- optimizer / train step ---
    sched = get_scheduler(tr.scheduler, tr.lr, tr.warmup_steps,
                          tr.max_train_steps)
    opt = make_optimizer(OptimizerConfig(
        lr=tr.lr, weight_decay=tr.weight_decay, b1=0.9, b2=0.999,
        grad_clip=tr.max_grad_norm, schedule=sched), params)
    state, p_specs, o_specs = create_sharded_state(
        params, opt, param_shardings(mcfg), mesh,
        getattr(tr, "shard_strategy", "full"))

    def loss_fn(p, batch, key):
        ids, labels, mask, t = batch
        logits = llada_forward(p, mcfg, ids, mask.astype(bool))
        out = m_interleave_loss(logits, labels, t, msl, n_vq,
                                tr.text_coeff, tr.image_coeff)
        return out["loss"], {"text_loss": out["text_loss"],
                             "image_loss": out["image_loss"]}

    # pin output state placement (zero2's replicated-params/sharded-opt
    # split in particular) — see cli/train_a.py
    from jax.sharding import NamedSharding, PartitionSpec as P
    out_sh = (state_shardings(state.params, state.opt_state, p_specs,
                              o_specs, mesh),
              NamedSharding(mesh, P()))
    step = jax.jit(make_train_step(
        loss_fn, opt, accum_steps=tr.gradient_accumulation_steps),
        donate_argnums=0, out_shardings=out_sh)

    mngr = CheckpointManager(os.path.join(cfg.output_dir, "ckpt"))
    restored, meta, last = mngr.restore(state)
    if restored is not None:
        state = restored
        print(f"[resume] step {last}")
    wandb_cfg = cfg.get("wandb", {}) or {}
    writer = ScalarWriter(os.path.join(cfg.output_dir, "tb"),
                          is_main=jax.process_index() == 0,
                          wandb_project=wandb_cfg.get("project"),
                          wandb_run_name=wandb_cfg.get("run_name"),
                          wandb_config=dict(cfg))
    logger = MetricLogger()
    bsh = batch_sharding(mesh)
    up = UniversalPrompting(tokenizer, max_text_len=msl) if tokenizer else None

    # --- data stream ---
    # edit-pair samples (input image, instruction, output image, output
    # text) via the normalize_example field zoo (train_interleave.py:
    # 340-476); a shard whose samples carry only one image trains
    # t2i-style with input == target (the reference's placeholder path)
    def batches():
        from mmada_parallel_tpu.data.shards import InterleavePairShardDataset
        from mmada_parallel_tpu.utils.image import image_transform_squash
        res = cfg.dataset.preprocessing.resolution
        ds = InterleavePairShardDataset(
            cfg.shards, transform=lambda im: image_transform_squash(im, res),
            resolution=res)
        buf = []
        B = tr.batch_size * tr.gradient_accumulation_steps
        for s in ds:
            buf.append(s)
            if len(buf) == B:
                yield buf
                buf = []

    from mmada_parallel_tpu.data.prompting import encode_output_texts

    key = jax.random.key(tr.seed)
    global_step = int(state.step)
    t_end = time.time()
    while global_step < tr.max_train_steps:
        epoch_steps = 0
        for group in batches():
            epoch_steps += 1
            px_in = jnp.concatenate(
                [jnp.asarray(g["pixels_in"]) for g in group])
            px_out = jnp.concatenate(
                [jnp.asarray(g["pixels_out"]) for g in group])
            codes_in = np.asarray(get_code(px_in)) + TOKENS_M.vq_offset
            codes_out = np.asarray(get_code(px_out)) + TOKENS_M.vq_offset
            texts_in = [g["instruction"] for g in group]
            out_text_ids, out_text_lens = encode_output_texts(
                tokenizer, [g["output_text"] for g in group], msl)
            key, k1 = jax.random.split(key)
            noisy_img, img_lab, noisy_txt, txt_lab, t = interleave_noising(
                k1, jnp.asarray(codes_out), jnp.asarray(out_text_ids),
                eps=tr.min_masking_rate, mask_token=TOKENS_M.mask)
            if up is not None:
                seq, labels, mask = up.interleave(
                    codes_in, texts_in, np.asarray(noisy_img),
                    np.asarray(noisy_txt), np.asarray(txt_lab),
                    cond_dropout_prob=tr.cond_dropout_prob,
                    output_image_labels=np.asarray(img_lab),
                    output_text_lengths=out_text_lens,
                    is_text_only=[g["is_text_only"] for g in group])
            else:  # tiny debug path without a tokenizer
                seq = np.concatenate([codes_in, np.asarray(noisy_img),
                                      np.asarray(noisy_txt)], 1)
                labels = np.concatenate(
                    [np.full_like(codes_in, -100), np.asarray(img_lab),
                     np.asarray(txt_lab)], 1)
                mask = np.ones_like(seq)
            batch = (jax.device_put(seq.astype(np.int32), bsh),
                     jax.device_put(labels.astype(np.int32), bsh),
                     jax.device_put(mask.astype(np.int32), bsh),
                     jax.device_put(np.asarray(t, np.float32), bsh))
            key, k2 = jax.random.split(key)
            state, metrics = step(state, batch, k2)
            global_step += 1
            scalars = {k: float(v) for k, v in metrics.items()}
            scalars["lr"] = float(sched(global_step))
            scalars["batch_time"] = time.time() - t_end
            t_end = time.time()
            logger.update(**scalars)
            if global_step % tr.log_every == 0:
                writer.write(global_step, scalars)
                print(f"step {global_step}: {logger}")
            if global_step % tr.save_every == 0:
                mngr.save(global_step, state, {"step": global_step})
            if (tr.generate_every and tokenizer is not None
                    and global_step % tr.generate_every == 0):
                # periodic validation generation (train_interleave.py:950-964)
                _validate(state.params, mcfg, vq_params, vq_cfg, tokenizer,
                          group[0], cfg, global_step)
            if (getattr(tr, "validate_mmu_every", 0) and tokenizer is not None
                    and global_step % tr.validate_mmu_every == 0):
                _validate_mmu(state.params, mcfg, get_code, tokenizer, cfg,
                              global_step)
            if (getattr(tr, "validate_chat_every", 0)
                    and tokenizer is not None
                    and global_step % tr.validate_chat_every == 0):
                _validate_chat(state.params, mcfg, tokenizer, cfg,
                               global_step)
            if global_step >= tr.max_train_steps:
                break
        if epoch_steps == 0:
            raise RuntimeError(
                f"data stream produced no batches — check shards pattern "
                f"{cfg.shards!r} (need >= batch x accum = "
                f"{tr.batch_size * tr.gradient_accumulation_steps} samples)")
    mngr.save(global_step, state, {"step": global_step})
    mngr.wait()
    writer.close()
    print(f"[done] {global_step} steps")


if __name__ == "__main__":
    main()
