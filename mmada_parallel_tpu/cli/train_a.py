"""Variant-A finetune solver CLI (the ``xllmx`` FinetuneSolver equivalent).

Mirrors ``MMaDA-Parallel-A/xllm/solvers/finetune/finetune.py`` +
``train/train.py`` on the TPU stack: GSPMD-sharded model, length-clustered
deterministic data order, grad accumulation, orbax checkpoints with
mid-epoch resume, TensorBoard/jsonl metrics.

    python -m mmada_parallel_tpu.cli.train_a --data_config data.yaml \
        --output_dir out --init_from /ckpts/MMaDA-Parallel-A ...
"""

import argparse
import os
import time


def build_parser():
    p = argparse.ArgumentParser()
    # mirrors finetune.py:163-213 / train.sh
    p.add_argument("--data_config", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--init_from", type=str, default=None)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--accum_iter", type=int, default=4)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--wd", type=float, default=0.1)
    p.add_argument("--warmup_epochs", type=float, default=0.001)
    p.add_argument("--clip_grad", type=float, default=4.0)
    p.add_argument("--max_seq_len", type=int, default=5120)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--save_iteration_interval", type=int, default=1000)
    p.add_argument("--ckpt_max_keep", type=int, default=2)
    p.add_argument("--checkpointing", action="store_true",
                   help="activation rematerialization")
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "fp32"])
    p.add_argument("--mesh_fsdp", type=int, default=1)
    p.add_argument("--shard_strategy", type=str, default="full",
                   choices=["full", "zero2", "ddp"],
                   help="fsdp-axis policy: full=FULL_SHARD/ZeRO-3, "
                        "zero2=SHARD_GRAD_OP/SDP, ddp=NO_SHARD "
                        "(ref finetune.py:387-390)")
    p.add_argument("--mesh_tensor", type=int, default=1)
    p.add_argument("--tp_ring", action="store_true",
                   help="run the backbone on the ring collective-matmul "
                        "TP path (parallel/tp_overlap.py) instead of plain "
                        "GSPMD — same math, boundary all-reduces unrolled "
                        "into compute-overlapped ppermute rings; requires "
                        "--mesh_tensor >= 2, --mesh_fsdp 1, llama blocks, "
                        "q and kv head counts divisible by the ring size "
                        "(A training is already maskless, so the ring "
                        "path's no-padding-mask contract holds)")
    p.add_argument("--cache_ann_on_disk", action="store_true",
                   help="process 0 builds a shared mmap annotation cache; "
                        "other processes spin-wait on its ready sentinel "
                        "(reference finetune.py:182)")
    p.add_argument("--tokenizer", type=str, default=None)
    p.add_argument("--tiny_model", action="store_true",
                   help="debug: random tiny model instead of a checkpoint")
    p.add_argument("--max_steps", type=int, default=None)
    return p


def main(argv=None):
    from mmada_parallel_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # persistent XLA cache (opt-out via env)
    import numpy as np
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer

    from mmada_parallel_tpu.models import (LLaDAConfig, init_llada_params,
                                           llada_forward, param_shardings)
    from mmada_parallel_tpu.models import convert as CV
    from mmada_parallel_tpu.parallel import (MeshConfig, make_mesh,
                                             batch_sharding)
    from mmada_parallel_tpu.data.dataset import (MetaDataset,
                                                 LengthClusteredSampler)
    from mmada_parallel_tpu.data.item_processor import AItemProcessor
    from mmada_parallel_tpu.training.losses import a_variant_losses
    from mmada_parallel_tpu.training.trainer import (OptimizerConfig,
                                                     make_optimizer,
                                                     make_train_step,
                                                     TrainState,
                                                     create_sharded_state,
                                                     state_shardings)
    from mmada_parallel_tpu.training.lr_schedules import half_cosine_with_warmup
    from mmada_parallel_tpu.training.checkpoint import CheckpointManager
    from mmada_parallel_tpu.utils.logging import MetricLogger, ScalarWriter

    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    import dataclasses

    mesh = make_mesh(MeshConfig(data=-1, fsdp=args.mesh_fsdp,
                                tensor=args.mesh_tensor))
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32

    # --- model ---
    if args.tiny_model:
        # --tp_ring needs n_heads and n_kv_heads % tensor == 0 (true of
        # the real 8B shape); the debug-tiny default (4q/2kv) breaks at
        # tensor > 2, so widen it proportionally
        tiny_kw = (dict(n_heads=2 * args.mesh_tensor,
                        n_kv_heads=args.mesh_tensor)
                   if args.tp_ring else {})
        cfg = LLaDAConfig.tiny(vocab_size=512, **tiny_kw)
        params = init_llada_params(jax.random.key(args.seed), cfg)
    else:
        cfg, params = CV.load_llada_checkpoint(args.init_from)
        params = jax.tree_util.tree_map(jnp.asarray, params)
    cfg = dataclasses.replace(
        cfg, compute_dtype=dtype,
        remat="whole_layer" if args.checkpointing else "none")
    # params are placed by create_sharded_state below (per --shard_strategy)

    # --- data ---
    tok_src = args.tokenizer or args.init_from
    if args.tiny_model and tok_src is None:
        class _T:
            bos_token_id, eos_token_id = 1, 2
            def __call__(self, t, **kw):
                return {"input_ids": [1] + [10 + ord(c) % 400 for c in t[:32]]}
        tokenizer = _T()
    else:
        tokenizer = AutoTokenizer.from_pretrained(tok_src,
                                                  trust_remote_code=True)
    proc = AItemProcessor(tokenizer, max_len=args.max_seq_len)
    ds = MetaDataset(args.data_config, proc,
                     cache_on_disk=args.cache_ann_on_disk,
                     rank=jax.process_index())
    sampler = LengthClusteredSampler(
        ds.lengths(), ds.types, batch_size=args.batch_size,
        world_size=jax.process_count(), rank=jax.process_index(),
        acc_grad=args.accum_iter, seed=args.seed)
    iters_per_epoch = max(len(sampler) // args.accum_iter, 1)

    # --- optimizer / step ---
    total = args.epochs * iters_per_epoch
    sched = half_cosine_with_warmup(
        args.lr, int(args.warmup_epochs * iters_per_epoch), total,
        args.min_lr)
    opt = make_optimizer(OptimizerConfig(lr=args.lr, weight_decay=args.wd,
                                         grad_clip=args.clip_grad,
                                         schedule=sched), params)
    state, p_specs, o_specs = create_sharded_state(
        params, opt, param_shardings(cfg), mesh, args.shard_strategy)

    if args.tp_ring:
        # training over the ring backbone: gradients match GSPMD's
        # (ppermute transposes to the inverse permutation; pinned by
        # tests/test_tp_overlap.py::test_ring_{backbone_gradients,
        # train_step}_*), so the optimizer trajectory is the same —
        # only the collective schedule differs.  Collate buckets L to
        # multiples of 128, which every supported g divides.
        from mmada_parallel_tpu.parallel.tp_overlap import \
            llada_forward_tp_overlap
        if args.mesh_tensor < 2 or args.mesh_fsdp != 1:
            raise SystemExit("--tp_ring needs --mesh_tensor >= 2 and "
                             "--mesh_fsdp 1 (ring TP shards the sequence "
                             "between blocks; fsdp would double-shard)")
        forward = lambda p, ids: llada_forward_tp_overlap(p, cfg, ids, mesh)
    else:
        forward = lambda p, ids: llada_forward(p, cfg, ids)

    def loss_fn(p, batch, key):
        ids, labels, lengths = batch
        logits = forward(p, ids)
        out = a_variant_losses(logits, ids, labels, lengths)
        return out["loss"], {"text_loss": out["text_loss"],
                             "image_loss": out["image_loss"]}

    # pin the output state placement so the strategy (in particular
    # zero2's replicated-params/sharded-opt-state split) survives every
    # step — without out_shardings XLA may re-place the donated state
    from jax.sharding import NamedSharding, PartitionSpec as P
    out_sh = (state_shardings(state.params, state.opt_state, p_specs,
                              o_specs, mesh),
              NamedSharding(mesh, P()))  # scalar metrics: replicated
    step = jax.jit(make_train_step(loss_fn, opt, accum_steps=args.accum_iter),
                   donate_argnums=0, out_shardings=out_sh)

    mngr = CheckpointManager(os.path.join(args.output_dir, "ckpt"),
                             max_to_keep=args.ckpt_max_keep)
    restored, meta, last = mngr.restore(state)
    start_epoch, start_iter = 0, 0
    logger = MetricLogger()
    if restored is not None:
        state = restored
        start_epoch = meta.get("epoch", 0)
        start_iter = meta.get("iter", 0)
        # seamless metric continuation (the reference's additional.{rank}.pth
        # payload, xllm/util/ckpt.py:114-119)
        if meta.get("metrics"):
            logger.load_state_dict(meta["metrics"])
        print(f"[resume] step {last} (epoch {start_epoch} iter {start_iter})")

    writer = ScalarWriter(os.path.join(args.output_dir, "tb"),
                          is_main=jax.process_index() == 0)
    bsh = batch_sharding(mesh)

    # bucket to multiples of 128 so XLA compiles once per bucket, not per
    # batch (replaces the reference's ragged repadding every step); the ring
    # path additionally needs L % tensor == 0, so widen to lcm(128, g) and
    # round the cap down to it (128 already covers any power-of-two g)
    import math as _math
    bucket = (_math.lcm(128, args.mesh_tensor) if args.tp_ring else 128)
    seq_cap = max(args.max_seq_len // bucket * bucket, bucket)

    def collate(batch_indices):
        items = [ds[i] for i in batch_indices]
        toks, labs = zip(*items)
        L = min(max(len(t) for t in toks), seq_cap)
        L = min((L + bucket - 1) // bucket * bucket, seq_cap)
        ids = np.zeros((len(toks), L), np.int32)
        labels = np.full((len(toks), L), -100, np.int32)
        lengths = np.asarray([min(len(t), L) for t in toks], np.int32)
        for r, (t, l) in enumerate(zip(toks, labs)):
            n = min(len(t), L)
            ids[r, :n] = t[:n]
            labels[r, :n] = l[:n]
        return ids, labels, lengths

    global_step = int(state.step)
    key = jax.random.key(args.seed)
    for epoch in range(start_epoch, args.epochs):
        sampler.set_epoch(epoch, start_iter if epoch == start_epoch else 0)
        micro = []
        t_end = time.time()
        for batch_idx in sampler:
            micro.append(collate(batch_idx))
            if len(micro) < args.accum_iter:
                continue
            # concat microbatches along leading dim (pad to common L)
            Lm = max(m[0].shape[1] for m in micro)
            def padcat(k):
                outs = []
                for m in micro:
                    a = m[k]
                    if a.ndim == 2 and a.shape[1] < Lm:
                        pad = np.full((a.shape[0], Lm - a.shape[1]),
                                      0 if k == 0 else -100, a.dtype)
                        a = np.concatenate([a, pad], 1)
                    outs.append(a)
                return np.concatenate(outs, 0)
            batch = (jax.device_put(padcat(0), bsh),
                     jax.device_put(padcat(1), bsh),
                     jax.device_put(np.concatenate([m[2] for m in micro]), bsh))
            micro = []
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
            global_step += 1
            scalars = {k: float(v) for k, v in metrics.items()}
            scalars["lr"] = float(sched(global_step))
            scalars["iter_time"] = time.time() - t_end
            t_end = time.time()
            logger.update(**scalars)
            if global_step % 10 == 0:
                writer.write(global_step, scalars)
                print(f"epoch {epoch} step {global_step}: {logger}")
            if global_step % args.save_iteration_interval == 0:
                mngr.save(global_step, state,
                          {"epoch": epoch,
                           "iter": global_step % iters_per_epoch,
                           "metrics": logger.state_dict()})
            if args.max_steps and global_step >= args.max_steps:
                break
        if args.max_steps and global_step >= args.max_steps:
            break
        mngr.save(global_step, state, {"epoch": epoch + 1, "iter": 0,
                                       "metrics": logger.state_dict()})
    mngr.wait()
    writer.close()
    print(f"[done] {global_step} steps")


if __name__ == "__main__":
    main()
