"""ParaRL training loop (SFT -> RL), BASELINE config #5.

Drives :mod:`mmada_parallel_tpu.training.pararl`: sample trajectories from
the current policy with the fused TI2TI sampler, score final (text, image)
pairs with pluggable reward callables, and apply REINFORCE updates through
the per-step commit log-probabilities.

The semantic reward models themselves (VLM/CLIP scorers) are deployment
plumbing — point ``--reward`` at a python function ``module:fn`` with
signature ``(final_ids, codes, meta) -> [B] float``; the default is a
placeholder diversity reward so the loop runs end-to-end.
"""

import argparse
import importlib
import os
import time


def default_reward(final_ids, codes, meta):
    """Default: code-diversity proxy (see training/pararl.py for the
    concrete reward library — target-match, keyword adherence)."""
    from mmada_parallel_tpu.training.pararl import code_diversity_reward
    return code_diversity_reward(final_ids, codes, meta)


def main(argv=None):
    from mmada_parallel_tpu.utils.compile_cache import \
        enable_compilation_cache
    enable_compilation_cache()  # persistent XLA cache (opt-out via env)
    import numpy as np
    import jax
    import jax.numpy as jnp

    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.models import (LLaDAConfig, init_llada_params,
                                           param_shardings)
    from mmada_parallel_tpu.models import convert as CV
    from mmada_parallel_tpu.parallel import MeshConfig, make_mesh, shard_params
    from mmada_parallel_tpu.samplers.parallel_ti2ti import TI2TIOptions
    from mmada_parallel_tpu.training.pararl import (rollout_ti2ti,
                                                    pararl_loss, RewardSpec,
                                                    extract_image_codes)
    from mmada_parallel_tpu.training.trainer import (OptimizerConfig,
                                                     make_optimizer,
                                                     make_train_step,
                                                     TrainState)
    from mmada_parallel_tpu.training.checkpoint import CheckpointManager

    p = argparse.ArgumentParser()
    p.add_argument("--init_from", default=None,
                   help="SFT checkpoint dir (None = tiny debug model)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--prompts", default=None,
                   help="jsonl of {prompt_ids: [...]} rollout prompts")
    p.add_argument("--reward", default=None, help="module:function")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--rollouts_per_step", type=int, default=2)
    p.add_argument("--traj_subsample", type=int, default=8,
                   help="trajectory steps scored per update")
    p.add_argument("--lr", type=float, default=1e-6)
    p.add_argument("--text_steps", type=int, default=16)
    p.add_argument("--timesteps", type=int, default=8)
    p.add_argument("--grid", type=int, default=4, help="token grid side")
    p.add_argument("--text_gen_length", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)

    mesh = make_mesh(MeshConfig())
    if args.init_from:
        cfg, params = CV.load_llada_checkpoint(args.init_from)
        params = jax.tree_util.tree_map(jnp.asarray, params)
        T = tk.TOKENS_A
    else:
        T = tk.VariantATokens(mask=250, newline=251, answer_start=252,
                              answer_end=253, boi=254, eoi=255,
                              uncondition=249, pad=248,
                              text_vocab_size=256, codebook_size=32)
        cfg = LLaDAConfig.tiny(d_model=64, n_layers=2, vocab_size=288,
                               mask_token_id=T.mask)
        params = init_llada_params(jax.random.key(args.seed), cfg)
    params = shard_params(params, param_shardings(cfg), mesh)

    if args.reward:
        mod, fn = args.reward.split(":")
        reward_fn = getattr(importlib.import_module(mod), fn)
    else:
        reward_fn = default_reward
    rewards = RewardSpec(fns=[reward_fn], weights=[1.0])

    opts = TI2TIOptions(text_steps=args.text_steps, timesteps=args.timesteps,
                        temperature=1.0, text_temperature=0.7,
                        cfg_scale=0.0, cfg_img=0.0,
                        text_vocab_size=T.text_vocab_size,
                        codebook_size=T.codebook_size, mask_token=T.mask)

    # prompts: jsonl or a default synthetic prompt set
    if args.prompts:
        import json
        prompt_sets = [json.loads(l)["prompt_ids"]
                       for l in open(args.prompts) if l.strip()]
    else:
        prompt_sets = [[5, 6, 7, 8], [9, 10, 11, 12]]

    gh = gw = args.grid
    # right-pad prompts to a common length so every rollout shares one
    # layout (and one compiled sampler)
    plen = max(len(p) for p in prompt_sets)
    prompt_sets = [list(p) + [T.pad] * (plen - len(p)) for p in prompt_sets]
    seqs = []
    for pr in prompt_sets:
        ids, lay = tk.assemble_ti2ti_sequence(pr, args.text_gen_length,
                                              gh, gw, [T.answer_end],
                                              tokens=T)
        seqs.append((ids, lay))
    layout = seqs[0][1]

    opt = make_optimizer(OptimizerConfig(lr=args.lr, weight_decay=0.0,
                                         grad_clip=1.0), params)
    state = TrainState.create(params, opt)

    sub_idx = jnp.asarray(np.linspace(0, args.text_steps - 1,
                                      args.traj_subsample).round().astype(int))

    def loss_fn(p, batch, key):
        traj, rw = batch
        loss, metrics = pararl_loss(p, cfg, traj, rw, opts,
                                    step_indices=sub_idx)
        return loss, metrics

    step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=0)
    rollout = jax.jit(lambda p, i, k: rollout_ti2ti(p, cfg, i, layout, opts, k))

    mngr = CheckpointManager(os.path.join(args.output_dir, "ckpt"))
    key = jax.random.key(args.seed)
    for it in range(args.steps):
        batch_ids = np.stack([seqs[j % len(seqs)][0]
                              for j in range(args.rollouts_per_step)])
        key, k1, k2 = jax.random.split(key, 3)
        final_ids, traj = rollout(state.params, jnp.asarray(batch_ids), k1)
        codes = extract_image_codes(final_ids, layout.image_positions(),
                                    T.text_vocab_size, T.codebook_size,
                                    opts.mask_token)
        rw = rewards(final_ids, codes)
        state, metrics = step(state, (traj, rw), k2)
        if it % 10 == 0:
            print(f"iter {it}: reward={float(metrics['reward_mean']):.4f} "
                  f"loss={float(metrics['loss']):.4f} "
                  f"grad_norm={float(metrics['grad_norm']):.3f}")
    mngr.save(args.steps, state, {"iters": args.steps})
    mngr.wait()
    print(f"[done] {args.steps} ParaRL iterations")


if __name__ == "__main__":
    main()
