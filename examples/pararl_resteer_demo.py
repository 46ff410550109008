"""ParaRL re-steering demo: REINFORCE moves a TRAINED editing model to a
NEW edit rule it was never supervised on.

Stage 1 supervises the tiny A-variant model on the +1 palette shift
(``train_edit_demo_a.run_demo_a``).  Stage 2 defines a reward — fraction
of generated codes matching the **+2** shift — and runs the ParaRL loop
(``training/pararl``: trajectory rollout with per-step commit capture,
commit log-prob replay, REINFORCE with a moving baseline) on the trained
weights.  The trained policy is peaked, so exploration comes from the
rollout temperature; the reward and the temp-0 "+2 accuracy" both rise
from ~0 — the paper's claim (``README.md:51``) exercised end-to-end on a
policy that already had a conflicting supervised behavior, not just from
random init (that case is ``tests/test_pararl_improves.py``).

Run: ``python examples/pararl_resteer_demo.py [--pretrain 300]
[--updates 150] [--out results_ti2ti/pararl_resteer]``
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run_resteer(pretrain=300, updates=150, lr=2e-3, rollout_batch=16,
                rollout_temp=1.5, out_dir=None, seed=0, work_dir=None):
    import jax
    import jax.numpy as jnp
    from train_edit_demo_a import run_demo_a, TVS, CB, GRID, N_VQ
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                            generate_ti2ti)
    from mmada_parallel_tpu.training.pararl import (rollout_ti2ti,
                                                    pararl_loss, RewardSpec,
                                                    make_target_match_reward)
    from mmada_parallel_tpu.training.trainer import (OptimizerConfig,
                                                     make_optimizer,
                                                     make_train_step,
                                                     TrainState)

    # stage 1: supervised +1 shift
    m, params, cfg, T, tokz = run_demo_a(
        steps=pretrain, batch=32, out_dir=None, log_every=pretrain,
        return_params=True, seed=seed,
        work_dir=work_dir or "/tmp/pararl_resteer_grids")
    print(f"[stage1] +1 accuracy after {pretrain} steps: "
          f"{m['eval_code_accuracy']}", file=sys.stderr)

    # fixed evaluation input; reward targets the +2 shift
    cond, _ = tk.make_ti2ti_prompt("shift the palette by", "edit")
    prompt_ids = tokz(cond)["input_ids"]
    end_ids = tokz("</answer>", add_special_tokens=False)["input_ids"]
    ans_len = len(tokz("rotated colors done")["input_ids"])
    rng = np.random.default_rng(seed + 7)
    codes_in = rng.integers(0, CB, N_VQ)
    span = tk.add_break_line((codes_in + TVS).tolist(), GRID, GRID,
                             T.newline)
    con = prompt_ids[:-1] + [T.boi] + span + [T.eoi] + prompt_ids[-1:]
    ids, lay = tk.assemble_ti2ti_sequence(con, ans_len, GRID, GRID, end_ids,
                                          tokens=T)
    target2 = (codes_in + 2) % CB

    ropts = TI2TIOptions(text_steps=ans_len, timesteps=8,
                         temperature=rollout_temp, text_temperature=0.7,
                         cfg_scale=0.0, cfg_img=0.0, text_vocab_size=TVS,
                         codebook_size=CB, mask_token=T.mask)
    eopts = TI2TIOptions(text_steps=ans_len, timesteps=8, temperature=0.0,
                         text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0,
                         text_vocab_size=TVS, codebook_size=CB,
                         mask_token=T.mask)
    reward = RewardSpec(fns=[make_target_match_reward(target2)],
                        weights=[1.0])

    opt = make_optimizer(OptimizerConfig(lr=lr, weight_decay=0.0,
                                         grad_clip=1.0), params)
    state = TrainState.create(params, opt)

    def loss_fn(p, batch, key):
        traj, rw = batch
        return pararl_loss(p, cfg, traj, rw, ropts)

    step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=0)
    rollout = jax.jit(lambda p, i, k: rollout_ti2ti(p, cfg, i, lay, ropts,
                                                    k))
    evalf = jax.jit(lambda p, i: generate_ti2ti(p, cfg, i, lay, eopts))

    def eval_acc2(p):
        _, codes = evalf(p, jnp.asarray(ids)[None])
        return float((np.asarray(codes)[0] == target2).mean())

    batch_ids = jnp.asarray(np.stack([ids] * rollout_batch))
    img_pos = lay.image_positions()
    acc0 = eval_acc2(state.params)
    key = jax.random.key(seed + 3)
    hist, curve = [], []
    t0 = time.time()
    for i in range(updates):
        key, k1, k2 = jax.random.split(key, 3)
        fin, traj = rollout(state.params, batch_ids, k1)
        codes = jnp.clip(fin[:, img_pos] - TVS, 0, CB - 1)
        rw = reward(fin, codes)
        state, metrics = step(state, (traj, rw), k2)
        hist.append(float(metrics["reward_mean"]))
        if i % 10 == 0 or i == updates - 1:
            a = eval_acc2(state.params)
            curve.append({"update": i, "reward_mean": round(hist[-1], 4),
                          "eval_plus2_acc": round(a, 4)})
            print(f"[stage2] update {i:3d} reward {hist[-1]:.3f} "
                  f"+2-accuracy(temp0) {a:.3f}", file=sys.stderr)

    out = {
        "task": "ParaRL re-steer: supervised +1 shift -> reward for +2",
        "pretrain_steps": pretrain, "updates": updates,
        "pretrain_plus1_accuracy": m["eval_code_accuracy"],
        "initial_plus2_accuracy": round(acc0, 4),
        "final_plus2_accuracy": round(eval_acc2(state.params), 4),
        "reward_first5": round(float(np.mean(hist[:5])), 4),
        "reward_last5": round(float(np.mean(hist[-5:])), 4),
        "rl_seconds": round(time.time() - t0, 1),
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "metrics.json"), "w") as f:
            json.dump(out, f, indent=2)
        with open(os.path.join(out_dir, "reward_curve.jsonl"), "w") as f:
            for row in curve:
                f.write(json.dumps(row) + "\n")
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--pretrain", type=int, default=300)
    ap.add_argument("--updates", type=int, default=150)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--out", default="results_ti2ti/pararl_resteer")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run_resteer(pretrain=args.pretrain,
                                 updates=args.updates, lr=args.lr,
                                 out_dir=args.out), indent=2))
