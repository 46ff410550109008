"""ParaRL demo: REINFORCE improves a partially-SFT'd editing model.

Stage 1 supervises the tiny A-variant model on the +1 palette shift for a
SHORT run (default 40 steps — ~0.2 edit accuracy, an uncertain policy).
Stage 2 defines a reward — fraction of generated codes matching the
target shift — and runs the ParaRL loop (``training/pararl``: trajectory
rollout with per-step commit capture, commit log-prob replay, REINFORCE
with a per-batch-mean baseline).  Reward and temp-0 accuracy climb well
past where SFT left off (committed run: reward 0.14 -> 0.47, accuracy
0.25 -> ~0.45 in 100 updates) — the paper's SFT-then-ParaRL recipe
(``README.md:51``) end-to-end on real trajectories.

Two honest negative results, kept for the record:

* ``--target_shift 2`` (reward a rule CONFLICTING with the supervision)
  does not learn from a converged policy: after full SFT the logit
  margins swamp any rollout temperature, rollouts never produce a +2
  match, every reward is 0, and the REINFORCE advantage vanishes.  Pure
  on-policy REINFORCE cannot re-steer a peaked policy without an
  exploration mechanism.
* An earlier version of this demo extracted codes by clipping
  ``mask_token - vq_offset`` into range, which aliases still-masked cells
  to code 0 — REINFORCE promptly reward-hacked the aliasing wherever the
  target had a 0.  ``training/pararl.extract_image_codes`` (-1 at masked
  cells) closes that hole and is what this demo and ``cli/train_pararl``
  now use.

Run: ``python examples/pararl_resteer_demo.py [--pretrain 40]
[--updates 100] [--out results_ti2ti/pararl_resteer]``
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def run_resteer(pretrain=40, updates=100, lr=2e-3, rollout_batch=16,
                rollout_temp=1.5, target_shift=1, out_dir=None, seed=0,
                work_dir=None):
    import jax
    import jax.numpy as jnp
    from train_edit_demo_a import (run_demo_a, assemble_eval_sequence,
                                   TVS, CB, N_VQ)
    from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                            generate_ti2ti)
    from mmada_parallel_tpu.training.pararl import (rollout_ti2ti,
                                                    pararl_loss, RewardSpec,
                                                    make_target_match_reward,
                                                    extract_image_codes)
    from mmada_parallel_tpu.training.trainer import (OptimizerConfig,
                                                     make_optimizer,
                                                     make_train_step,
                                                     TrainState)

    # stage 1: (partial) supervised +1 shift
    m, params, cfg, T, tokz = run_demo_a(
        steps=pretrain, batch=32, out_dir=None, log_every=pretrain,
        return_params=True, seed=seed, work_dir=work_dir)
    print(f"[stage1] +1 accuracy after {pretrain} steps: "
          f"{m['eval_code_accuracy']}", file=sys.stderr)

    # fixed evaluation input; reward targets the +target_shift rule
    rng = np.random.default_rng(seed + 7)
    codes_in = rng.integers(0, CB, N_VQ)
    ids, lay, ans_len = assemble_eval_sequence(tokz, T, codes_in)
    target = (codes_in + target_shift) % CB

    ropts = TI2TIOptions(text_steps=ans_len, timesteps=8,
                         temperature=rollout_temp, text_temperature=0.7,
                         cfg_scale=0.0, cfg_img=0.0, text_vocab_size=TVS,
                         codebook_size=CB, mask_token=T.mask)
    eopts = TI2TIOptions(text_steps=ans_len, timesteps=8, temperature=0.0,
                         text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0,
                         text_vocab_size=TVS, codebook_size=CB,
                         mask_token=T.mask)
    reward = RewardSpec(fns=[make_target_match_reward(target)],
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

    def eval_acc(p):
        _, codes = evalf(p, jnp.asarray(ids)[None])
        return float((np.asarray(codes)[0] == target).mean())

    batch_ids = jnp.asarray(np.stack([ids] * rollout_batch))
    acc0 = eval_acc(state.params)
    key = jax.random.key(seed + 3)
    hist, curve = [], []
    t0 = time.time()
    for i in range(updates):
        key, k1, k2 = jax.random.split(key, 3)
        fin, traj = rollout(state.params, batch_ids, k1)
        # -1 at still-masked cells: no reward for generating nothing
        codes = extract_image_codes(fin, lay.image_positions(), TVS, CB,
                                    T.mask)
        rw = reward(fin, codes)
        state, metrics = step(state, (traj, rw), k2)
        hist.append(float(metrics["reward_mean"]))
        if i % 10 == 0 or i == updates - 1:
            a = eval_acc(state.params)
            curve.append({"update": i, "reward_mean": round(hist[-1], 4),
                          "eval_acc": round(a, 4)})
            print(f"[stage2] update {i:3d} reward {hist[-1]:.3f} "
                  f"+{target_shift}-accuracy(temp0) {a:.3f}",
                  file=sys.stderr)

    out = {
        "task": (f"ParaRL: {pretrain}-step SFT on +1 shift, then REINFORCE "
                 f"with a +{target_shift}-shift reward"),
        "pretrain_steps": pretrain, "updates": updates,
        "pretrain_plus1_accuracy": m["eval_code_accuracy"],
        "initial_accuracy": round(acc0, 4),
        "final_accuracy": round(eval_acc(state.params), 4),
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
    ap.add_argument("--pretrain", type=int, default=40)
    ap.add_argument("--updates", type=int, default=100)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--target_shift", type=int, default=1)
    ap.add_argument("--out", default="results_ti2ti/pararl_resteer")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    print(json.dumps(run_resteer(pretrain=args.pretrain,
                                 updates=args.updates, lr=args.lr,
                                 target_shift=args.target_shift,
                                 out_dir=args.out), indent=2))
