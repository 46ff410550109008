"""ParaRL is a capability, not a scaffold: REINFORCE over rolled-out TI2TI
trajectories with a concrete token-level alignment reward must measurably
increase the reward on a tiny model (VERDICT r1 item 5).

The reward is :func:`make_target_match_reward` — fraction of generated image
codes matching a fixed target image — a self-contained proxy for the paper's
semantic scorers (``README.md:51``)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models.llada import LLaDAConfig, init_llada_params
from mmada_parallel_tpu.samplers.parallel_ti2ti import TI2TIOptions
from mmada_parallel_tpu.training.pararl import (
    rollout_ti2ti, pararl_loss, RewardSpec, make_target_match_reward,
    make_keyword_reward, code_diversity_reward, extract_image_codes)
from mmada_parallel_tpu.training.trainer import (
    OptimizerConfig, make_optimizer, make_train_step, TrainState)

pytestmark = pytest.mark.heavy

T = tk.VariantATokens(mask=250, newline=251, answer_start=252,
                      answer_end=253, boi=254, eoi=255, uncondition=249,
                      pad=248, text_vocab_size=256, codebook_size=32)


def test_pararl_reward_improves():
    cfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                           mlp_hidden_size=64, vocab_size=288,
                           mask_token_id=250)
    params = init_llada_params(jax.random.key(0), cfg)
    gh = gw = 2
    ids, lay = tk.assemble_ti2ti_sequence([5, 6, 7, 8], 4, gh, gw, [253],
                                          tokens=T)
    opts = TI2TIOptions(text_steps=4, timesteps=2, temperature=1.0,
                        text_temperature=0.7, cfg_scale=0.0, cfg_img=0.0,
                        text_vocab_size=256, codebook_size=32, mask_token=250)
    target = np.full(gh * gw, 17, np.int32)
    reward = RewardSpec(fns=[make_target_match_reward(target)], weights=[1.0])

    opt = make_optimizer(OptimizerConfig(lr=3e-3, weight_decay=0.0,
                                         grad_clip=1.0), params)
    state = TrainState.create(params, opt)

    def loss_fn(p, batch, key):
        traj, rw = batch
        return pararl_loss(p, cfg, traj, rw, opts)

    step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=0)
    rollout = jax.jit(lambda p, i, k: rollout_ti2ti(p, cfg, i, lay, opts, k))

    batch_ids = jnp.asarray(np.stack([ids] * 8))
    img_pos = lay.image_positions()
    key = jax.random.key(1)
    hist = []
    for _ in range(25):
        key, k1, k2 = jax.random.split(key, 3)
        fin, traj = rollout(state.params, batch_ids, k1)
        codes = extract_image_codes(fin, img_pos, 256, 32, 250)
        rw = reward(fin, codes)
        state, metrics = step(state, (traj, rw), k2)
        hist.append(float(metrics["reward_mean"]))
        assert np.isfinite(hist[-1])

    first, last = np.mean(hist[:5]), np.mean(hist[-5:])
    # seeded run measured 0.006 -> 0.206; demand a solid margin
    assert last > first + 0.05, f"no improvement: {first:.3f} -> {last:.3f}"


def test_concrete_rewards_shapes():
    codes = jnp.asarray([[1, 1, 2, 3], [4, 4, 4, 4]])
    ids = jnp.asarray([[9, 250, 11, 30, 31], [9, 10, 11, 30, 31]])
    div = code_diversity_reward(ids, codes)
    np.testing.assert_allclose(np.asarray(div), [0.75, 0.25])
    tm = make_target_match_reward(np.array([1, 1, 2, 9]))(ids, codes)
    np.testing.assert_allclose(np.asarray(tm), [0.75, 0.0])
    kw = make_keyword_reward([10, 30], 1, 5)(ids, codes)
    np.testing.assert_allclose(np.asarray(kw), [0.5, 1.0])


def test_train_pararl_cli_smoke(tmp_path):
    """cli/train_pararl main runs end-to-end on the tiny default model
    (covers the shared extract_image_codes wiring)."""
    from mmada_parallel_tpu.cli import train_pararl

    train_pararl.main([
        "--output_dir", str(tmp_path), "--steps", "2",
        "--rollouts_per_step", "2", "--text_steps", "4", "--timesteps", "2",
        "--grid", "2", "--text_gen_length", "4", "--traj_subsample", "2",
        "--lr", "1e-4"])
    assert (tmp_path / "ckpt").is_dir()
