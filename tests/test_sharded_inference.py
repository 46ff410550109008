"""Sharded inference: the fused samplers under a (data, fsdp, tensor) mesh
must produce exactly the unsharded results (GSPMD inserts collectives; the
math is unchanged)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu import tokens as tk
from mmada_parallel_tpu.models.llada import (LLaDAConfig, init_llada_params,
                                             llada_forward, param_shardings)
from mmada_parallel_tpu.parallel import (MeshConfig, make_mesh, shard_params,
                                         batch_sharding)
from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                        generate_ti2ti)

TVS, CB, MASK, NEWLINE = 256, 32, 250, 251
TOK = tk.VariantATokens(mask=MASK, newline=NEWLINE, answer_start=252,
                        answer_end=253, boi=254, eoi=255, uncondition=249,
                        pad=248, text_vocab_size=TVS, codebook_size=CB)


@pytest.fixture(scope="module")
def setup(eight_devices):
    cfg = LLaDAConfig.tiny(d_model=64, n_heads=4, n_kv_heads=4, n_layers=2,
                           mlp_hidden_size=128, vocab_size=TVS + CB,
                           mask_token_id=MASK)
    params = init_llada_params(jax.random.key(2), cfg)
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2),
                     eight_devices)
    sharded = shard_params(params, param_shardings(cfg), mesh)
    return cfg, params, sharded, mesh


def test_sharded_forward_matches_unsharded(setup):
    cfg, params, sharded, mesh = setup
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 200, (4, 12)))
    ref = np.asarray(llada_forward(params, cfg, ids))
    ids_sh = jax.device_put(ids, batch_sharding(mesh))
    got = np.asarray(jax.jit(lambda p, i: llada_forward(p, cfg, i))(
        sharded, ids_sh))
    np.testing.assert_allclose(ref, got, atol=2e-4, rtol=2e-3)


def test_parabench_sweep_with_mesh(setup):
    from mmada_parallel_tpu.evaluation import EvalRequest, run_parabench_sweep
    from mmada_parallel_tpu.samplers.parallel_ti2ti import TI2TIOptions
    cfg, params, sharded, mesh = setup
    reqs = [EvalRequest(prompt_ids=[5, 6, 7], meta={"i": i})
            for i in range(4)]
    opts = TI2TIOptions(text_steps=4, timesteps=2, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=0.0,
                        text_vocab_size=TVS, codebook_size=CB,
                        mask_token=MASK)
    out = run_parabench_sweep(
        sharded, cfg, reqs, grid_hw=(2, 3), text_gen_length=8,
        end_token_ids=[9], opts=opts, batch_size=4, mesh=mesh, tokens=TOK)
    assert out["num_requests"] == 4
    assert len(out["results"]) == 4
    assert out["edits_per_min_per_chip"] > 0


def test_shard_strategies_train_identically(setup):
    """full (ZeRO-3) / zero2 (SDP) / ddp must produce the same numbers; the
    strategies differ only in WHERE params/optimizer state live
    (ref finetune.py:387-390)."""
    from mmada_parallel_tpu.training.trainer import (
        OptimizerConfig, make_optimizer, make_train_step, TrainState,
        create_sharded_state, state_shardings)

    cfg, params, _, mesh = setup

    def loss_fn(p, batch, key):
        ids, tgt = batch
        logits = llada_forward(p, cfg, ids)
        lp = jax.nn.log_softmax(logits, axis=-1)
        loss = -jnp.take_along_axis(lp, tgt[..., None], -1).mean()
        return loss, {"l": loss}

    opt = make_optimizer(OptimizerConfig(lr=1e-3), params)
    step = make_train_step(loss_fn, opt)

    rng = np.random.default_rng(5)
    batches = [(jnp.asarray(rng.integers(0, 200, (4, 8))),
                jnp.asarray(rng.integers(0, 200, (4, 8))))
               for _ in range(2)]

    # unsharded baseline
    st = TrainState.create(params, opt)
    base_losses = []
    for b in batches:
        st, m = step(st, b, None)
        base_losses.append(float(m["loss"]))

    specs = param_shardings(cfg)
    for strategy in ["full", "zero2", "ddp"]:
        state, p_specs, o_specs = create_sharded_state(
            params, opt, specs, mesh, strategy)

        # placement: zero2 = params replicated over fsdp, opt state sharded
        q_spec = str(state.params["blocks"]["q_proj"].sharding.spec)
        mu_q = state.opt_state[1][0].mu["blocks"]["q_proj"]
        mu_spec = str(mu_q.sharding.spec)
        if strategy == "full":
            assert "fsdp" in q_spec and "fsdp" in mu_spec
        elif strategy == "zero2":
            assert "fsdp" not in q_spec and "fsdp" in mu_spec
        else:
            assert "fsdp" not in q_spec and "fsdp" not in mu_spec

        out_sh = state_shardings(state.params, state.opt_state,
                                 p_specs, o_specs, mesh)
        jit_step = jax.jit(step, out_shardings=(out_sh, None))
        bsh = batch_sharding(mesh)
        for i, b in enumerate(batches):
            state, m = jit_step(
                state, jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, bsh), b), None)
            np.testing.assert_allclose(float(m["loss"]), base_losses[i],
                                       rtol=2e-5, err_msg=strategy)
        # placement preserved across steps
        mu_q2 = state.opt_state[1][0].mu["blocks"]["q_proj"]
        assert str(mu_q2.sharding.spec) == mu_spec, strategy


def test_sharded_ti2ti_matches_unsharded(setup):
    cfg, params, sharded, mesh = setup
    ids, lay = tk.assemble_ti2ti_sequence([5, 6, 7], 8, 2, 3, [9],
                                          tokens=TOK)
    batch = jnp.asarray(np.stack([ids] * 4))
    opts = TI2TIOptions(text_steps=4, timesteps=2, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=2.0,
                        text_vocab_size=TVS, codebook_size=CB,
                        mask_token=MASK)
    un = np.asarray([40, 41], np.int32)

    run = lambda p, i: generate_ti2ti(p, cfg, i, lay, opts,
                                      uncond_image_prefix=un, key=None)
    ref_ids, ref_codes = run(params, batch)
    got_ids, got_codes = jax.jit(run)(
        sharded, jax.device_put(batch, batch_sharding(mesh)))
    assert np.array_equal(np.asarray(ref_ids), np.asarray(got_ids))
    assert np.array_equal(np.asarray(ref_codes), np.asarray(got_codes))
