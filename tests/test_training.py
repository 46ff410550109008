"""Training-stack tests: losses vs python-scan oracle, masking properties,
optimizer/train-step behavior, EMA, checkpoint roundtrip."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmada_parallel_tpu.training import losses as LS
from mmada_parallel_tpu.training import masking as MK
from mmada_parallel_tpu.training.trainer import (OptimizerConfig,
                                                 make_optimizer,
                                                 make_train_step, TrainState)
from mmada_parallel_tpu.training.lr_schedules import (half_cosine_with_warmup,
                                                      get_scheduler)
from mmada_parallel_tpu.training.ema import EMAConfig, ema_init, ema_update

ANS_S, ANS_E, IMG_S, IMG_E, NL = 252, 253, 254, 255, 251


def _oracle_a_losses(logits, input_ids, labels, lengths):
    """Literal python port of modeling_xllmx_dimoo.py:86-174 region scan."""
    B, L, V = logits.shape
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) \
        + logits.max(-1)
    ce = np.zeros((B, L))
    for b in range(B):
        for p in range(L):
            if labels[b, p] != -100:
                ce[b, p] = lse[b, p] - logits[b, p, labels[b, p]]
    valid = labels != -100
    interleave = ce[valid].mean() if valid.sum() else 0.0
    text_list, image_list = [], []
    for b in range(B):
        starts = np.nonzero(input_ids[b] == ANS_S)[0]
        if len(starts) == 0:
            continue
        a0 = starts[0]
        ends = np.nonzero(input_ids[b, a0:] == ANS_E)[0]
        a1 = a0 + ends[0] if len(ends) else lengths[b]
        region = input_ids[b, a0:a1]
        imgs = np.nonzero(region == IMG_S)[0]
        if len(imgs):
            i0 = a0 + imgs[0]
            iends = np.nonzero(input_ids[b, i0:] == IMG_E)[0]
            if len(iends):
                i1 = i0 + iends[0]
                for p in range(i0 + 1, i1):
                    if input_ids[b, p] != NL:
                        image_list.append(ce[b, p])
                for p in range(i1 + 1, a1):
                    if labels[b, p] != -100:
                        text_list.append(ce[b, p])
        else:
            for p in range(a0 + 1, a1):
                if labels[b, p] != -100:
                    text_list.append(ce[b, p])
    return (interleave,
            np.mean(text_list) if text_list else 0.0,
            np.mean(image_list) if image_list else 0.0)


def test_a_variant_losses_match_scan_oracle():
    rng = np.random.default_rng(0)
    B, L, V = 3, 24, 40
    logits = rng.normal(size=(B, L, V)).astype(np.float32)
    input_ids = rng.integers(0, 40, size=(B, L))
    labels = np.where(rng.uniform(size=(B, L)) < 0.5,
                      rng.integers(0, 40, size=(B, L)), -100)
    # row 0: answer with image region; row 1: answer text-only; row 2: none
    input_ids[0, 3] = ANS_S; input_ids[0, 5] = IMG_S; input_ids[0, 8] = NL
    input_ids[0, 11] = IMG_E; input_ids[0, 20] = ANS_E
    input_ids[1, 2] = ANS_S  # no end -> falls back to length
    input_ids[2][input_ids[2] >= 250] = 7  # strip accidental specials
    input_ids[1][13:][input_ids[1][13:] >= 250] = 9
    lengths = np.array([24, 18, 24])

    want = _oracle_a_losses(logits, input_ids, labels, lengths)
    got = LS.a_variant_losses(
        jnp.asarray(logits), jnp.asarray(input_ids), jnp.asarray(labels),
        jnp.asarray(lengths), answer_start_token=ANS_S,
        answer_end_token=ANS_E, image_start_token=IMG_S,
        image_end_token=IMG_E, newline_token=NL)
    np.testing.assert_allclose(float(got["interleave_loss"]), want[0], rtol=1e-5)
    np.testing.assert_allclose(float(got["text_loss"]), want[1], rtol=1e-5)
    np.testing.assert_allclose(float(got["image_loss"]), want[2], rtol=1e-5)


def test_m_interleave_loss_slices():
    B, msl, nvq = 2, 6, 4
    L = 20
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(B, L, 16)).astype(np.float32)
    labels = np.full((B, L), -100)
    labels[:, -msl:] = rng.integers(0, 16, (B, msl))
    labels[:, -msl - nvq - 1:-msl - 1] = rng.integers(0, 16, (B, nvq))
    t = np.array([0.5, 0.25], np.float32)
    out = LS.m_interleave_loss(jnp.asarray(logits), jnp.asarray(labels),
                               jnp.asarray(t), msl, nvq, 2.0, 3.0)
    ce = np.asarray(LS.token_cross_entropy(jnp.asarray(logits),
                                           jnp.asarray(labels)))
    text = (ce[:, -msl:] / t[:, None]).sum() / msl
    img = ce[:, -msl - nvq - 2:-msl].mean()
    np.testing.assert_allclose(float(out["loss"]), 2 * text + 3 * img, rtol=1e-6)


def test_token_cross_entropy_ignores_minus_100():
    logits = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 8)),
                         jnp.float32)
    labels = jnp.asarray([[-100, 3, -100, 5]])
    ce = np.asarray(LS.token_cross_entropy(logits, labels))
    assert ce[0, 0] == 0 and ce[0, 2] == 0
    assert ce[0, 1] > 0 and ce[0, 3] > 0


def test_mask_codes_properties():
    codes = jnp.asarray(np.random.default_rng(3).integers(100, 200, (4, 50)))
    masked, labels = MK.mask_codes(jax.random.key(0), codes, mask_token=999)
    m = np.asarray(masked)
    lab = np.asarray(labels)
    is_masked = m == 999
    assert (is_masked.sum(1) >= 1).all()
    # labels exactly at masked positions, original values
    assert np.array_equal(lab != -100, is_masked)
    assert np.array_equal(lab[is_masked],
                          np.asarray(codes)[is_masked])


def test_interleave_noising_first_token_protected():
    img = jnp.asarray(np.random.default_rng(4).integers(0, 100, (8, 16)))
    txt = jnp.asarray(np.random.default_rng(5).integers(0, 100, (8, 12)))
    ni, il, nt, tl, t = MK.interleave_noising(jax.random.key(1), img, txt,
                                              mask_token=777)
    assert not np.any(np.asarray(nt)[:, 0] == 777)
    assert np.asarray(t).min() >= 1e-3 and np.asarray(t).max() <= 1.0
    # at least one image token masked per row
    assert ((np.asarray(ni) == 777).sum(1) >= 1).all()


def test_train_step_descends_and_accumulates():
    def loss_fn(params, batch, key):
        x, y = batch
        pred = x @ params["w"]
        loss = jnp.mean((pred - y) ** 2)
        return loss, {"mse": loss}

    rng = np.random.default_rng(6)
    w_true = rng.normal(size=(4, 1)).astype(np.float32)
    x = rng.normal(size=(16, 4)).astype(np.float32)
    y = x @ w_true
    params = {"w": jnp.zeros((4, 1))}
    ocfg = OptimizerConfig(lr=0.1, weight_decay=0.0, grad_clip=None)
    opt = make_optimizer(ocfg, params)
    state = TrainState.create(params, opt)

    step1 = make_train_step(loss_fn, opt, accum_steps=1)
    step4 = make_train_step(loss_fn, opt, accum_steps=4)
    s1, m1 = step1(state, (jnp.asarray(x), jnp.asarray(y)), None)
    s4, m4 = step4(state, (jnp.asarray(x), jnp.asarray(y)), None)
    assert float(m1["loss"]) > 0
    # accumulated grads average to the same full-batch gradient
    np.testing.assert_allclose(np.asarray(s1.params["w"]),
                               np.asarray(s4.params["w"]), atol=1e-5)
    # loss decreases over steps
    s, _ = step1(s1, (jnp.asarray(x), jnp.asarray(y)), None)
    _, m_last = step1(s, (jnp.asarray(x), jnp.asarray(y)), None)
    assert float(m_last["loss"]) < float(m1["loss"])


def test_train_step_skips_nonfinite():
    def loss_fn(params, batch, key):
        loss = jnp.where(batch > 0, jnp.nan, 0.1) * jnp.sum(params["w"] ** 2) + batch
        return loss, {}

    params = {"w": jnp.ones((2,))}
    opt = make_optimizer(OptimizerConfig(lr=0.1, grad_clip=None), params)
    state = TrainState.create(params, opt)
    step = make_train_step(loss_fn, opt)
    s, m = step(state, jnp.asarray(1.0), None)
    assert int(m["nonfinite"]) == 1
    np.testing.assert_array_equal(np.asarray(s.params["w"]),
                                  np.asarray(params["w"]))


def test_decay_mask_excludes_1d():
    params = {"w": jnp.ones((3, 3)), "norm": jnp.ones((3,))}
    opt = make_optimizer(OptimizerConfig(lr=0.0, weight_decay=1.0,
                                         grad_clip=None), params)
    state = TrainState.create(params, opt)
    step = make_train_step(lambda p, b, k: (jnp.sum(p["w"]) * 0.0, {}), opt)
    s, _ = step(state, None, None)
    # zero lr + wd: norms unchanged regardless (wd masked)
    np.testing.assert_array_equal(np.asarray(s.params["norm"]),
                                  np.ones((3,)))


def test_half_cosine_schedule_endpoints():
    f = half_cosine_with_warmup(1.0, 10, 110, min_lr=0.1)
    assert float(f(0)) == 0.0
    np.testing.assert_allclose(float(f(10)), 1.0, atol=1e-6)
    np.testing.assert_allclose(float(f(110)), 0.1, atol=1e-6)


def test_hf_scheduler_factory():
    for name in ["constant", "constant_with_warmup", "linear", "cosine",
                 "cosine_with_min_lr", "polynomial"]:
        f = get_scheduler(name, 1.0, warmup_steps=5, total_steps=50,
                          min_lr_scale=0.2)
        v = [float(f(s)) for s in [0, 5, 25, 50]]
        assert all(np.isfinite(v))
        assert v[1] == pytest.approx(1.0)
    f = get_scheduler("cosine_with_min_lr", 1.0, warmup_steps=0,
                      total_steps=50, min_lr_scale=0.2)
    np.testing.assert_allclose(float(f(50)), 0.2, atol=1e-6)


def test_ema_ramp_and_update():
    cfg = EMAConfig(decay=0.99)
    params = {"w": jnp.zeros((2,))}
    ema = ema_init(params)
    new = {"w": jnp.ones((2,))}
    # step 1: decay 0 -> ema jumps to params
    ema = ema_update(cfg, ema, new, jnp.asarray(1))
    np.testing.assert_allclose(np.asarray(ema["w"]), 1.0)
    ema = ema_update(cfg, {"w": jnp.zeros((2,))}, new, jnp.asarray(10**6))
    np.testing.assert_allclose(np.asarray(ema["w"]), 0.01, rtol=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    from mmada_parallel_tpu.training.checkpoint import CheckpointManager
    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    opt = make_optimizer(OptimizerConfig(), params)
    state = TrainState.create(params, opt)
    mngr = CheckpointManager(str(tmp_path / "ckpt"), max_to_keep=2)
    assert mngr.save(0, state, {"epoch": 0, "note": "first"})
    mngr.wait()
    restored, meta, step = mngr.restore(state)
    assert step == 0 and meta["note"] == "first"
    np.testing.assert_array_equal(np.asarray(restored.params["w"]),
                                  np.asarray(params["w"]))
    mngr.close()


def test_train_m_validators(tmp_path):
    """MMU + chat validators (train_interleave.py:1176-1359 equivalents)
    write jsonl artifacts from tiny inputs."""
    import json
    from types import SimpleNamespace as NS
    from PIL import Image
    import jax
    import jax.numpy as jnp
    from mmada_parallel_tpu.models.llada import LLaDAConfig, init_llada_params
    from mmada_parallel_tpu.models import magvit2 as MVQ
    from mmada_parallel_tpu.cli.train_m import _validate_mmu, _validate_chat

    mcfg = LLaDAConfig.tiny(d_model=32, n_heads=2, n_kv_heads=2, n_layers=1,
                            mlp_hidden_size=64, vocab_size=512)
    params = init_llada_params(jax.random.key(0), mcfg)
    vq_cfg = MVQ.MagvitConfig.tiny()
    vq_params = MVQ.init_magvit_params(jax.random.key(1), vq_cfg)
    get_code = jax.jit(lambda px: MVQ.magvit_get_code(vq_params, vq_cfg, px))

    class Tok:
        bos_token_id = 1

        def __call__(self, t, **kw):
            return {"input_ids": [10 + ord(c) % 50 for c in t[:12]]}

        def decode(self, ids, **kw):
            return " ".join(str(i) for i in ids)

    img_root = tmp_path / "imgs"; img_root.mkdir()
    Image.new("RGB", (16, 16), (90, 10, 10)).save(img_root / "a.png")
    pf = tmp_path / "mmu.json"
    pf.write_text(json.dumps([
        {"file_name": "a.png",
         "messages": [{"role": "user", "content": "what is shown"}]},
        {"file_name": "missing.png", "messages": []},
    ]))
    jl = tmp_path / "chat.jsonl"
    jl.write_text('{"question": "hello there"}\n')

    cfg = NS(output_dir=str(tmp_path / "out"),
             dataset=NS(params=NS(mmu_validation_prompts_file=str(pf),
                                  mmu_image_root=str(img_root),
                                  lm_chat_validation_jsonl=str(jl)),
                        preprocessing=NS(max_seq_length=16, resolution=16)))

    _validate_mmu(params, mcfg, get_code, Tok(), cfg, 7)
    _validate_chat(params, mcfg, Tok(), cfg, 7)

    mmu_rows = [json.loads(l) for l in
                open(tmp_path / "out" / "validation" / "mmu_step0000007.jsonl")]
    assert len(mmu_rows) == 1 and mmu_rows[0]["file_name"] == "a.png"
    assert isinstance(mmu_rows[0]["response"], str)
    chat_rows = [json.loads(l) for l in
                 open(tmp_path / "out" / "validation" / "chat_step0000007.jsonl")]
    assert chat_rows[0]["question"] == "hello there"


def test_interleave_pair_shard_dataset(tmp_path):
    """InterleavePairShardDataset: the normalize_example field zoo
    (train_interleave.py:340-476) — paired images, text-only fallback,
    placeholder output image."""
    import io as _io
    import tarfile
    from PIL import Image
    from mmada_parallel_tpu.data.shards import InterleavePairShardDataset

    def png(color):
        b = _io.BytesIO()
        Image.new("RGB", (8, 8), color).save(b, format="PNG")
        return b.getvalue()

    path = tmp_path / "pairs-000.tar"
    with tarfile.open(path, "w") as tf:
        members = [
            # full edit pair
            ("s0.input.jpg", png((200, 0, 0))),
            ("s0.output.jpg", png((0, 200, 0))),
            ("s0.input_text.txt", b"make it green"),
            ("s0.output_text.txt", b"I changed the color."),
            # text-only (no input image, no output image -> placeholders)
            ("s1.instruction", b"just talk"),
            ("s1.output_text.txt", b"ok"),
            # neither text field -> dropped
            ("s2.input.jpg", png((1, 2, 3))),
        ]
        for name, payload in members:
            ti = tarfile.TarInfo(name); ti.size = len(payload)
            tf.addfile(ti, _io.BytesIO(payload))

    ds = InterleavePairShardDataset(str(path), resolution=8)
    got = list(ds)
    assert [g["__key__"] for g in got] == ["s0", "s1"]
    s0, s1 = got
    assert s0["instruction"] == "make it green"
    assert s0["output_text"] == "I changed the color."
    assert s0["input_image"].getpixel((0, 0))[0] > 150   # red-ish input
    assert s0["output_image"].getpixel((0, 0))[1] > 150  # green-ish output
    assert not s0["is_text_only"]
    assert s1["is_text_only"]
    assert s1["input_image"].getpixel((0, 0)) == (0, 0, 0)  # placeholder


def test_train_m_main_loop_edit_pairs(tmp_path):
    """cli/train_m end-to-end on a tiny paired shard: two steps run, a
    checkpoint lands, and the loop consumes true (input, output) pairs."""
    import io as _io
    import tarfile
    from PIL import Image
    from mmada_parallel_tpu.cli import train_m

    def png(color):
        b = _io.BytesIO()
        Image.new("RGB", (16, 16), color).save(b, format="PNG")
        return b.getvalue()

    path = tmp_path / "pairs-000.tar"
    with tarfile.open(path, "w") as tf:
        for i in range(16):
            for name, payload in [
                (f"p{i:02d}.input.jpg", png((10 * i, 0, 0))),
                (f"p{i:02d}.output.jpg", png((0, 10 * i, 0))),
                (f"p{i:02d}.input_text.txt", f"edit {i}".encode()),
                (f"p{i:02d}.output_text.txt", f"done {i}".encode()),
            ]:
                ti = tarfile.TarInfo(name); ti.size = len(payload)
                tf.addfile(ti, _io.BytesIO(payload))

    out = tmp_path / "out"
    # batch 8 = the conftest data-axis width; tiny MagViT at res 8 is a
    # 4x4 grid -> num_vq_tokens 16 (shortest sequence that still carries
    # text + both image spans; keeps the CPU compile inside the fast tier)
    train_m.main([
        "tiny_debug=true",
        f"shards={path}",
        f"output_dir={out}",
        "dataset.preprocessing.max_seq_length=8",
        "dataset.preprocessing.resolution=8",
        "model.mmada.num_vq_tokens=16",
        "training.max_train_steps=2",
        "training.batch_size=8",
        "training.gradient_accumulation_steps=1",
        "training.save_every=2",
        "training.log_every=1",
        "training.warmup_steps=1",
    ])
    assert (out / "ckpt").exists()
