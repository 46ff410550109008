"""Ring collective-matmul TP (parallel/tp_overlap.py) vs GSPMD forward.

The ring decomposition must be a pure re-scheduling of the Megatron TP
math: same outputs (to reduction-order tolerance), same wire volume.
These tests pin the algebra on the 8-virtual-device CPU mesh; the
v5e:2x4 AOT census (test_multichip_model.py / bench.py) measures what
the TPU scheduler does with the freed dependencies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mmada_parallel_tpu.models import (LLaDAConfig, init_llada_params,
                                       llada_forward, param_shardings)
from mmada_parallel_tpu.parallel import MeshConfig, make_mesh
from mmada_parallel_tpu.parallel.tp_overlap import (llada_forward_tp_overlap,
                                                    ring_ag_matmul,
                                                    ring_matmul_rs)

G = 8


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=1, fsdp=1, tensor=G))


def test_ring_ag_matmul_matches_dense(mesh):
    """Per-chip σ-ordered outputs equal the dense product reordered by
    sigma_positions (rows arrive in ring-delivery order by design)."""
    from mmada_parallel_tpu.parallel.tp_overlap import sigma_positions

    k1, k2, k3 = jax.random.split(jax.random.key(0), 3)
    B, L, D, F = 2, 48, 16, 24          # C = 6 per chip (half split: 3+3)
    h = jax.random.normal(k1, (B, L, D), jnp.float32)
    w1 = jax.random.normal(k2, (D, F), jnp.float32)
    w2 = jax.random.normal(k3, (D, F), jnp.float32)

    def f(h_s, w1_l, w2_l):
        r = jax.lax.axis_index("tensor")
        pos = sigma_positions(G, h_s.shape[1], r)
        y1, y2 = ring_ag_matmul(h_s, [w1_l, w2_l], G)
        return y1[None], y2[None], pos[None]

    y1, y2, pos = jax.jit(jax.shard_map(
        f, mesh=mesh,
        in_specs=(P(None, "tensor", None), P(None, "tensor"),
                  P(None, "tensor")),
        out_specs=(P("tensor"), P("tensor"), P("tensor")),
        check_vma=False))(h, w1, w2)
    y1, y2, pos = np.asarray(y1), np.asarray(y2), np.asarray(pos)
    Fl = F // G
    for c in range(G):
        np.testing.assert_allclose(
            y1[c], np.asarray(h @ w1)[:, pos[c], c * Fl:(c + 1) * Fl],
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            y2[c], np.asarray(h @ w2)[:, pos[c], c * Fl:(c + 1) * Fl],
            rtol=1e-5, atol=1e-5)


def test_ring_ag_matmul_odd_chunk(mesh):
    # C = 3 -> halves of 1 and 2 (the 2424/8 = 303 edit shape is odd too)
    from mmada_parallel_tpu.parallel.tp_overlap import sigma_positions

    B, L, D, F = 1, 24, 8, 8
    h = jax.random.normal(jax.random.key(1), (B, L, D), jnp.float32)
    w = jax.random.normal(jax.random.key(2), (D, F), jnp.float32)

    def f(h_s, w_l):
        r = jax.lax.axis_index("tensor")
        pos = sigma_positions(G, h_s.shape[1], r)
        (y,) = ring_ag_matmul(h_s, [w_l], G)
        return y[None], pos[None]

    y, pos = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(None, "tensor", None), P(None, "tensor")),
        out_specs=(P("tensor"), P("tensor")), check_vma=False))(h, w)
    y, pos = np.asarray(y), np.asarray(pos)
    Fl = F // G
    for c in range(G):
        np.testing.assert_allclose(
            y[c], np.asarray(h @ w)[:, pos[c], c * Fl:(c + 1) * Fl],
            rtol=1e-5, atol=1e-5)


def test_ring_matmul_rs_matches_dense(mesh):
    """σ-ordered input (built by gathering with sigma_positions) reduces
    to the natural-order global product, chunk per chip."""
    from mmada_parallel_tpu.parallel.tp_overlap import sigma_positions

    k1, k2 = jax.random.split(jax.random.key(3))
    B, L, K, F = 2, 48, 32, 16          # K sharded over chips: 4 rows each
    a = jax.random.normal(k1, (B, L, K), jnp.float32)
    w = jax.random.normal(k2, (K, F), jnp.float32)

    def f(a_l, w_l):
        r = jax.lax.axis_index("tensor")
        pos = sigma_positions(G, a_l.shape[1] // G, r)
        return ring_matmul_rs(a_l[:, pos, :], w_l, G)

    y = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(None, None, "tensor"), P("tensor", None)),
        out_specs=P(None, "tensor", None), check_vma=False))(a, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(a @ w),
                               rtol=1e-4, atol=1e-4)


def _tp_cfg(**over):
    base = dict(n_heads=8, n_kv_heads=8, d_model=64, mlp_hidden_size=128,
                n_layers=2, block_type="llama", vocab_size=512)
    base.update(over)
    return LLaDAConfig.tiny(**base)


@pytest.mark.parametrize("bias", [False, True])
def test_forward_parity_vs_gspmd(mesh, bias):
    cfg = _tp_cfg(include_qkv_bias=bias)
    params = init_llada_params(jax.random.key(0), cfg)
    sharded = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, param_shardings(cfg))
    ids = jax.random.randint(jax.random.key(1), (2, 40), 0, cfg.vocab_size)

    ref = jax.jit(lambda p, i: llada_forward(p, cfg, i))(sharded, ids)
    out = jax.jit(lambda p, i: llada_forward_tp_overlap(
        p, cfg, i, mesh))(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_forward_vocab_slice(mesh):
    cfg = _tp_cfg()
    params = init_llada_params(jax.random.key(2), cfg)
    sharded = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, param_shardings(cfg))
    ids = jax.random.randint(jax.random.key(3), (1, 16), 0, cfg.vocab_size)
    from mmada_parallel_tpu.models import llada_head, llada_hidden
    ref = jax.jit(lambda p, i: llada_head(
        p, cfg, llada_hidden(p, cfg, i), vocab_slice=(128, 64)))(sharded,
                                                                 ids)
    out = jax.jit(lambda p, i: llada_forward_tp_overlap(
        p, cfg, i, mesh, vocab_slice=(128, 64)))(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_rejects_unsupported_shapes(mesh):
    cfg = _tp_cfg(n_heads=4, n_kv_heads=4)   # 4 heads over g=8
    params = init_llada_params(jax.random.key(0), cfg)
    ids = jnp.zeros((1, 16), jnp.int32)
    with pytest.raises(ValueError, match="n_heads"):
        llada_forward_tp_overlap(params, cfg, ids, mesh)
    cfg = _tp_cfg()
    params = init_llada_params(jax.random.key(0), cfg)
    with pytest.raises(ValueError, match="not divisible"):
        llada_forward_tp_overlap(params, cfg,
                                 jnp.zeros((1, 17), jnp.int32), mesh)
    # GQA is supported only when the kv heads split evenly over the ring
    with pytest.raises(ValueError, match="n_kv_heads"):
        llada_forward_tp_overlap(
            params, _tp_cfg(n_kv_heads=4), ids, mesh)   # 4 kv over g=8
    # tensor=1 passes every shape check but the ring protocols have no
    # single-chip form (accumulation starts one hop out) — must be a
    # clear error, not a trace-time shape mismatch
    mesh1 = make_mesh(MeshConfig(data=1, fsdp=1, tensor=1),
                      jax.devices()[:1])
    with pytest.raises(ValueError, match="tensor >= 2"):
        llada_forward_tp_overlap(params, _tp_cfg(), ids, mesh1)


@pytest.mark.heavy
@pytest.mark.parametrize("kv", [8, 4])
def test_ring_backbone_gradients_match_gspmd(mesh, kv):
    """The ring decomposition is differentiable: parameter gradients
    through ``llada_hidden_tp_overlap`` match the GSPMD backbone's
    (``ppermute`` transposes to the inverse permutation, the σ-order
    gathers are linear, and the per-chunk GEMMs accumulate the same
    cotangents) — the algebraic prerequisite for running TRAINING over
    the ring backbone, not just sampling.  ``kv=4`` pins the GQA shape
    (8 q / 4 kv over g=4: backward through the local-group ``jnp.repeat``
    + ring collectives), which ``train_a --tp_ring --tiny_model``
    defaults to."""
    from mmada_parallel_tpu.models import llada_hidden
    from mmada_parallel_tpu.parallel import shard_params
    from mmada_parallel_tpu.parallel.tp_overlap import (
        llada_hidden_tp_overlap)

    if kv != 8:   # GQA: kv heads must divide the ring -> 4-wide rings
        mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    cfg = _tp_cfg(n_kv_heads=kv)
    params = init_llada_params(jax.random.key(5), cfg)
    sharded = shard_params(params, param_shardings(cfg), mesh)
    # B=2: divisible by the GQA case's data=2 mesh axis
    ids = jax.random.randint(jax.random.key(6), (2, 16), 0, cfg.vocab_size)

    def loss_ref(p):
        h = llada_hidden(p, cfg, ids)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    def loss_ring(p):
        h = llada_hidden_tp_overlap(p, cfg, ids, mesh)
        return jnp.sum(h.astype(jnp.float32) ** 2)

    g_ref = jax.jit(jax.grad(loss_ref))(params)
    g_ring = jax.jit(jax.grad(loss_ring))(sharded)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_ring = jax.tree_util.tree_leaves(g_ring)
    assert len(flat_ref) == len(flat_ring)
    for (path, a), b in zip(flat_ref, flat_ring):
        scale = max(float(jnp.max(jnp.abs(a))), 1.0)
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            rtol=5e-4, atol=5e-4 * scale,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}")


@pytest.mark.heavy
@pytest.mark.parametrize("kv", [8, 4])
def test_ring_train_step_matches_gspmd(mesh, kv):
    """Full training integration over the ring backbone: a jitted
    ``make_train_step`` (AdamW + clip + 2-step grad accumulation, pinned
    ``out_shardings``) built on ``llada_forward_tp_overlap`` produces the
    same losses and updated parameters as the GSPMD step — what
    ``cli/train_a.py --tp_ring`` runs.  Two steps, so the second
    consumes ring-updated optimizer state.  ``kv=4`` pins the GQA
    training shape the CLI's ``--tiny_model`` defaults to."""
    from jax.sharding import NamedSharding
    from mmada_parallel_tpu.training.losses import a_variant_losses
    from mmada_parallel_tpu.training.trainer import (
        OptimizerConfig, create_sharded_state, make_optimizer,
        make_train_step, state_shardings)
    from mmada_parallel_tpu.parallel import batch_sharding

    if kv != 8:   # GQA: kv heads must divide the ring -> 4-wide rings
        mesh = make_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    cfg = _tp_cfg(n_kv_heads=kv)
    params = init_llada_params(jax.random.key(7), cfg)
    opt = make_optimizer(OptimizerConfig(lr=1e-3), params)

    def make_loss(forward):
        def loss_fn(p, batch, key):
            ids, labels, lengths = batch
            out = a_variant_losses(forward(p, ids), ids, labels, lengths)
            return out["loss"], {"text_loss": out["text_loss"]}
        return loss_fn

    B, L = 4, 16                       # accum 2 -> microbatches of 2
    ids = jax.random.randint(jax.random.key(8), (B, L), 0, cfg.vocab_size)
    labels = jnp.where(jax.random.bernoulli(jax.random.key(9), 0.5, (B, L)),
                       ids, -100)
    lengths = jnp.full((B,), L, jnp.int32)
    bsh = batch_sharding(mesh)
    batch = tuple(jax.device_put(a, bsh) for a in (ids, labels, lengths))
    key = jax.random.key(10)

    results = {}
    for name, forward in (
            ("gspmd", lambda p, i: llada_forward(p, cfg, i)),
            ("ring", lambda p, i: llada_forward_tp_overlap(p, cfg, i,
                                                           mesh))):
        # fresh buffers per branch: the jitted step donates the state, and
        # create_sharded_state may alias already-placed leaves
        state, p_specs, o_specs = create_sharded_state(
            jax.tree_util.tree_map(jnp.array, params), opt,
            param_shardings(cfg), mesh, "full")
        out_sh = (state_shardings(state.params, state.opt_state, p_specs,
                                  o_specs, mesh),
                  NamedSharding(mesh, P()))
        step = jax.jit(make_train_step(make_loss(forward), opt,
                                       accum_steps=2),
                       donate_argnums=0, out_shardings=out_sh)
        losses = []
        for _ in range(2):
            state, metrics = step(state, batch, key)
            losses.append(float(metrics["loss"]))
        results[name] = (losses, jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float32), state.params))

    np.testing.assert_allclose(results["ring"][0], results["gspmd"][0],
                               rtol=1e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(results["gspmd"][1])
    flat_ring = jax.tree_util.tree_leaves(results["ring"][1])
    for (path, a), b in zip(flat_ref, flat_ring):
        np.testing.assert_allclose(
            b, a, rtol=5e-4, atol=5e-4 * max(float(np.max(np.abs(a))), 1.0),
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}")


def test_ring_order_devices_cycle_and_fallbacks():
    """ring_order_devices finds the boundary Hamiltonian cycle on a 2x4
    coord grid (every consecutive pair one hop apart, wrap included),
    passes coord-less devices through unchanged, and reports a 4-chip
    ROW (a line — no cycle) as not-a-ring."""
    from types import SimpleNamespace

    from mmada_parallel_tpu.parallel.tp_overlap import ring_order_devices

    grid = [SimpleNamespace(coords=(x, y, 0), name=f"d{x}{y}")
            for x in (0, 1) for y in range(4)]
    ordered, physical = ring_order_devices(grid)
    assert physical and len(ordered) == 8
    assert {d.name for d in ordered} == {d.name for d in grid}
    cs = [d.coords for d in ordered]
    for i in range(8):
        a, b = cs[i], cs[(i + 1) % 8]
        assert sum(abs(u - v) for u, v in zip(a, b)) == 1

    row = [SimpleNamespace(coords=(0, y, 0)) for y in range(4)]
    same, physical = ring_order_devices(row)
    assert not physical and same == row

    bare = [SimpleNamespace() for _ in range(4)]
    same, physical = ring_order_devices(bare)
    assert not physical and same == bare


def test_ring_wire_volume_equals_all_reduce(mesh):
    """The decomposition must change SCHEDULING, not wire volume: per-layer
    ring ppermute bytes == the GSPMD path's two all-reduces (2 * 2*S*(g-1)/g
    per layer).  Census'd from the compiled CPU modules."""
    from mmada_parallel_tpu.parallel import multichip_model as MM

    cfg = _tp_cfg()
    params = init_llada_params(jax.random.key(0), cfg)
    sharded = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh, s)),
        params, param_shardings(cfg))
    ids = jnp.zeros((2, 64), jnp.int32)

    wires = {}
    counts = {}
    for name, fn in (
            ("gspmd", lambda p, i: llada_forward(p, cfg, i)),
            ("ring", lambda p, i: llada_forward_tp_overlap(p, cfg, i,
                                                           mesh))):
        txt = jax.jit(fn).lower(sharded, ids).compile().as_text()
        cols = MM.parse_collectives(txt)
        s = MM.comm_summary(cols, per_layer_trip=cfg.n_layers, n_devices=G)
        wires[name] = s["per_layer_wire_bytes"]
        counts[name] = {c.kind for c in cols if not c.in_entry}
    # 4 boundaries x 2 directions x (g-1) rounds of ppermute replace the
    # 2 per-layer all-reduces at identical per-chip bytes
    assert counts["gspmd"] == {"all-reduce"}
    assert counts["ring"] == {"collective-permute"}
    assert wires["ring"] == wires["gspmd"]


def test_ring_8b_dims_partitioner_and_volume(mesh):
    """The ring graph partitions at REAL 8B dims (d_model 4096, vocab
    134,656, mlp 12,288) on the 8-device mesh, emitting only
    collective-permutes in the layer body; wire volume equals the GSPMD
    all-reduces' at bf16 width (the CPU backend legalizes the bf16 cp
    payloads to f32 — exactly 2x bytes — while TPUs ship bf16 natively,
    so the CPU-module comparison is ring == 2 * all-reduce-at-bf16)."""
    from mmada_parallel_tpu.parallel import multichip_model as MM

    wires = {}
    kinds = {}
    for tp in (False, True):
        compiled, _ = MM.compile_edit_forward_8b(mesh, n_layers=2, batch=2,
                                                 tp_overlap=tp)
        cols = MM.parse_collectives(compiled.as_text())
        s = MM.comm_summary(cols, per_layer_trip=32, n_devices=G)
        wires[tp] = s["per_layer_wire_bytes"]
        kinds[tp] = {c.kind for c in cols if not c.in_entry}
    assert kinds[False] == {"all-reduce"}
    assert kinds[True] == {"collective-permute"}
    # 4 boundaries x (g-1)/g x [2,2424,4096] bf16 = 139 MB/layer
    S = 2 * 2424 * 4096 * 2
    assert wires[False] == pytest.approx(4 * S * 7 / 8, rel=0.02)
    assert wires[True] == pytest.approx(2 * wires[False], rel=0.02)


@pytest.mark.heavy
def test_generate_ti2ti_over_ring_tp_matches_solo(mesh):
    """End-to-end: the full fused TI2TI trajectory with the ring-TP
    backbone (``hidden_fn=ring_hidden_fn(mesh)``) reproduces the
    unsharded run token-for-token at temperature 0 — the multi-chip
    serving configuration (exact-length batches, no padding)."""
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.parallel import shard_params
    from mmada_parallel_tpu.parallel.tp_overlap import ring_hidden_fn
    from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                            generate_ti2ti)

    TVS, CB, MASK = 256, 32, 250
    cfg = _tp_cfg(vocab_size=TVS + CB, mask_token_id=MASK)
    params = init_llada_params(jax.random.key(4), cfg)
    sharded = shard_params(params, param_shardings(cfg), mesh)

    gh, gw = 2, 3
    opts = TI2TIOptions(text_steps=4, timesteps=2, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=4.0,
                        text_vocab_size=TVS, codebook_size=CB,
                        mask_token=MASK)
    prompt = [5, 6, 7]
    ids, lay = tk.assemble_ti2ti_sequence(prompt, 8, gh, gw, [9],
                                          tokens=_TOK())
    while lay.total_len % G:
        prompt.append(11)
        ids, lay = tk.assemble_ti2ti_sequence(prompt, 8, gh, gw, [9],
                                              tokens=_TOK())
    ids = jnp.asarray(ids, jnp.int32)[None]
    un_img = np.asarray(prompt, np.int32)

    ref_ids, ref_codes = jax.jit(lambda p, i: generate_ti2ti(
        p, cfg, i, lay, opts, uncond_image_prefix=un_img))(params, ids)
    ring_ids, ring_codes = jax.jit(lambda p, i: generate_ti2ti(
        p, cfg, i, lay, opts, uncond_image_prefix=un_img,
        hidden_fn=ring_hidden_fn(mesh)))(sharded, ids)
    np.testing.assert_array_equal(np.asarray(ref_ids),
                                  np.asarray(ring_ids))
    np.testing.assert_array_equal(np.asarray(ref_codes),
                                  np.asarray(ring_codes))


def _TOK():
    from mmada_parallel_tpu import tokens as tk
    return tk.VariantATokens(mask=250, newline=251, answer_start=252,
                             answer_end=253, boi=254, eoi=255,
                             uncondition=249, pad=248,
                             text_vocab_size=256, codebook_size=32)


@pytest.mark.heavy
def test_interleave_generate_over_ring_tp_matches_solo(mesh):
    """M-variant end-to-end over the ring backbone (cond+uncond batch-2
    forwards, the M production shape) == the solo run at temperature 0.
    Layout chosen with total_len % 8 == 0 (the ring's only extra
    constraint; the reference-default M length 2341 is NOT divisible, so
    the A edit stays the ring headline — see PARITY notes)."""
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.parallel import shard_params
    from mmada_parallel_tpu.parallel.tp_overlap import ring_hidden_fn
    from mmada_parallel_tpu.samplers.interleave import (InterleaveOptions,
                                                        interleave_generate)

    TVS, CB, MASK = 256, 32, 250
    TOK_M = tk.VariantMTokens(soi=251, eoi=250, bos=249, text_vocab_size=TVS,
                              codebook_size=CB)
    cfg = _tp_cfg(vocab_size=TVS + CB, mask_token_id=MASK)
    params = init_llada_params(jax.random.key(5), cfg)
    sharded = shard_params(params, param_shardings(cfg), mesh)

    prompt = [10, 11, 12, 13, 14]
    ids, lay = tk.assemble_interleave_sequence(prompt, num_vq_tokens=8,
                                               max_seq_length=9,
                                               tokens=TOK_M)
    un_ids, _ = tk.assemble_interleave_sequence([30, 31, 32, 33, 34],
                                                num_vq_tokens=8,
                                                max_seq_length=9,
                                                tokens=TOK_M)
    assert lay.total_len % G == 0
    opts = InterleaveOptions(text_steps=6, image_steps=3, text_cfg=1.5,
                             image_cfg=2.0, text_temperature=0.0,
                             image_temperature=0.0, text_vocab_size=TVS,
                             codebook_size=CB, mask_token=MASK)
    i2 = jnp.asarray(ids)[None]
    u2 = jnp.asarray(un_ids)[None]
    ref_ids, ref_codes = jax.jit(lambda p: interleave_generate(
        p, cfg, i2, u2, lay, opts, key=None))(params)
    r_ids, r_codes = jax.jit(lambda p: interleave_generate(
        p, cfg, i2, u2, lay, opts, key=None,
        hidden_fn=ring_hidden_fn(mesh)))(sharded)
    np.testing.assert_array_equal(np.asarray(ref_ids), np.asarray(r_ids))
    np.testing.assert_array_equal(np.asarray(ref_codes),
                                  np.asarray(r_codes))


@pytest.mark.heavy
def test_ti2ti_server_over_ring_tp(mesh):
    """TI2TIServer with hidden_fn=ring_hidden_fn(mesh): exact-length
    grouping (the maskless-backbone contract), results equal the direct
    solo sampler run."""
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.parallel import shard_params
    from mmada_parallel_tpu.parallel.tp_overlap import ring_hidden_fn
    from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                            generate_ti2ti)
    from mmada_parallel_tpu.serving import ServeConfig, TI2TIServer

    TVS, CB, MASK = 256, 32, 250
    tok = _TOK()
    cfg = _tp_cfg(vocab_size=TVS + CB, mask_token_id=MASK)
    params = init_llada_params(jax.random.key(6), cfg)
    sharded = shard_params(params, param_shardings(cfg), mesh)
    gh, gw = 2, 3
    opts = TI2TIOptions(text_steps=4, timesteps=2, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=4.0,
                        text_vocab_size=TVS, codebook_size=CB,
                        mask_token=MASK)
    # prompt length chosen so layout.total_len % 8 == 0
    prompt = [5, 6, 7]
    ids, lay = tk.assemble_ti2ti_sequence(prompt, 8, gh, gw, [9], tokens=tok)
    while lay.total_len % G:
        prompt.append(11)
        ids, lay = tk.assemble_ti2ti_sequence(prompt, 8, gh, gw, [9],
                                              tokens=tok)

    srv = TI2TIServer(sharded, cfg, opts,
                      ServeConfig(batch_size=2, max_wait_ms=50.0,
                                  grid_hw=(gh, gw), text_gen_length=8,
                                  end_token_ids=(9,)),
                      tokens=tok, hidden_fn=ring_hidden_fn(mesh))
    try:
        assert srv._bucket_of(prompt) == len(prompt)   # exact, no rounding
        out = srv.submit(prompt)
    finally:
        srv.close()
    ref_ids, ref_codes = jax.jit(lambda p, i: generate_ti2ti(
        p, cfg, i, lay, opts))(params, jnp.asarray(ids)[None])
    np.testing.assert_array_equal(
        out["codes"], np.asarray(ref_codes)[0])
    np.testing.assert_array_equal(
        out["text_ids"],
        np.asarray(ref_ids)[0, lay.text_start:lay.text_end])


def test_ring_ag_matmul_int8_payload_close(mesh):
    """Opt-in int8 payload: per-token symmetric quantization once at the
    source -> output within W8A8-activation-grade tolerance of dense."""
    from mmada_parallel_tpu.parallel.tp_overlap import sigma_positions

    B, L, D, F = 2, 48, 16, 24
    h = jax.random.normal(jax.random.key(7), (B, L, D), jnp.float32)
    w = jax.random.normal(jax.random.key(8), (D, F), jnp.float32)

    def f(h_s, w_l):
        r = jax.lax.axis_index("tensor")
        pos = sigma_positions(G, h_s.shape[1], r)
        (y,) = ring_ag_matmul(h_s, [w_l], G, int8_payload=True)
        return y[None], pos[None]

    y, pos = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(P(None, "tensor", None), P(None, "tensor")),
        out_specs=(P("tensor"), P("tensor")), check_vma=False))(h, w)
    y, pos = np.asarray(y), np.asarray(pos)
    Fl = F // G
    ref = np.asarray(h @ w)
    for c in range(G):
        want = ref[:, pos[c], c * Fl:(c + 1) * Fl]
        err = np.abs(y[c] - want).max() / (np.abs(want).max() + 1e-9)
        assert err < 0.03, err
        # every chip must see the SAME dequantized inputs (round-0 local
        # GEMM included), so all chips' answers for a row agree exactly
    cos = (y.reshape(-1) @ np.concatenate(
        [ref[:, pos[c], c * Fl:(c + 1) * Fl].reshape(-1)
         for c in range(G)])) / (
        np.linalg.norm(y) * np.linalg.norm(np.concatenate(
            [ref[:, pos[c], c * Fl:(c + 1) * Fl].reshape(-1)
             for c in range(G)])) + 1e-9)
    assert cos > 0.999


def test_forward_int8_payload_fidelity(mesh):
    """Full forward with int8 ring payloads: logits stay close to the
    exact ring forward (cosine > 0.999, argmax agreement high)."""
    from mmada_parallel_tpu.parallel import shard_params

    cfg = _tp_cfg()
    params = init_llada_params(jax.random.key(9), cfg)
    sharded = shard_params(params, param_shardings(cfg), mesh)
    ids = jax.random.randint(jax.random.key(10), (2, 40), 0,
                             cfg.vocab_size)
    exact = np.asarray(jax.jit(lambda p, i: llada_forward_tp_overlap(
        p, cfg, i, mesh))(sharded, ids))
    q8 = np.asarray(jax.jit(lambda p, i: llada_forward_tp_overlap(
        p, cfg, i, mesh, int8_payload=True))(sharded, ids))
    cos = (exact.reshape(-1) @ q8.reshape(-1)) / (
        np.linalg.norm(exact) * np.linalg.norm(q8))
    assert cos > 0.999, cos
    agree = (exact.argmax(-1) == q8.argmax(-1)).mean()
    assert agree > 0.9, agree


@pytest.mark.heavy
def test_generate_ti2ti_int8_payload_trajectory(mesh):
    """Trajectory-level agreement of the int8-payload ring vs the exact
    ring on a RANDOM toy (worst case, same protocol as the other opt-in
    approximations): must stay well above chance."""
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.parallel import shard_params
    from mmada_parallel_tpu.parallel.tp_overlap import ring_hidden_fn
    from mmada_parallel_tpu.samplers.parallel_ti2ti import (TI2TIOptions,
                                                            generate_ti2ti)

    TVS, CB, MASK = 256, 32, 250
    cfg = _tp_cfg(vocab_size=TVS + CB, mask_token_id=MASK)
    params = init_llada_params(jax.random.key(11), cfg)
    sharded = shard_params(params, param_shardings(cfg), mesh)
    gh, gw = 2, 3
    opts = TI2TIOptions(text_steps=8, timesteps=4, temperature=0.0,
                        text_temperature=0.0, cfg_scale=0.0, cfg_img=4.0,
                        text_vocab_size=TVS, codebook_size=CB,
                        mask_token=MASK)
    prompt = [5, 6, 7]
    ids, lay = tk.assemble_ti2ti_sequence(prompt, 8, gh, gw, [9],
                                          tokens=_TOK())
    while lay.total_len % G:
        prompt.append(11)
        ids, lay = tk.assemble_ti2ti_sequence(prompt, 8, gh, gw, [9],
                                              tokens=_TOK())
    ids = jnp.asarray(ids, jnp.int32)[None]
    un_img = np.asarray(prompt, np.int32)

    ref_ids, ref_codes = jax.jit(lambda p, i: generate_ti2ti(
        p, cfg, i, lay, opts, uncond_image_prefix=un_img,
        hidden_fn=ring_hidden_fn(mesh)))(sharded, ids)
    q_ids, q_codes = jax.jit(lambda p, i: generate_ti2ti(
        p, cfg, i, lay, opts, uncond_image_prefix=un_img,
        hidden_fn=ring_hidden_fn(mesh, int8_payload=True)))(sharded, ids)
    text_agree = (np.asarray(ref_ids)[0, lay.text_start:lay.text_end]
                  == np.asarray(q_ids)[0, lay.text_start:lay.text_end]
                  ).mean()
    code_agree = (np.asarray(ref_codes) == np.asarray(q_codes)).mean()
    # random-toy worst case; W8A8's analogous trajectory agreement is
    # ~0.5 — payload-only quantization is strictly gentler
    assert text_agree > 0.5, text_agree
    assert code_agree > 0.3, code_agree


def test_forward_parity_gqa(mesh):
    """GQA splits over the ring when ``n_kv_heads % g == 0``: each chip's
    local query heads group onto its local kv heads with the global
    ``rep = n_heads / n_kv_heads`` ratio (contiguous head shards keep the
    packed-layout grouping rank-local), so the per-chunk attention needs
    no extra collective.  8 q / 4 kv heads over g=4 -> 2 q / 1 kv local."""
    mesh4 = make_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    cfg = _tp_cfg(n_kv_heads=4)
    params = init_llada_params(jax.random.key(20), cfg)
    sharded = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh4, s)),
        params, param_shardings(cfg))
    ids = jax.random.randint(jax.random.key(21), (2, 40), 0,
                             cfg.vocab_size)
    ref = jax.jit(lambda p, i: llada_forward(p, cfg, i))(sharded, ids)
    out = jax.jit(lambda p, i: llada_forward_tp_overlap(
        p, cfg, i, mesh4))(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_forward_parity_data2_tensor4(mesh):
    """The ring also runs under a (data=2, fsdp=1, tensor=4) mesh — the
    2x2-square placement the census prices for batch-2-heavy workloads
    (M interleave; A image steps): batch splits over data, 4-wide rings
    within each square."""
    mesh24 = make_mesh(MeshConfig(data=2, fsdp=1, tensor=4))
    cfg = _tp_cfg()                      # 8 heads over g=4 -> 2 local
    params = init_llada_params(jax.random.key(12), cfg)
    sharded = jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, NamedSharding(mesh24, s)),
        params, param_shardings(cfg))
    ids = jax.random.randint(jax.random.key(13), (2, 40), 0,
                             cfg.vocab_size)
    ref = jax.jit(lambda p, i: llada_forward(p, cfg, i))(sharded, ids)
    out = jax.jit(lambda p, i: llada_forward_tp_overlap(
        p, cfg, i, mesh24))(sharded, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
