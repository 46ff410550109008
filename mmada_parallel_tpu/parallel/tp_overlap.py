"""Overlap-friendly manual tensor parallelism: ring collective-matmuls.

The v5e-8 census (:mod:`mmada_parallel_tpu.parallel.multichip_model`)
prices the GSPMD-sharded 8B edit at ~5.3 s/edit of ICI all-reduce time
(link-capacity-true pricing) that the compiled schedule does NOT
overlap with compute: the TPU backend emits plain ``all-reduce`` ops
(zero ``-start``/``-done`` async pairs, probed directly including with
async compiler options), so the "no-overlap floor" is the schedule.  A
monolithic all-reduce gives the scheduler nothing to overlap *with* —
every downstream op consumes its result.

This module re-expresses the Megatron TP boundary collectives as ring
algorithms decomposed into ``g`` explicit steps (``jax.lax.ppermute`` +
per-chunk GEMMs, unrolled), so step ``s``'s wire transfer is independent
of step ``s``'s GEMM and the latency-hiding scheduler can run them
concurrently.  Decomposition changes *scheduling freedom*, not wire
volume: per boundary the per-chip bytes equal the all-reduce's
``2*S*(g-1)/g`` split across the sequence-sharded layout's all-gather
and reduce-scatter halves.

Layout (Megatron sequence parallelism, shard_map over the ``tensor``
axis, ``g`` chips):

* activations between blocks are SEQUENCE-sharded ``[B, L/g, D]`` —
  norms and residual adds are per-token, hence local;
* q/k/v and MLP up/gate projections run as ring
  **all-gather-matmuls** (:func:`ring_ag_matmul`): the sequence chunks
  travel the ring while each arriving chunk is GEMMed into its global
  slice of the column-sharded output;
* attention runs fully local on ``H/g`` heads over the full sequence
  (:func:`mmada_parallel_tpu.ops.attention.rope_attention`, packed
  layout — the fused-rope Pallas kernel applies per head slice);
* attn-out and MLP-down projections run as ring
  **matmul-reduce-scatters** (:func:`ring_matmul_rs`): partial-sum
  chunks circulate and accumulate while the next chunk's GEMM runs.

Each chunk is split into two halves that travel the ring in opposite
directions, so both ICI link directions carry traffic every round
(a ring all-reduce's wire efficiency, not a one-directional pipeline's).

The reference counterpart is the NCCL all-reduce inside fairscale's
``RowParallelLinear`` (``MMaDA-Parallel-A/xllm/solvers/finetune.py:54-61``
scaffolding); decomposed-overlap collectives have no reference analogue.

Scope: the ``llama`` block flavor, MHA or GQA with head counts dividing
the ring size (the 8B production shape is 32-head MHA), no padding mask
/ position_ids (the A/M samplers' exact-length batching never pads, see
``serving.py``), mesh ``fsdp == 1``.  The GSPMD path (:func:`~mmada_parallel_tpu.models.llada_forward`
under ``param_shardings``) remains the general/default path.

Validation status: algebra, wire volume, and token-exact end-to-end
sampling are test-pinned on the 8-virtual-device CPU mesh; scheduling/
overlap claims come from the compiled ``v5e:2x4`` modules.  What no test
can see without 8 real chips: the per-chunk attention's kernel dispatch
overhead on hardware (g kernel calls per layer instead of 1; the census
cycle ratios use the XLA einsum attention — ``compile_edit_forward_8b``
pins ``attention_impl="xla"``) and actual ICI contention.  Note on GQA:
the fused packed-q TPU kernel dispatch is gated on ``H == KV``
(``ops/attention.py`` ``rope_attention_qonly``), so GQA ring forwards
fall back to the unpacked q-rope + ``dot_product_attention`` path on
real TPUs — numerically identical, perf-only difference, and invisible
to the census (which pins ``impl="xla"`` either way).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["ring_ag_matmul", "ring_matmul_rs", "sigma_positions",
           "llada_hidden_tp_overlap", "llada_forward_tp_overlap",
           "ring_hidden_fn", "ring_order_devices"]

AXIS = "tensor"


def ring_order_devices(devices: Sequence) -> Tuple[list, bool]:
    """``(ordered_devices, is_physical_ring)`` — reorder live devices so
    consecutive entries (and the wrap) are physical ICI neighbors, making
    the logical ``(i, i+1)`` ppermute ring one-hop like the census meshes
    (:func:`multichip_model._tpu_topology_mesh` ``ring_order``, which
    serves the compile-only topology; this is the live-device sibling).

    Finds a Hamiltonian cycle over the Manhattan-adjacency graph of
    ``device.coords`` by backtracking (N <= 8 in practice).  Devices
    without coords (CPU/virtual meshes) or sets with no cycle (e.g. a
    4-chip ROW is a line) are returned unchanged with ``False`` — the
    numerics never depend on the order, only the hop cost does.
    """
    devices = list(devices)
    coords = [getattr(d, "coords", None) for d in devices]
    if len(devices) < 3 or any(c is None for c in coords):
        return devices, len(devices) == 2 and coords[0] is not None \
            and coords[1] is not None \
            and sum(abs(a - b) for a, b in zip(coords[0], coords[1])) == 1
    n = len(devices)
    adj = [{j for j in range(n) if j != i
            and sum(abs(a - b)
                    for a, b in zip(coords[i], coords[j])) == 1}
           for i in range(n)]
    path = [0]
    used = {0}

    def dfs() -> bool:
        if len(path) == n:
            return path[0] in adj[path[-1]]
        for nxt in sorted(adj[path[-1]]):
            if nxt not in used:
                path.append(nxt)
                used.add(nxt)
                if dfs():
                    return True
                path.pop()
                used.remove(nxt)
        return False

    if dfs():
        return [devices[i] for i in path], True
    return devices, False


def _perms(g: int) -> Tuple[list, list]:
    fwd = [(i, (i + 1) % g) for i in range(g)]
    bwd = [(i, (i - 1) % g) for i in range(g)]
    return fwd, bwd


def sigma_positions(g: int, C: int, r) -> jax.Array:
    """Global sequence positions of the σ-ordered (received-order) rows.

    The ring ops never assemble global order: rows land in the order the
    ring DELIVERS them, which makes every chunk index static relative to
    the rank (no dynamic_update_slice chains, no traced-index slices).
    σ-order for rank ``r``: first the +ring half-chunks ``(r-k) % g`` for
    ``k = 0..g-1`` (rows ``0:C1`` of each chunk), then the -ring
    half-chunks ``(r+k) % g`` (rows ``C1:C``).  Transformer blocks are
    permutation-equivariant once RoPE tables are gathered with the same
    σ (attention is order-free over keys; everything else is per-token),
    so the whole layer stack runs in σ-order.
    """
    C1 = C // 2
    ks = jnp.arange(g)
    a = (((r - ks) % g) * C)[:, None] + jnp.arange(C1)[None, :]
    b = (((r + ks) % g) * C)[:, None] + (C1 + jnp.arange(C - C1))[None, :]
    return jnp.concatenate([a.reshape(-1), b.reshape(-1)])


def _quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-token symmetric int8: ``x ≈ q * scale``, scale ``[B, rows, 1]``
    f32 (absmax / 127).  ONE quantization at the source chip — the int8
    payload travels the whole ring unchanged, so the error does not
    compound with hops."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _dequantize_rows(q: jax.Array, scale: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(dtype)


def ring_ag_matmul(h: jax.Array, weights: Sequence[jax.Array], g: int,
                   axis: str = AXIS,
                   int8_payload: bool = False,
                   permute=None) -> List[jax.Array]:
    """All-gather-matmul: local sequence chunk ``h [B, C, Din]`` against
    column-sharded ``W [Din, F_local]`` weights -> ``[B, g*C, F_local]``
    outputs in σ-ORDER (:func:`sigma_positions`).

    Ring decomposition (unrolled, ``g`` static): the chunk is split into
    two sequence halves travelling the ring in opposite directions; at
    round ``s`` the +ring holds chunk ``(r-s) % g``'s first half and the
    -ring chunk ``(r+s) % g``'s second half, each GEMMed the moment it
    arrives while the next round's ``ppermute`` is in flight.  Outputs
    are stacked in arrival order — static concatenation, no scatter.
    Per-chip wire bytes: ``(g-1)/g * |h_global|`` = the all-gather's.

    ``int8_payload=True`` (OPT-IN approximation): the travelling halves
    are per-token symmetric int8 (+f32 row scales) — quantized ONCE at
    the source, dequantized at each consumer, the int8 forwarded
    unchanged — halving the AG wire bytes at W8A8-activation-grade
    noise.  The local (round 0) GEMM uses the dequantized values too, so
    every chip computes from identical inputs and temperature-0
    trajectories stay batch-invariant.

    ``permute`` overrides ``jax.lax.ppermute`` — the single-chip
    chunk-overhead proxy (:mod:`.chunk_proxy`) passes identity so the
    exact per-chunk schedule runs on one device.
    """
    permute = permute or jax.lax.ppermute
    half = h.shape[1] // 2
    ha, hb = h[:, :half], h[:, half:]
    perm_f, perm_b = _perms(g)
    ws = [w.astype(h.dtype) for w in weights]
    outs_a = [[] for _ in ws]
    outs_b = [[] for _ in ws]
    if int8_payload:
        qa, sa = _quantize_rows(ha)
        qb, sb = _quantize_rows(hb)
        for s in range(g):
            da = _dequantize_rows(qa, sa, h.dtype)
            db = _dequantize_rows(qb, sb, h.dtype)
            for i, w in enumerate(ws):
                outs_a[i].append(da @ w)
                outs_b[i].append(db @ w)
            if s < g - 1:
                qa = permute(qa, axis, perm_f)
                sa = permute(sa, axis, perm_f)
                qb = permute(qb, axis, perm_b)
                sb = permute(sb, axis, perm_b)
    else:
        for s in range(g):
            for i, w in enumerate(ws):
                outs_a[i].append(ha @ w)
                outs_b[i].append(hb @ w)
            if s < g - 1:
                ha = permute(ha, axis, perm_f)
                hb = permute(hb, axis, perm_b)
    return [jnp.concatenate(a + b, axis=1)
            for a, b in zip(outs_a, outs_b)]


def _ring_reduce_scatter(part_a, part_b, g: int,
                         axis: str = AXIS, permute=None) -> jax.Array:
    """The σ-order reduce-scatter ring protocol, shared by
    :func:`ring_matmul_rs` and the per-chunk-attention attn-out path:
    ``part_a(k)``/``part_b(k)`` produce this chip's partial for the
    σ-indexed chunk ``k`` (+ring first halves / -ring second halves);
    the accumulators hop ``g-1`` times, each round adding the STATIC
    σ-index ``(1+s) % g`` partial, landing chunk ``r`` in natural row
    order."""
    permute = permute or jax.lax.ppermute
    perm_f, perm_b = _perms(g)
    acc_a = part_a(1)
    acc_b = part_b(1)
    for s in range(1, g):
        acc_a = permute(acc_a, axis, perm_f) + part_a((1 + s) % g)
        acc_b = permute(acc_b, axis, perm_b) + part_b((1 + s) % g)
    return jnp.concatenate([acc_a, acc_b], axis=1)


def ring_matmul_rs(a: jax.Array, w: jax.Array, g: int,
                   axis: str = AXIS, permute=None) -> jax.Array:
    """Matmul-reduce-scatter: σ-ORDERED row-sharded GEMM input
    ``a [B, L, K_local]`` (the layout :func:`ring_ag_matmul` produces)
    against ``w [K_local, F]`` -> the fully-reduced LOCAL sequence chunk
    ``[B, L/g, F]`` (chunk ``r`` of the global result, natural row
    order).

    Ring decomposition: the accumulator for chunk ``j`` is created at
    chip ``j+1`` and hops the +ring adding each chip's partial, landing
    fully-reduced at chip ``j`` after ``g-1`` hops (mirrored -ring for
    the second sequence half).  In σ-order coordinates the chunk the
    round needs sits at STATIC index ``(1+s) % g``, so every slice is
    static and each round's partial GEMM is independent of the in-flight
    ``ppermute``.  Per-chip wire bytes: ``(g-1)/g * |result_global|`` =
    the reduce-scatter's.
    """
    B, L, K = a.shape
    if L % g:
        raise ValueError(f"sequence {L} not divisible by ring size {g}")
    C = L // g
    C1 = C // 2
    C2 = C - C1
    w = w.astype(a.dtype)

    def part_a(k):   # +ring: σ-index k holds chunk (r - k) % g, rows 0:C1
        return a[:, k * C1:(k + 1) * C1, :] @ w

    def part_b(k):   # -ring: chunk (r + k) % g, rows C1:C
        off = g * C1
        return a[:, off + k * C2: off + (k + 1) * C2, :] @ w

    return _ring_reduce_scatter(part_a, part_b, g, axis, permute)


# ---------------------------------------------------------------------------
# LLaDA block / forward on the ring collectives
# ---------------------------------------------------------------------------


def _block_tp(x: jax.Array, lp: Dict[str, jax.Array], cfg,
              sin_s: jax.Array, cos_s: jax.Array, g: int,
              int8_payload: bool = False, permute=None) -> jax.Array:
    """One llama-flavor block on a local ``[B, C, D]`` sequence chunk with
    tensor-sharded weights (``models.param_shardings`` layout, local
    shards).  Mirrors :func:`mmada_parallel_tpu.models.llada._block`;
    q/k/v and the attention run in σ-order with σ-gathered RoPE tables
    (``sin_s``/``cos_s``), the residual stream stays in natural chunk
    order (:func:`ring_matmul_rs` lands chunk ``r`` naturally).

    Attention is computed PER σ-CHUNK of queries against the once-rotated
    full K (``rope_attention_qonly``), in exactly the order the attn-out
    reduce-scatter consumes chunks — so each attention piece and its
    ``@ attn_out`` partial slot between that ring round's ppermute
    start/done, extending the overlap window coverage to the attention
    FLOPs (a monolithic attention call would serialize between the AG
    and the RS with no permute in flight)."""
    from mmada_parallel_tpu.models.llada import _norm, _rope_packed
    from mmada_parallel_tpu.ops.attention import rope_attention_qonly

    cdt = x.dtype
    nh_l = cfg.n_heads // g
    nkv_l = cfg.effective_n_kv_heads // g
    B, C, _ = x.shape
    C1 = C // 2
    C2 = C - C1

    h = _norm(x, lp["attn_norm"], cfg)
    q, k, v = ring_ag_matmul(h, [lp["q_proj"], lp["k_proj"], lp["v_proj"]],
                             g, int8_payload=int8_payload, permute=permute)
    if "q_bias" in lp:
        q = q + lp["q_bias"].astype(cdt)
        k = k + lp["k_bias"].astype(cdt)
        v = v + lp["v_bias"].astype(cdt)
    k = _rope_packed(k, sin_s, cos_s, nkv_l, cfg.rope_full_precision)

    def att_piece(lo, size):
        # bare=True: inside shard_map partitioning is manual, so the
        # custom_partitioning wrapper is dead weight — and skipping it is
        # what lets the AOT topology census compile this block with the
        # real Mosaic kernel (attention_impl="pallas")
        return rope_attention_qonly(
            jax.lax.slice_in_dim(q, lo, lo + size, axis=1), k, v,
            jax.lax.slice_in_dim(sin_s, lo, lo + size, axis=0),
            jax.lax.slice_in_dim(cos_s, lo, lo + size, axis=0),
            bias=None, n_heads=nh_l, n_kv_heads=nkv_l,
            full_precision=cfg.rope_full_precision,
            impl=cfg.attention_impl, bare=True)

    wo = lp["attn_out"].astype(cdt)

    def part_a(k):          # attention for σ-chunk k's queries, projected
        return att_piece(k * C1, C1) @ wo

    def part_b(k):
        return att_piece(g * C1 + k * C2, C2) @ wo

    x = x + _ring_reduce_scatter(part_a, part_b, g, permute=permute)

    h = _norm(x, lp["ff_norm"], cfg)
    gate_in, up = ring_ag_matmul(h, [lp["ff_proj"], lp["up_proj"]], g,
                                 int8_payload=int8_payload, permute=permute)
    x = x + ring_matmul_rs(jax.nn.silu(gate_in) * up, lp["ff_out"], g,
                           permute=permute)
    return x


def _stack_tp(x, blocks, sin, cos, cfg, g, axis=AXIS,
              int8_payload=False, permute=None):
    # σ-gather the RoPE tables once (rank-dependent, layer-invariant)
    r = jax.lax.axis_index(axis)
    pos = sigma_positions(g, x.shape[1], r)
    sin_s = jnp.take(sin, pos, axis=0)
    cos_s = jnp.take(cos, pos, axis=0)

    def body(carry, lp):
        return _block_tp(carry, lp, cfg, sin_s, cos_s, g,
                         int8_payload=int8_payload, permute=permute), None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def llada_hidden_tp_overlap(
    params: Dict[str, Any],
    cfg,
    input_ids: jax.Array,
    mesh: Mesh,
    attn_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    int8_payload: bool = False,
) -> jax.Array:
    """Backbone (post-``ln_f`` hidden states) with the layer stack under
    ``shard_map`` on ring collective-matmuls; numerically equivalent to
    :func:`~mmada_parallel_tpu.models.llada_hidden` (ring summation
    order differs, so equality is to reduction tolerance).

    Embedding and ``ln_f`` run outside the shard_map under plain GSPMD
    (entry-level cost, once per call); the returned hidden states are
    sequence-sharded — downstream consumers that slice spans before the
    vocab head (the samplers project only the text span and the image
    positions) gather just those spans, and GSPMD reshards whatever a
    consumer actually reads (an entry-level collective the census
    prices; the full-logits head is NOT free — resharding the hidden to
    the vocab-sharded head costs one ``[B, L, d]`` gather).
    Requires: llama block flavor, ``n_heads % g == 0`` and
    ``n_kv_heads % g == 0`` (MHA or GQA),
    ``L % g == 0``, ``mesh.shape['fsdp'] == 1``, no padding mask /
    ragged positions (the servers' exact-length grouping never pads —
    ``serving.py``).  Signature matches ``llada_hidden`` so samplers can
    take it as their ``hidden_fn`` (via :func:`ring_hidden_fn`).
    """
    import math

    from mmada_parallel_tpu.models.llada import _norm, _rope_sin_cos
    from mmada_parallel_tpu.models import param_shardings

    if attn_mask is not None or position_ids is not None:
        raise ValueError(
            "ring TP supports exact-length (maskless) batches only; "
            "use the GSPMD path for ragged/padded batches")
    g = mesh.shape[AXIS]
    if g < 2:
        raise ValueError(
            f"ring TP needs tensor >= 2 (got {g}); the ring protocols "
            "start accumulation one hop out and have no single-chip "
            "degenerate form — use the GSPMD path")
    if mesh.shape.get("fsdp", 1) != 1:
        raise ValueError("tp_overlap requires fsdp == 1 "
                         f"(got {mesh.shape})")
    if cfg.block_type != "llama":
        raise ValueError("tp_overlap supports the llama block flavor only")
    if cfg.n_heads % g:
        raise ValueError(f"n_heads {cfg.n_heads} not divisible by g={g}")
    if cfg.effective_n_kv_heads % g:
        raise ValueError(
            f"n_kv_heads {cfg.effective_n_kv_heads} not divisible by "
            f"g={g} (GQA groups must split evenly over the ring)")
    B, L = input_ids.shape
    if L % g:
        raise ValueError(f"sequence {L} not divisible by g={g}")

    cdt = cfg.compute_dtype
    x = jnp.take(params["wte"], input_ids, axis=0, mode="clip").astype(cdt)
    if cfg.input_emb_norm:
        x = x * jnp.asarray(math.sqrt(cfg.d_model), cdt)
    x = jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P("data", AXIS, None)))
    sin, cos = _rope_sin_cos(L, cfg.head_dim, cfg.rope_theta)

    body = jax.shard_map(
        functools.partial(_stack_tp, cfg=cfg, g=g,
                          int8_payload=int8_payload),
        mesh=mesh,
        in_specs=(P("data", AXIS, None), param_shardings(cfg)["blocks"],
                  P(None, None), P(None, None)),
        out_specs=P("data", AXIS, None),
        check_vma=False)
    x = body(x, params["blocks"], sin, cos)

    return _norm(x, params["ln_f"], cfg)


def ring_hidden_fn(mesh: Mesh, int8_payload: bool = False):
    """A drop-in ``hidden_fn`` for the samplers
    (:func:`~mmada_parallel_tpu.samplers.generate_ti2ti`,
    :func:`~mmada_parallel_tpu.samplers.interleave_generate`): the ring-TP
    backbone bound to ``mesh``, with ``llada_hidden``'s signature.

    ``int8_payload=True`` is the OPT-IN quantized-collective mode (the
    all-gather halves travel as per-token int8, halving that wire; the
    exact bf16 ring stays the parity default) — validate end-task quality
    the way the other opt-in approximations are
    (``tests/test_tp_overlap.py`` random-toy agreement; the README
    approximation-envelope protocol)."""
    def fn(params, cfg, input_ids, attn_mask=None, position_ids=None):
        return llada_hidden_tp_overlap(params, cfg, input_ids, mesh,
                                       attn_mask, position_ids,
                                       int8_payload=int8_payload)
    return fn


def llada_forward_tp_overlap(
    params: Dict[str, Any],
    cfg,
    input_ids: jax.Array,
    mesh: Mesh,
    vocab_slice: Optional[Tuple[int, int]] = None,
    logits_dtype: Any = jnp.float32,
    int8_payload: bool = False,
) -> jax.Array:
    """Full forward: ring-TP backbone + vocab head.  GSPMD gathers the
    sequence-sharded hidden states into the vocab-sharded head (one
    entry-level ``[B, L, d]`` all-gather — logits cannot shard on both
    L and V over the same tensor axis), so per-chip head FLOPs match the
    GSPMD path's; the census prices the gather."""
    from mmada_parallel_tpu.models.llada import llada_head

    hidden = llada_hidden_tp_overlap(params, cfg, input_ids, mesh,
                                     int8_payload=int8_payload)
    return llada_head(params, cfg, hidden, vocab_slice, logits_dtype)
