"""Multi-chip scaling analysis at REAL 8B dimensions, without 8 chips.

AOT-compiles (lower + compile, never execute) the GSPMD-sharded edit
forward and interleave train step at the full LLaDA-8B width — d_model
4096, vocab 134,656, mlp 12,288 — over an 8-device virtual CPU mesh,
walks the compiled HLO for collective ops, and combines the per-chip
wire bytes with a v5e ICI bandwidth model into a predicted 8-chip
scaling efficiency.  This replaces the "ASSUMES linear v5e-8 scaling"
term in the bench headline with a modeled figure, and exercises the
GSPMD partitioner at the dimensions the real deployment would use
(vocab 134,656 over the tensor axis, head_dim 128, mlp 12,288) instead
of toy dryrun dims.

Counting model
--------------
The compiled HLO contains each collective instruction once even when it
sits inside a ``while`` loop (a ``lax.scan`` body).  Attribution is
COMPUTATION-granular: the non-entry computation holding the most
collectives is the layer-scan while body (executed once per layer,
x depth); collectives in the entry or any other computation (e.g.
GSPMD's head-span gather loops) count once per call.  Compiling at
reduced depth (2 layers) is exact for this census: the scan body is
depth-independent and the entry census does not change with depth
(verified by ``tests/test_multichip_model.py`` compiling two depths).

Wire model (ring collectives, per chip, bytes ``S`` = HLO result bytes):

* all-reduce        ``2 * S * (g-1)/g``
* all-gather        ``S * (g-1)/g``          (S = gathered result)
* reduce-scatter    ``S * (g-1)``            (S = scattered result)
* collective-permute ``S``
* all-to-all        ``S * (g-1)/g``

v5e ICI: 4.5e10 B/s per link per direction (public "How to Scale Your
Model" book figures).  The 2x4 slice is a wrap-less mesh with 10 links
total, so groups are priced by the LINK CAPACITY of the subgraph they
span (:func:`_group_bw`): 8-wide -> 1.125e11 B/s per chip, 4-wide rows
-> 6.75e10, pairs -> 4.5e10; collective-permutes ride one link
direction with opposite-direction pair concurrency (9e10 per cp,
evidenced by ``parse_overlap``'s window counts).  The CPU backend's
float-normalization pass promotes bf16 all-reduces to f32 (reduction
computations named ``*_promoted``); TPUs reduce bf16 natively, so those
are counted at half width (``assume_tpu_bf16``, recorded in the output).
The headline prediction assumes NO compute/comm overlap (a floor — XLA's
async collectives overlap what the dependency chain allows); the
full-overlap ceiling ``max(t_comp, t_comm)`` is also reported.

Reference counterpart: the reason the reference ships FSDP at all
(``MMaDA-Parallel-A/xllm/solvers/finetune.py:371-413``); the reference
has no analogue of this analysis.
"""

from __future__ import annotations

import dataclasses
import json
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

V5E_ICI_AXIS_BW = 9.0e10   # bytes/s per chip, bidirectional ring on one axis
V5E_BF16_PEAK = 1.97e14

_DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s64": 8,
                "s32": 4, "u32": 4, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
                "pred": 1, "u64": 8, "c64": 8, "c128": 16}

_KINDS = ("all-reduce", "all-gather", "reduce-scatter", "collective-permute",
          "all-to-all")


@dataclasses.dataclass
class Collective:
    kind: str
    bytes: int            # summed result bytes (tuple results summed)
    group_size: int
    in_entry: bool
    promoted: bool = False  # CPU float-normalization bf16->f32 promotion
    computation: str = ""   # HLO computation the instruction lives in

    def wire_bytes_per_chip(self, assume_tpu_bf16: bool = True) -> float:
        g = max(self.group_size, 1)
        if g == 1:
            return 0.0
        b = self.bytes / 2 if (self.promoted and assume_tpu_bf16) \
            else float(self.bytes)
        if self.kind == "all-reduce":
            return 2.0 * b * (g - 1) / g
        if self.kind == "all-gather":
            return b * (g - 1) / g
        if self.kind == "reduce-scatter":
            return b * (g - 1)
        if self.kind == "collective-permute":
            return b
        return b * (g - 1) / g  # all-to-all


_SHAPE_RE = re.compile(r"(\w+)\[([0-9,]*)\]")
# the shapes group is lazy (.*?) so TPU layout annotations with parens
# ({2,1,0:T(8,128)(2,1)S(1)}) don't break the match
_RESULT_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?\S+\s*=\s*(.*?)\s*"
    r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"
    r"(?:-start)?\(")
_GROUPS_LIST_RE = re.compile(r"replica_groups=\{\{([0-9,]+)\}")
_GROUPS_IOTA_RE = re.compile(r"replica_groups=\[(\d+),(\d+)\]")


def _shape_bytes_list(shapes_text: str) -> List[int]:
    out = []
    for dtype, dims in _SHAPE_RE.findall(shapes_text):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        out.append(n * _DTYPE_BYTES[dtype])
    return out


def _shape_bytes(shapes_text: str) -> int:
    return sum(_shape_bytes_list(shapes_text))


def parse_collectives(hlo_text: str) -> List[Collective]:
    """Walk optimized HLO text; one :class:`Collective` per instruction.

    ``ENTRY`` attribution: HLO prints computations sequentially with the
    entry computation introduced by ``ENTRY``; instructions until the
    closing brace belong to it.  Each collective also records its
    COMPUTATION name so :func:`comm_summary` can attribute per-layer cost
    to the layer-scan body only (GSPMD places e.g. head-span gather
    loops in their own non-entry computations, which execute once per
    call, not once per layer).
    """
    out: List[Collective] = []
    in_entry = False
    comp = ""
    for line in hlo_text.splitlines():
        s = line.rstrip()
        if s.startswith("ENTRY "):
            in_entry = True
            comp = "__entry__"
            continue
        if s.startswith("%") and s.endswith("{"):
            in_entry = False
            comp = s.split()[0].lstrip("%").split("(")[0]
            continue
        if s == "}":
            in_entry = False
            comp = ""
            continue
        m = _RESULT_RE.match(s)
        if not m:
            continue
        shapes, kind = m.group(1), m.group(2)
        if "-start(" in s:
            # Async start ops return result tuples, and the wire-relevant
            # shape is kind-specific: all-gather-start returns
            # (shard, gathered) -> the GATHERED buffer (the wire formula's
            # S); reduce-scatter-start (full, scattered) -> the SCATTERED
            # result; all-reduce-start / collective-permute-start carry
            # equal-size (operand, result [, u32 contexts]) -> one payload.
            parts = _shape_bytes_list(shapes)
            if not parts:
                continue
            if kind == "reduce-scatter":
                b = min(parts)
            else:           # all-gather / all-reduce / cp / all-to-all
                b = max(parts)
        else:
            b = _shape_bytes(shapes)
        g = 1
        mg = _GROUPS_LIST_RE.search(s)
        if mg:
            g = len(mg.group(1).split(","))
        else:
            mg = _GROUPS_IOTA_RE.search(s)
            if mg:  # replica_groups=[n_groups,group_size]<=[...]
                g = int(mg.group(2))
        if kind == "collective-permute" and "source_target_pairs" in s:
            g = 2  # point-to-point; wire cost = full buffer
        out.append(Collective(kind=kind, bytes=b, group_size=g,
                              in_entry=in_entry,
                              promoted="promoted" in s,
                              computation=comp))
    return out


def _group_bw(group_size: int, n_devices: int,
              axis_bw: float = V5E_ICI_AXIS_BW) -> float:
    """Effective per-chip bandwidth for a collective group on the v5e-8
    slice, bounded by LINK CAPACITY of the subgraph the group spans.

    The 2x4 v5e slice is a wrap-less mesh (only full-pod axes wrap): it
    has 10 ICI links total (6 x + 4 y), each 4.5e10 B/s per direction.
    An algorithm using every link in both directions gives a group of g
    chips at most ``links*2*4.5e10 / g`` per chip:

    * g=8 (whole slice): 10 links -> 1.125e11  (NOT 2 "torus axes" =
      1.8e11 — that would need 16 links the slice does not have);
    * g=4 (a row line): 3 links  -> 6.75e10;
    * g=2 (a column pair): 1 link -> 4.5e10;
    * collective-permute: one neighbor hop rides one link direction;
      the ring decompositions send opposite-direction halves
      concurrently, so per-cp pricing keeps the bidirectional 9e10
      (see ``tp_overlap``; ``parse_overlap``'s ``max_open_windows``
      evidences the concurrency).

    ``axis_bw`` = 9e10 = one bidirectional link pair per chip.
    """
    if group_size >= n_devices and n_devices >= 8:
        return 10.0 * 2.0 * (axis_bw / 2.0) / n_devices   # 1.125e11
    if group_size >= 4:
        return 3.0 * 2.0 * (axis_bw / 2.0) / 4.0          # 6.75e10
    if group_size >= 3:
        return 2.0 * 2.0 * (axis_bw / 2.0) / 3.0          # 3-line: 2 links
    if group_size == 2:
        return axis_bw / 2.0                              # single link
    return axis_bw


def comm_summary(collectives: Sequence[Collective], per_layer_trip: int,
                 n_devices: int = 8,
                 assume_tpu_bf16: bool = True) -> Dict[str, Any]:
    """Per-execution totals.

    Attribution is COMPUTATION-granular: the non-entry computation holding
    the most collectives is the layer-scan while body (x ``per_layer_trip``);
    every other computation's collectives — the entry, and e.g. GSPMD's
    head-span gather loops that live in their own computations — execute
    once per call.  (A non-body GSPMD loop that iterates k times is
    undercounted k-fold; those are span-sized, ~1e-4 of the per-edit wire,
    where the old per-layer misattribution overcounted them 32-fold.)
    """
    per_comp: Dict[str, Tuple[int, int]] = {}
    for c in collectives:
        if not c.in_entry:
            n, b = per_comp.get(c.computation, (0, 0))
            per_comp[c.computation] = (n + 1, b + c.bytes)
    body_comp = max(per_comp, key=per_comp.get) if per_comp else None

    entry_bytes = entry_s = layer_bytes = layer_s = 0.0
    body_info = ({"name": body_comp,
                  "n_collectives": per_comp[body_comp][0]}
                 if body_comp is not None else None)
    for c in collectives:
        w = c.wire_bytes_per_chip(assume_tpu_bf16)
        # collective-permutes: one hop, one link direction; opposite-
        # direction pairs run concurrently (the ring decompositions emit
        # them adjacently and the schedule keeps both windows open), so a
        # per-cp 9e10 equals per-direction 4.5e10 with pair concurrency.
        bw = (V5E_ICI_AXIS_BW if c.kind == "collective-permute"
              else _group_bw(c.group_size, n_devices))
        t = w / bw
        if not c.in_entry and c.computation == body_comp:
            layer_bytes += w
            layer_s += t
        else:
            entry_bytes += w
            entry_s += t
    total_b = entry_bytes + layer_bytes * per_layer_trip
    total_s = entry_s + layer_s * per_layer_trip
    return {
        "n_collectives_static": len(collectives),
        "assume_tpu_bf16": assume_tpu_bf16,
        "body_computation": body_info,
        "entry_wire_bytes": int(entry_bytes),
        "per_layer_wire_bytes": int(layer_bytes),
        "wire_bytes_per_call": int(total_b),
        "comm_seconds_per_call": total_s,
    }


_CYCLES_RE = re.compile(r'"estimated_cycles":"(\d+)"')
# every async collective kind: the train step's FSDP all-gathers /
# reduce-scatters can open schedule windows just like the ring's
# collective-permutes (the GSPMD edit modules carry none — probed r3)
_CP_START_RE = re.compile(
    r"(?:all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)-start\(")
_CP_DONE_RE = re.compile(
    r"(?:all-reduce|all-gather|reduce-scatter|collective-permute|"
    r"all-to-all)-done\(")


def parse_overlap(hlo_text: str) -> Dict[str, Any]:
    """Schedule evidence for comm/compute overlap, per compiled module.

    TPU-compiled modules are scheduled: the printed instruction order of a
    computation IS the sequential schedule.  An async collective pair
    (``*-start`` ... ``*-done`` — collective-permute in the ring modules,
    all-gather/reduce-scatter in the FSDP train step) with compute
    instructions *between* start and done is wire time the chip spends
    doing MXU work — the thing a synchronous collective can never show.
    Returns, summed over non-entry computations (the layer-scan body):

    * ``async_pairs``: number of start/done pairs;
    * ``overlapped_cycles``: estimated_cycles of instructions scheduled
      inside any open start->done window;
    * ``body_cycles``: all estimated_cycles (denominator);
    * ``overlap_fraction``: overlapped / body.
    """
    pairs = 0
    overlapped = 0
    total = 0
    in_entry = False
    open_windows = 0
    max_open = 0
    for line in hlo_text.splitlines():
        s = line.rstrip()
        if s.startswith("ENTRY "):
            in_entry = True
            open_windows = 0
            continue
        if (s.startswith("%") and s.endswith("{")) or s == "}":
            in_entry = False       # new computation header / close
            open_windows = 0
            continue
        if in_entry:
            continue
        if _CP_START_RE.search(s):
            open_windows += 1
            max_open = max(max_open, open_windows)
            pairs += 1
            continue
        if _CP_DONE_RE.search(s):
            open_windows = max(0, open_windows - 1)
            continue
        m = _CYCLES_RE.search(s)
        if m:
            c = int(m.group(1))
            total += c
            if open_windows > 0:
                overlapped += c
    return {
        "async_pairs": pairs,
        "max_open_windows": max_open,
        "overlapped_cycles": overlapped,
        "body_cycles": total,
        "overlap_fraction": (overlapped / total) if total else 0.0,
    }


def parse_cycles(hlo_text: str,
                 drop_pattern: Optional[str] = None) -> Tuple[int, int]:
    """Sum the TPU compiler's per-instruction ``estimated_cycles`` (present
    in real-TPU compiled modules' ``backend_config``) per computation.

    Returns ``(body_cycles, entry_cycles)``: entry = the ``main``
    computation, body = the largest non-main computation (the layer-scan
    while body in the graphs compiled here).  CPU-backend HLO carries no
    estimates -> ``(0, 0)``.  ``drop_pattern``: instructions matching the
    regex (searched up to the metadata field) are excluded — e.g.
    ``"2424,2424"`` drops the attention-score fusions for a GEMM-only
    sensitivity ratio."""
    drop = re.compile(drop_pattern) if drop_pattern else None
    sums: Dict[str, int] = {}
    cur = None
    for line in hlo_text.splitlines():
        if (line.startswith("%") or line.startswith("ENTRY")) and "{" in line:
            name = (line.split()[1] if line.startswith("ENTRY")
                    else line.split()[0])
            cur = name.lstrip("%").split("(")[0]
            sums[cur] = 0
        elif cur is not None and line.strip().startswith(("%", "ROOT")):
            m = _CYCLES_RE.search(line)
            if m:
                if drop is not None and drop.search(
                        line.split("metadata")[0]):
                    continue
                sums[cur] += int(m.group(1))
    entry = max((v for k, v in sums.items() if k.startswith("main")),
                default=0)
    body = max((v for k, v in sums.items() if not k.startswith("main")),
               default=0)
    return body, entry


# ---------------------------------------------------------------------------
# AOT compilation of the sharded 8B graphs
# ---------------------------------------------------------------------------


def _abstract_sharded(tree, specs, mesh):
    import jax
    from jax.sharding import NamedSharding

    def f(s, sp):
        return jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp))

    return jax.tree_util.tree_map(f, tree, specs)


def compile_edit_forward_8b(mesh, n_layers: int = 2, seq: int = 2424,
                            batch: int = 2, tp_overlap: bool = False,
                            compiler_options: Optional[Dict[str, Any]]
                            = None, attention_impl: str = "xla"):
    """AOT-compile the sharded denoise-step forward (the edit hot path) at
    full 8B width.  Returns ``(compiled, cfg)``; nothing is executed.

    ``tp_overlap=True`` compiles the ring collective-matmul forward
    (:mod:`mmada_parallel_tpu.parallel.tp_overlap`) instead of the GSPMD
    all-reduce path — same math, decomposed collectives the scheduler can
    overlap (requires ``fsdp == 1``; ``batch`` must divide the data
    axis)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mmada_parallel_tpu.models import (LLaDAConfig, init_llada_params,
                                           param_shardings)

    # attention_impl: "xla" is the GSPMD-path default — its fused kernel
    # rides custom_partitioning, whose python callback the AOT topology
    # compile service cannot emit ("Custom emitter for
    # CustomSPMDPartitioning not found"); collectives are identical either
    # way (attention stays head-local under the TP lane sharding).  The
    # RING path's per-chunk attention runs BARE inside shard_map (no
    # partitioning wrapper), so the census CAN compile it with the real
    # Mosaic kernel: pass attention_impl="pallas" for ring entries.
    cfg = LLaDAConfig.llada_8b(n_layers=n_layers, param_dtype=jnp.bfloat16,
                               compute_dtype=jnp.bfloat16,
                               attention_impl=attention_impl)
    ab_params = _abstract_sharded(
        jax.eval_shape(lambda k: init_llada_params(k, cfg),
                       jax.random.key(0)),
        param_shardings(cfg), mesh)
    ids = jax.ShapeDtypeStruct((batch, seq), jnp.int32,
                               sharding=NamedSharding(mesh, P("data")))

    from mmada_parallel_tpu.models import llada_head, llada_hidden

    # The head mirrors the SAMPLER's usage (make_ti2ti_step.cond_heads):
    # full-vocab logits on the ~256-token text span + codebook-slice
    # logits on the image span — NOT a full [B, L, 134k] projection, which
    # the production path never runs (and which GSPMD partitions as a
    # windowed-einsum collective-permute LOOP whose printed-once /
    # executed-g-times collectives would poison the per-layer census).
    text_span = min(256, seq)
    img_span = min(1056, seq - text_span)   # gh*(gw+1) = 32*33 at 512x512
    tvs, cb = 126356, 8192

    def heads(params, hidden):
        text_h = jax.lax.dynamic_slice_in_dim(
            hidden, max(0, seq - img_span - text_span - 2), text_span,
            axis=1)
        text_logits = llada_head(params, cfg, text_h)
        img_h = jax.lax.dynamic_slice_in_dim(
            hidden, seq - img_span - 1, img_span, axis=1)
        vq = llada_head(params, cfg, img_h, vocab_slice=(tvs, cb))
        return (jnp.argmax(text_logits, axis=-1),
                jnp.argmax(vq, axis=-1))

    if tp_overlap:
        from mmada_parallel_tpu.parallel.tp_overlap import (
            llada_hidden_tp_overlap)
        q8 = tp_overlap == "int8"

        def fn(params, input_ids):
            return heads(params,
                         llada_hidden_tp_overlap(params, cfg, input_ids,
                                                 mesh, int8_payload=q8))
    else:
        def fn(params, input_ids):
            return heads(params, llada_hidden(params, cfg, input_ids))

    lowered = jax.jit(fn).lower(ab_params, ids)
    if compiler_options:
        return lowered.compile(compiler_options=compiler_options), cfg
    return lowered.compile(), cfg


def compile_train_step_8b(mesh, n_layers: int = 2, msl: int = 256,
                          n_vq: int = 1024, batch_per_device: int = 1,
                          param_dtype=None, optimizer: str = "adamw"):
    """AOT-compile the sharded interleave train step (forward + loss +
    backward + optimizer) at full 8B width, grad accumulation 1.

    ``param_dtype`` defaults to f32 (the sharded recipe); the 1-chip
    cycle-ratio baseline passes bf16 — f32 params + AdamW moments at 8B
    width do not fit one 16 GB chip even at depth 1 (the reason FSDP
    exists), and the AOT compiler enforces the budget."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mmada_parallel_tpu.models import (LLaDAConfig, init_llada_params,
                                           llada_forward, param_shardings)
    from mmada_parallel_tpu.parallel import batch_sharding, opt_state_specs
    from mmada_parallel_tpu.training.losses import m_interleave_loss
    from mmada_parallel_tpu.training.trainer import (OptimizerConfig,
                                                     make_optimizer,
                                                     make_train_step,
                                                     TrainState)

    cfg = LLaDAConfig.llada_8b(
        n_layers=n_layers,
        param_dtype=param_dtype if param_dtype is not None else jnp.float32,
        compute_dtype=jnp.bfloat16,
        remat="whole_layer",
        attention_impl="xla")  # see note above
    specs = param_shardings(cfg)
    ab_params = _abstract_sharded(
        jax.eval_shape(lambda k: init_llada_params(k, cfg),
                       jax.random.key(0)), specs, mesh)
    opt = make_optimizer(OptimizerConfig(name=optimizer, lr=1e-4),
                         ab_params)
    ab_opt = jax.eval_shape(opt.init, ab_params)
    ab_opt = _abstract_sharded(
        ab_opt, opt_state_specs(ab_opt, ab_params, specs), mesh)
    nsh = lambda sp: NamedSharding(mesh, sp)
    ab_state = TrainState(
        step=jax.ShapeDtypeStruct((), jnp.int32, sharding=nsh(P())),
        params=ab_params, opt_state=ab_opt)

    def loss_fn(p, batch, key):
        ids, labels, t = batch
        logits = llada_forward(p, cfg, ids)
        out = m_interleave_loss(logits, labels, t, msl, n_vq)
        return out["loss"], {"text_loss": out["text_loss"]}

    step = make_train_step(loss_fn, opt, accum_steps=1)
    B = batch_per_device * mesh.shape["data"] * mesh.shape["fsdp"]
    L = 8 + 1 + n_vq + 1 + msl
    bsh = batch_sharding(mesh)
    ab_batch = (jax.ShapeDtypeStruct((B, L), jnp.int32, sharding=bsh),
                jax.ShapeDtypeStruct((B, L), jnp.int32, sharding=bsh),
                jax.ShapeDtypeStruct((B,), jnp.float32, sharding=bsh))
    import jax.random as jrandom
    ab_key = jax.ShapeDtypeStruct((), jrandom.key(0).dtype,
                                  sharding=nsh(P()))
    return jax.jit(step).lower(ab_state, ab_batch, ab_key).compile(), cfg


def analyze_8b(n_devices: int = 8, n_layers_compile: int = 2,
               full_depth: int = 32,
               edit_meshes: Optional[Sequence[Tuple[int, int, int]]] = None,
               train_mesh: Tuple[int, int, int] = (2, 2, 2),
               n_text_forwards: int = 128,
               n_image_forwards: int = 64,
               seq: int = 2424) -> Dict[str, Any]:
    """Full analysis: compile the edit forward under candidate inference
    meshes + the train step, census collectives, model comm seconds.

    The A edit at reference defaults is 128 batch-1 text-step forwards
    (``cfg_scale=0`` — no text uncond branch) + 64 batch-2 image-step
    forwards (cond + img-CFG uncond batched), so both batch shapes are
    compiled per mesh and combined.  Requires ``n_devices`` visible JAX
    devices (use the virtual CPU platform).
    """
    import jax
    from mmada_parallel_tpu.parallel import MeshConfig, make_mesh

    if len(jax.devices()) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, have {len(jax.devices())}; run "
            "under XLA_FLAGS=--xla_force_host_platform_device_count="
            f"{n_devices} with the CPU platform")
    devices = jax.devices()[:n_devices]
    out: Dict[str, Any] = {"n_devices": n_devices,
                           "compiled_depth": n_layers_compile,
                           "modeled_depth": full_depth,
                           "ici_axis_bw_bytes_s": V5E_ICI_AXIS_BW,
                           "n_text_forwards": n_text_forwards,
                           "n_image_forwards": n_image_forwards}

    edit_meshes = list(edit_meshes or [(1, 1, 8), (2, 1, 4)])
    edits = {}
    for (d, f, t) in edit_meshes:
        mesh = make_mesh(MeshConfig(data=d, fsdp=f, tensor=t), devices)
        per_batch = {}
        for B, n_fwd in ((1, n_text_forwards), (2, n_image_forwards)):
            if n_fwd == 0:
                per_batch[B] = {"comm_seconds_per_call": 0.0,
                                "wire_bytes_per_call": 0}
                continue
            if B < d:   # batch can't split across a wider data axis
                per_batch[B] = None
                continue
            compiled, _ = compile_edit_forward_8b(
                mesh, n_layers_compile, seq=seq, batch=B)
            s = comm_summary(parse_collectives(compiled.as_text()),
                             full_depth, n_devices)
            per_batch[B] = s
        if per_batch[1] is None:
            if n_image_forwards == 0 or per_batch[2] is None:
                # no B=2 census exists to stand in for the replicated
                # B=1 text forwards: aliasing the zero sentinel (or a
                # skipped entry) would fabricate a free-comm text phase
                raise RuntimeError(
                    f"data{d}_fsdp{f}_tensor{t}: d>1 needs a B=2 census "
                    "for the B=1 text-forward fallback (no batch fits "
                    "this data axis otherwise)")
            # batch-1 text forwards run with the data axis idle: comm as
            # B=1 on the tensor-only part; approximate with the B=2 census
            # (activation ARs halve with per-chip batch, so this is an
            # upper bound on the text-phase comm)
            per_batch[1] = per_batch[2]
        comm_edit = (per_batch[1]["comm_seconds_per_call"] * n_text_forwards
                     + per_batch[2]["comm_seconds_per_call"]
                     * n_image_forwards)
        bytes_edit = (per_batch[1]["wire_bytes_per_call"] * n_text_forwards
                      + per_batch[2]["wire_bytes_per_call"]
                      * n_image_forwards)
        edits[f"data{d}_fsdp{f}_tensor{t}"] = {
            "axes": {"data": d, "tensor": t},
            "text_forward": per_batch[1],
            "image_forward": per_batch[2],
            "comm_seconds_per_edit": comm_edit,
            "wire_bytes_per_edit": int(bytes_edit),
            "data_idle_on_text_steps": bool(d > 1),
        }
    out["edit"] = edits

    d, f, t = train_mesh
    mesh = make_mesh(MeshConfig(data=d, fsdp=f, tensor=t), devices)
    compiled, _ = compile_train_step_8b(mesh, n_layers_compile)
    out["train_step"] = comm_summary(
        parse_collectives(compiled.as_text()), full_depth, n_devices)
    out["train_step"]["mesh"] = f"data{d}_fsdp{f}_tensor{t}"
    return out


def _topo_devices_by_coord():
    """``{(x, y): device}`` for the compile-only v5e:2x4 topology, or
    ``None`` when devices carry no coords (single coord-handling path for
    both mesh builders)."""
    from jax.experimental import topologies

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    by_coord = {}
    for d in topo.devices:
        c = getattr(d, "coords", None)
        if c is None:
            return None
    # v5e coords are (x, y, z) with x spanning 2 and y spanning 4
        by_coord[(c[0], c[1])] = d
    if set(by_coord) != {(x, y) for x in (0, 1) for y in range(4)}:
        return None
    return by_coord


def _tpu_topology_mesh(shape: Tuple[int, int, int],
                       ring_order: bool = False):
    """Mesh over compile-only devices of a real ``v5e:2x4`` topology
    (AOT: lower+compile for the actual 8-chip target, no chips needed).

    ``ring_order=True`` arranges the devices along the 2x4 slice's
    boundary Hamiltonian cycle (coords (0,0),(0,1),(0,2),(0,3),(1,3),
    (1,2),(1,1),(1,0)) so a logical ``ppermute`` ring of ``(i, i+1)``
    neighbors is a ring of PHYSICAL ICI neighbors — enumeration order
    would route 2 of 8 hops across the slice (multi-hop, link
    contention).  Collective-emission/census is unaffected (device
    assignment only); the wire model's one-hop pricing becomes the
    mapping the hardware would actually run."""
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    devices = list(topo.devices)
    if ring_order:
        by_coord = _topo_devices_by_coord()
        if by_coord is not None:
            cycle = ([(0, y) for y in range(4)]
                     + [(1, y) for y in reversed(range(4))])
            devices = [by_coord[c] for c in cycle]
    return Mesh(np.array(devices).reshape(shape),
                ("data", "fsdp", "tensor"))


def _tpu_square_mesh():
    """``(data=2, fsdp=1, tensor=4)`` mesh whose TENSOR groups are the 2x4
    slice's two 2x2 SQUARES, each ordered along its 4-cycle — a 4-wide
    ring of physical neighbors (a 4-chip ROW is a line: no cycle).  The
    data axis pairs chips across squares; inference has no cross-data
    collectives, so that adjacency is irrelevant.  Batch-2 forwards (M's
    cond+uncond; A's image steps) put one row per square and ring within
    it: ~3/7 the per-chip ring payload of TP-8 ((3/4) of half the rows
    vs (7/8) of all of them)."""
    import numpy as np
    from jax.sharding import Mesh

    by_coord = _topo_devices_by_coord()
    if by_coord is None:
        return None   # no coords: cannot build the square placement
    want = [(0, 0), (0, 1), (1, 1), (1, 0),    # left square, 4-cycle order
            (0, 2), (0, 3), (1, 3), (1, 2)]    # right square
    ordered = [by_coord[c] for c in want]
    return Mesh(np.array(ordered).reshape(2, 1, 4),
                ("data", "fsdp", "tensor"))


def analyze_8b_tpu(n_layers_compile: int = 2, full_depth: int = 32,
                   edit_meshes: Optional[Sequence[Tuple[int, int, int]]] = None,
                   train_mesh: Tuple[int, int, int] = (2, 2, 2),
                   n_text_forwards: int = 128,
                   n_image_forwards: int = 64,
                   seq: int = 2424, q8: bool = True) -> Dict[str, Any]:
    """The census of :func:`analyze_8b`, upgraded to compile for the REAL
    v5e-8 target via the AOT topology API (``v5e:2x4``), plus a
    compute-scaling term from the TPU compiler's own cost model.

    Runs in a CPU-platform process: the topology compiles are served by the
    LOCAL libtpu compile-only client (no tunnel, no live chip needed).  Two
    upgrades over the virtual-CPU census:

    * the partitioner, layouts, fusions and collective emission are the real
      TPU backend's — bf16 all-reduces natively (no ``*_promoted`` f32
      correction), real replica groups;
    * every compute fusion carries ``estimated_cycles``; the ratio
      ``body_cycles(8 chips) / body_cycles(1 chip)`` of the same program is
      the compiler's own estimate of per-layer compute scaling (captures
      shard-size GEMM inefficiency the linear /8 assumption ignores),
      measured per batch size and fed to :func:`predict_edit_scaling`.
    """
    import jax
    n_dev = 8
    out: Dict[str, Any] = {"n_devices": n_dev, "backend": "tpu-aot",
                           "compiled_depth": n_layers_compile,
                           "modeled_depth": full_depth,
                           "ici_axis_bw_bytes_s": V5E_ICI_AXIS_BW,
                           "n_text_forwards": n_text_forwards,
                           "n_image_forwards": n_image_forwards}

    # 1-chip cycle baselines on a compile-only topology device (same
    # program).  NOT the attached real device: AOT compiles against the
    # live chip are budget-checked against its CURRENT free HBM, so a
    # parent process holding bench weights makes the census flake.
    from jax.experimental import topologies
    from jax.sharding import Mesh
    import numpy as np
    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    mesh1 = Mesh(np.array(topo.devices[:1]).reshape(1, 1, 1),
                 ("data", "fsdp", "tensor"))
    base_cycles: Dict[int, int] = {}
    base_ex: Dict[int, int] = {}
    attn_pat = f"{seq},{seq}"   # attention-score result shapes
    needed = ({1} if n_text_forwards else set()) | \
        ({2} if n_image_forwards else set())
    for B in sorted(needed):
        compiled, _ = compile_edit_forward_8b(mesh1, n_layers_compile,
                                              seq=seq, batch=B)
        txt1 = compiled.as_text()
        base_cycles[B] = parse_cycles(txt1)[0]
        base_ex[B] = parse_cycles(txt1, attn_pat)[0]
    out["cycles_1chip_body"] = dict(base_cycles)

    edit_meshes = list(edit_meshes or [(1, 1, 8), (2, 1, 4)])
    edits = {}
    for (d, f, t) in edit_meshes:
        mesh = _tpu_topology_mesh((d, f, t))
        per_batch = {}
        ratios = {}
        for B, n_fwd in ((1, n_text_forwards), (2, n_image_forwards)):
            if n_fwd == 0:
                per_batch[B] = {"comm_seconds_per_call": 0.0,
                                "wire_bytes_per_call": 0}
                continue
            if B < d:
                per_batch[B] = None
                continue
            compiled, _ = compile_edit_forward_8b(
                mesh, n_layers_compile, seq=seq, batch=B)
            txt = compiled.as_text()
            s = comm_summary(parse_collectives(txt), full_depth, n_dev)
            # documents the no-overlap claim: GSPMD all-reduce modules
            # carry zero async windows (vs the ring entries below)
            s["overlap"] = parse_overlap(txt)
            body, _ = parse_cycles(txt)
            if base_cycles.get(B) and 0 < body < base_cycles[B]:
                s["compute_ratio"] = body / base_cycles[B]
                ratios[B] = s["compute_ratio"]
                # sensitivity bound: ratio with the (perfectly head-local,
                # hence perfectly scaling) attention fusions excluded —
                # the census program uses the einsum attention, which
                # over-weights that perfectly-scaling fraction vs the
                # production Pallas path
                body_ex = parse_cycles(txt, attn_pat)[0]
                if base_ex.get(B) and 0 < body_ex:
                    s["compute_ratio_ex_attention"] = body_ex / base_ex[B]
            per_batch[B] = s
        if per_batch.get(1) is None:
            if n_image_forwards == 0 or per_batch.get(2) is None:
                # same guard as the ring loop below: the zero sentinel
                # must never stand in for un-censused text forwards
                raise RuntimeError(
                    f"data{d}_fsdp{f}_tensor{t}: d>1 needs a B=2 census "
                    "for the B=1 text-forward fallback")
            per_batch[1] = per_batch[2]
        comm_edit = (per_batch[1]["comm_seconds_per_call"] * n_text_forwards
                     + per_batch[2]["comm_seconds_per_call"]
                     * n_image_forwards)
        bytes_edit = (per_batch[1]["wire_bytes_per_call"] * n_text_forwards
                      + per_batch[2]["wire_bytes_per_call"]
                      * n_image_forwards)
        edits[f"data{d}_fsdp{f}_tensor{t}"] = {
            "axes": {"data": d, "tensor": t},
            "text_forward": per_batch[1],
            "image_forward": per_batch[2],
            "comm_seconds_per_edit": comm_edit,
            "wire_bytes_per_edit": int(bytes_edit),
            "data_idle_on_text_steps": bool(d > 1),
            "compute_ratios": ratios,
        }
    out["edit"] = edits

    # Ring-overlap TP (parallel/tp_overlap.py): identical Megatron math,
    # boundary collectives decomposed into ppermute rings + chunk GEMMs so
    # the scheduler CAN overlap wire with MXU time; parse_overlap extracts
    # what the compiled schedule actually interleaved.  The "_ring_q8"
    # sibling is the OPT-IN int8-payload variant (approximate; excluded
    # from the exact-headline mesh selection, reported separately).
    ring_configs = [("data1_fsdp1_tensor8_ring", True, 1, 8,
                     lambda: _tpu_topology_mesh((1, 1, n_dev),
                                                ring_order=True))]
    if q8:
        ring_configs.append(
            ("data1_fsdp1_tensor8_ring_q8", "int8", 1, 8,
             lambda: _tpu_topology_mesh((1, 1, n_dev), ring_order=True)))
    # 2x2-square tensor groups: 4-wide physical rings + a data axis for
    # batch-2 forwards (~3/7 the per-chip ring payload of TP-8; a
    # 4-chip ROW cannot ring — no cycle on a line)
    ring_configs.append(("data2_fsdp1_tensor4_sq_ring", True, 2, 4,
                         _tpu_square_mesh))
    for entry_name, mode, d_ax, t_ax, mesh_fn in ring_configs:
        try:
            mesh_r = mesh_fn()
            if mesh_r is None:
                raise RuntimeError("square mesh unavailable (no coords)")
            per_batch = {}
            ratios = {}
            # async collective-permute is what makes the decomposition
            # pay; if the default toolchain doesn't emit start/done pairs,
            # retry with the explicit async option (attempts recorded for
            # the honest-evidence trail)
            option_sets = [None,
                           {"xla_tpu_enable_async_collective_permute":
                            "true"}]
            for B, n_fwd in ((1, n_text_forwards), (2, n_image_forwards)):
                if n_fwd == 0:
                    per_batch[B] = {"comm_seconds_per_call": 0.0,
                                    "wire_bytes_per_call": 0}
                    continue
                if B < d_ax:   # batch can't split across a wider data axis
                    per_batch[B] = None
                    continue
                attempts = []
                best = None
                for opts_c in option_sets:
                    try:
                        compiled, _ = compile_edit_forward_8b(
                            mesh_r, n_layers_compile, seq=seq, batch=B,
                            tp_overlap=mode, compiler_options=opts_c)
                    except Exception as e:
                        attempts.append({"options": opts_c,
                                         "error": repr(e)[:200]})
                        continue
                    txt = compiled.as_text()
                    s = comm_summary(parse_collectives(txt), full_depth,
                                     n_dev)
                    s["overlap"] = parse_overlap(txt)
                    # the 9e10-per-cp pricing assumes the opposite-
                    # direction pair is in flight together; if the
                    # schedule never holds 2 windows open, charge the
                    # serialized rate (2x) instead of assuming it
                    ov = s["overlap"]
                    s["cp_pair_concurrency"] = bool(
                        ov["async_pairs"]
                        and ov.get("max_open_windows", 0) >= 2)
                    if ov["async_pairs"] and not s["cp_pair_concurrency"]:
                        s["comm_seconds_per_call"] *= 2.0
                    s["compiler_options"] = opts_c
                    body = parse_cycles(txt)[0]
                    if base_cycles.get(B) and 0 < body < base_cycles[B]:
                        s["compute_ratio"] = body / base_cycles[B]
                    attempts.append({
                        "options": opts_c,
                        "async_pairs": s["overlap"]["async_pairs"],
                        "overlap_fraction": round(
                            s["overlap"]["overlap_fraction"], 4)})
                    if best is None or (s["overlap"]["overlap_fraction"]
                                        > best["overlap"]
                                        ["overlap_fraction"]):
                        best = s
                    if s["overlap"]["async_pairs"] > 0:
                        break   # default toolchain already async; done
                if best is None:
                    raise RuntimeError(f"ring compile failed for B={B}: "
                                       f"{attempts}")
                best["attempts"] = attempts
                if "compute_ratio" in best:
                    ratios[B] = best["compute_ratio"]
                # Re-compile the winning module with the PRODUCTION Mosaic
                # attention kernel (the ring block calls it bare inside
                # shard_map, which the compile-only client CAN emit —
                # unlike the GSPMD path's custom_partitioning wrapper) and
                # take the overlap evidence from THAT schedule: the
                # shipped path's own async windows, not the einsum
                # stand-in's.  Cycle ratios stay einsum-vs-einsum (the
                # compiler's custom-call pricing is not comparable to its
                # einsum pricing); the kernel-true module's ratio rides
                # along as a labeled diagnostic.
                try:
                    compiled_p, _ = compile_edit_forward_8b(
                        mesh_r, n_layers_compile, seq=seq, batch=B,
                        tp_overlap=mode,
                        compiler_options=best.get("compiler_options"),
                        attention_impl="pallas")
                    txt_p = compiled_p.as_text()
                    ov_p = parse_overlap(txt_p)
                    # adopt the kernel-true schedule UNCONDITIONALLY once
                    # it compiles — including async_pairs == 0, which means
                    # the Mosaic custom-call acts as a scheduling barrier
                    # and the shipped path genuinely cannot hide comm; the
                    # einsum stand-in's optimistic windows must not survive
                    # that evidence (sanity: the module still carries the
                    # ring's ppermutes, else the parse saw the wrong text)
                    if ov_p["async_pairs"] or "collective-permute" in txt_p:
                        best["overlap_xla_module"] = best["overlap"]
                        best["overlap"] = ov_p
                        best["overlap_attention_impl"] = "pallas"
                        if (best.get("cp_pair_concurrency")
                                and ov_p.get("max_open_windows", 0) < 2):
                            # kernel-true schedule never holds the
                            # opposite-direction pair open: charge the
                            # serialized wire rate like the xla branch
                            best["comm_seconds_per_call"] *= 2.0
                            best["cp_pair_concurrency"] = False
                        body_p = parse_cycles(txt_p)[0]
                        if base_cycles.get(B) and 0 < body_p:
                            best["compute_ratio_pallas_cycles"] = (
                                body_p / base_cycles[B])
                except Exception as e:
                    best["pallas_module_error"] = repr(e)[:200]
                per_batch[B] = best
            if per_batch.get(1) is None:
                if n_image_forwards == 0:
                    # no B=2 census exists to stand in for the replicated
                    # B=1 text forwards: a zero sentinel would fabricate a
                    # free-comm entry
                    raise RuntimeError(
                        "d>1 ring needs a B=2 census for B=1 fallback")
                # data-idle text phase: the replicated B=1 forward runs
                # each group's share of the B=2 program, so the B=2
                # census is its exact comm
                per_batch[1] = per_batch[2]
            comm_edit = (per_batch[1]["comm_seconds_per_call"]
                         * n_text_forwards
                         + per_batch[2]["comm_seconds_per_call"]
                         * n_image_forwards)
            bytes_edit = (per_batch[1]["wire_bytes_per_call"]
                          * n_text_forwards
                          + per_batch[2]["wire_bytes_per_call"]
                          * n_image_forwards)
            edits[entry_name] = {
                "axes": {"data": d_ax, "tensor": t_ax},
                "decomposed_overlap": True,
                "approximate": mode == "int8",
                "text_forward": per_batch[1],
                "image_forward": per_batch[2],
                "comm_seconds_per_edit": comm_edit,
                "wire_bytes_per_edit": int(bytes_edit),
                "data_idle_on_text_steps": bool(d_ax > 1),
                "compute_ratios": ratios,
            }
        except Exception as e:   # the ring path is an enrichment
            out[f"{entry_name}_error"] = repr(e)[:500]

    d, f, t = train_mesh
    compiled, _ = compile_train_step_8b(_tpu_topology_mesh((d, f, t)),
                                        n_layers_compile)
    txt = compiled.as_text()
    out["train_step"] = comm_summary(
        parse_collectives(txt), full_depth, n_dev)
    out["train_step"]["mesh"] = f"data{d}_fsdp{f}_tensor{t}"
    # schedule-evidenced overlap for the train step too (VERDICT r4 #6):
    # FSDP all-gather/reduce-scatter async windows in the compiled
    # module price train comm the same way the ring edit's cp windows do
    out["train_step"]["overlap"] = parse_overlap(txt)
    # weak-scaling compute ratio: per-chip batch is constant
    # (batch_per_device=1), so per-layer cycles on the 8-chip mesh over
    # the 1-chip compile = the compiler's estimate of per-chip step-time
    # change under weak scaling (tensor-sharded GEMMs, fsdp gathers).
    # Per-layer cycles come from DIFFERENCING two depths' total cycles
    # (depth-1 scans unroll into the entry, so the "body" sum alone can
    # be 0).  The ratio compiles use bf16 params + Lion (one moment): the
    # f32 AdamW recipe does not fit one 16 GB chip even at depth 1 (the
    # reason FSDP exists; the AOT compiler enforces the budget).  Both
    # sides match, so the optimizer/dtype swap cancels in the ratio.
    import jax.numpy as jnp
    try:
        def per_layer(mesh_):
            tots = []
            for nl in (1, 2):
                c, _ = compile_train_step_8b(mesh_, nl,
                                             param_dtype=jnp.bfloat16,
                                             optimizer="lion")
                body, entry = parse_cycles(c.as_text())
                tots.append(body * nl + entry if body else entry)
            return tots[1] - tots[0]

        pl1 = per_layer(mesh1)
        pl8 = per_layer(_tpu_topology_mesh((d, f, t)))
        if pl1 > 0 and pl8 > 0:
            out["train_step"]["compute_ratio_weak"] = pl8 / pl1
    except Exception as e:   # ratio is an enrichment, not load-bearing
        out["train_step"]["compute_ratio_weak_error"] = repr(e)[:300]
    return out


def predict_edit_scaling(analysis: Dict[str, Any], t_1chip_s: float,
                         n_devices: int = 8,
                         approximate: bool = False,
                         chunk_overhead: Optional[Dict[str, Any]] = None
                         ) -> Optional[Dict[str, Any]]:
    """Best-mesh predicted 8-chip edit time from a measured (depth-fit)
    1-chip edit time.

    Compute model per mesh, preferring the TPU compiler's own per-layer
    cycle ratios: batch-2 image forwards cost ``2 * t_unit * r2``; the
    batch-1 text forwards cost ``t_unit * r1`` on a pure-TP mesh, and on
    a ``data > 1`` mesh the single row REPLICATES per data group — each
    group runs its share of the batch-2 program — so a text forward
    costs one image forward's wall time (``2 * t_unit * r2``); linear
    ``1/chips`` splits are the no-ratio fallback.  No-overlap floor
    ``t = t_comp + t_comm``; full-overlap ceiling ``max(t_comp,
    t_comm)``; ``t_edit_s_evidenced`` charges only the comm the compiled
    schedule's overlap windows cannot hide.

    ``chunk_overhead``: the hardware-measured per-chunk-scheduling cost
    of the ring decomposition (``chunk_proxy.measure_chunk_overhead``
    entries keyed ``g{ring}_B{per_chip_batch}``).  Ring-mesh compute
    terms are multiplied by ``max(1.0, factor)`` — conservative on two
    counts: a sub-1 measurement never flatters the headline, and the
    factor's chunk-shape GEMM inefficiency may partly double-count what
    the compiler cycle ratio already prices (the dispatch-gap part it
    cannot see is the point of the measurement).
    """
    nt = analysis["n_text_forwards"]
    ni = analysis["n_image_forwards"]
    units = nt + 2 * ni                 # batch-1-equivalent forwards

    def _chunk_factor(g_ax: int, per_chip_b: int):
        if not chunk_overhead:
            return None
        e = (chunk_overhead.get(f"g{g_ax}_B{per_chip_b}")
             or chunk_overhead.get(f"g{g_ax}_B{3 - per_chip_b}"))
        return None if e is None else e.get("factor")

    best = None
    for name, s in analysis["edit"].items():
        # exact-headline selection excludes opt-in approximations (the
        # int8-payload ring); approximate=True selects among those only
        if bool(s.get("approximate")) != approximate:
            continue
        ax = s.get("axes") or {
            "data": int(name.split("_")[0][len("data"):]),
            "tensor": int(name.split("tensor")[1])}
        d, t_axis = ax["data"], ax["tensor"]
        text_chips = t_axis if d > 1 else n_devices
        img_chips = min(d, 2) * t_axis
        t_unit = t_1chip_s / units      # 1-chip seconds per batch-1 fwd
        # Compute term: prefer the TPU compiler's own per-layer cycle ratio
        # (tpu-aot census; captures shard-size GEMM inefficiency) over the
        # linear 1/chips assumption.  The B=1 ratio only applies when the
        # whole slice serves the text forward (d == 1).
        # JSON round-trips stringify the batch keys; normalize to ints
        ratios = {int(k): v
                  for k, v in (s.get("compute_ratios") or {}).items()}
        r1, r2 = ratios.get(1), ratios.get(2)
        # Text forwards are batch-1.  On a d>1 mesh the single row cannot
        # split over the data axis: GSPMD replicates it per data group, so
        # the per-chip program IS one group's share of the batch-2 forward
        # — the text forward's wall time equals an image forward's
        # (2 * t_unit * r2), not a perfect 1/text_chips split.
        if r1 and d == 1:
            t_text = t_unit * r1
        elif r2 and d > 1:
            t_text = 2.0 * t_unit * r2
        else:
            t_text = t_unit / text_chips
        t_img = 2 * t_unit * (r2 if r2 else 1.0 / img_chips)
        chunk_applied = None
        if s.get("decomposed_overlap"):
            # hardware-measured per-chunk scheduling cost of the ring
            # decomposition (see the chunk_overhead docstring note)
            f_img = _chunk_factor(t_axis, 2 // min(d, 2))
            f_text = _chunk_factor(t_axis, 1)
            if f_img is not None:
                t_img *= max(1.0, f_img)
                t_text *= max(1.0, f_text if f_text is not None else f_img)
                chunk_applied = {
                    "factor_image": round(f_img, 4),
                    "factor_text": round(f_text if f_text is not None
                                         else f_img, 4)}
        t_comp = nt * t_text + ni * t_img
        t_comm = s["comm_seconds_per_edit"]
        floor = t_comp + t_comm
        # Evidenced overlap: a decomposed-collective schedule that places
        # compute inside async start->done windows hides comm up to that
        # fraction of the phase's compute time (per batch phase); plain
        # all-reduce meshes have no windows -> evidenced == floor.
        overlap_evidence = {}
        if any((s.get(k) or {}).get("overlap")
               for k in ("text_forward", "image_forward")):
            exposed = 0.0
            for n_fwd, comp_phase, key in ((nt, nt * t_text,
                                            "text_forward"),
                                           (ni, ni * t_img,
                                            "image_forward")):
                fwd = s.get(key) or {}
                comm_phase = fwd.get("comm_seconds_per_call", 0.0) * n_fwd
                frac = (fwd.get("overlap") or {}).get("overlap_fraction",
                                                      0.0)
                exposed += max(0.0, comm_phase - frac * comp_phase)
                if fwd.get("overlap"):
                    overlap_evidence[key] = fwd["overlap"]
            evidenced = t_comp + exposed
        else:
            evidenced = floor
        cand = {
            "mesh": name,
            "t_edit_s_no_overlap": floor,
            "t_edit_s_full_overlap": max(t_comp, t_comm),
            "t_edit_s_evidenced": evidenced,
            "t_compute_s": t_comp,
            "t_comm_s": t_comm,
            "efficiency_no_overlap": (t_1chip_s / n_devices) / floor,
            "efficiency_evidenced": (t_1chip_s / n_devices) / evidenced,
            "wire_bytes_per_edit": s["wire_bytes_per_edit"],
            "compute_model": ("compiler-cycle-ratio" if (r1 or r2)
                              else "linear"),
            "compute_ratios": ratios or None,
            "chunk_overhead_applied": chunk_applied,
        }
        if overlap_evidence:
            cand["overlap_evidence"] = overlap_evidence
        if best is None or evidenced < best["t_edit_s_evidenced"]:
            best = cand
    return best


def run_in_subprocess(t_1chip_s: Optional[float] = None,
                      n_devices: int = 8, depth: int = 2,
                      timeout: int = 900, seq: int = 2424,
                      n_text_forwards: int = 128,
                      n_image_forwards: int = 64,
                      backend: str = "cpu",
                      q8: bool = True) -> Dict[str, Any]:
    """Run the census (+ the edit prediction when ``t_1chip_s`` is given)
    in a clean child process — usable from a process already attached to
    the TPU backend (bench.py) exactly like
    ``__graft_entry__.dryrun_multichip``'s bootstrap.

    ``backend="cpu"``: :func:`analyze_8b` on an ``n_devices``-wide virtual
    CPU platform.  ``backend="tpu"``: :func:`analyze_8b_tpu` — the child
    attaches to the real TPU backend and AOT-compiles for the ``v5e:2x4``
    topology (needs the axon tunnel; collective census + compiler cycle
    ratios)."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    env = dict(os.environ)
    args = (f"--devices {n_devices} --depth {depth} --seq {seq} "
            f"--text-forwards {n_text_forwards} "
            f"--image-forwards {n_image_forwards} --backend {backend} "
            f"--q8 {int(q8)}")
    if t_1chip_s is not None:
        args += f" --t1 {t_1chip_s}"
    # Both backends pin the child's default platform to CPU so stray eager
    # ops (PRNG keys, jnp.asarray) cannot touch — or hang on — the remote
    # TPU backend; for backend="tpu" the v5e:2x4 AOT compiles go through
    # the LOCAL libtpu compile-only PJRT client
    # (jax.experimental.topologies), needing neither the axon tunnel nor
    # the live chip.  Only the env differs: the CPU census additionally
    # needs the n_devices-wide virtual host platform.
    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu'); "
        "from mmada_parallel_tpu.parallel import multichip_model as m; "
        f"m.main({args.split()!r})"
    )
    if backend != "tpu":
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append(f"--xla_force_host_platform_device_count={n_devices}")
        env["XLA_FLAGS"] = " ".join(flags)
        env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run([sys.executable, "-c", code], env=env, cwd=repo,
                          capture_output=True, text=True, timeout=timeout)
    if proc.returncode != 0:
        raise RuntimeError(
            f"multichip analysis subprocess failed (rc={proc.returncode}): "
            f"{proc.stderr[-2000:]}")
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main(argv=None):
    """CLI: print the analysis as one JSON line (bench.py runs this in a
    virtual-CPU subprocess via :func:`run_in_subprocess`)."""
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--depth", type=int, default=2)
    p.add_argument("--full-depth", type=int, default=32)
    p.add_argument("--seq", type=int, default=2424)
    p.add_argument("--text-forwards", type=int, default=128)
    p.add_argument("--image-forwards", type=int, default=64)
    p.add_argument("--t1", type=float, default=None,
                   help="measured/fit 1-chip seconds per edit")
    p.add_argument("--backend", choices=("cpu", "tpu"), default="cpu")
    p.add_argument("--q8", type=int, default=1,
                   help="also census the opt-in int8-payload ring (tpu)")
    args = p.parse_args(argv)
    if args.backend == "tpu":
        from mmada_parallel_tpu.utils.compile_cache import (
            enable_compilation_cache)
        enable_compilation_cache()
        out = analyze_8b_tpu(args.depth, args.full_depth,
                             n_text_forwards=args.text_forwards,
                             n_image_forwards=args.image_forwards,
                             seq=args.seq, q8=bool(args.q8))
    else:
        out = analyze_8b(args.devices, args.depth, args.full_depth,
                         n_text_forwards=args.text_forwards,
                         n_image_forwards=args.image_forwards, seq=args.seq)
    if args.t1 is not None:
        out["prediction"] = predict_edit_scaling(out, args.t1,
                                                 args.devices)
        out["prediction"]["t_1chip_s"] = args.t1
        pq8 = predict_edit_scaling(out, args.t1, args.devices,
                                   approximate=True)
        if pq8 is not None:
            out["prediction_q8"] = pq8
    print(json.dumps(out))


if __name__ == "__main__":
    main()
