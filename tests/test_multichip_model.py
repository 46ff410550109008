"""parallel/multichip_model: HLO collective census + ICI scaling model.

These tests AOT-compile the REAL 8B-width graphs (d_model 4096, vocab
134,656, mlp 12,288) on the 8-virtual-device CPU mesh — nothing executes,
so the 8B never materializes.  They pin:

* the wire-cost formulas and HLO parsing on synthetic text;
* depth-invariance of the census (entry + per-layer split), which is the
  assumption that makes compiling at depth 2 exact for depth 32;
* the absence of giant per-call collectives in the sharded train step —
  the regression guard for the logits all-gather that a d-sharded vocab
  head used to cause (~700 MB/shard, see ``param_shardings``).
"""

import json

import numpy as np
import pytest

import jax

from mmada_parallel_tpu.parallel import MeshConfig, make_mesh
from mmada_parallel_tpu.parallel import multichip_model as MM

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


SYNTH_HLO = """\
%add.clone_promoted (x: f32[], y: f32[]) -> f32[] {
  ROOT %a = f32[] add(%x, %y)
}

%region_body (arg: (s32[], f32[4,8])) -> (s32[], f32[4,8]) {
  %ar = f32[4,8]{1,0} all-reduce(%p), channel_id=1, replica_groups=[2,4]<=[8], use_global_device_ids=true, to_apply=%add.clone_promoted
  %ag = bf16[16,8]{1,0} all-gather(%q), channel_id=2, replica_groups={{0,1},{2,3},{4,5},{6,7}}, dimensions={0}
}

ENTRY %main (p0: f32[2,2]) -> f32[2,2] {
  %cp = f32[2,2]{1,0} collective-permute(%p0), channel_id=3, source_target_pairs={{0,1}}
  %tup = (f32[4]{0}, f32[4]{0}) all-reduce(%a, %b), channel_id=4, replica_groups={{0,1,2,3,4,5,6,7}}, to_apply=%add
}
"""


def test_parse_and_wire_model_on_synthetic_hlo():
    cs = MM.parse_collectives(SYNTH_HLO)
    assert [c.kind for c in cs] == ["all-reduce", "all-gather",
                                    "collective-permute", "all-reduce"]
    ar, ag, cp, tup = cs
    # f32[4,8] = 128 B, group 4 (iota form), promoted -> counted at bf16
    assert ar.bytes == 128 and ar.group_size == 4 and ar.promoted
    assert ar.wire_bytes_per_chip(True) == pytest.approx(2 * 64 * 3 / 4)
    assert ar.wire_bytes_per_chip(False) == pytest.approx(2 * 128 * 3 / 4)
    # bf16[16,8] = 256 B, group 2 (list form), all-gather
    assert ag.bytes == 256 and ag.group_size == 2 and not ag.promoted
    assert ag.wire_bytes_per_chip() == pytest.approx(256 * 1 / 2)
    assert not ar.in_entry and not ag.in_entry
    # entry ops
    assert cp.in_entry and cp.wire_bytes_per_chip() == 16
    assert tup.in_entry and tup.bytes == 32 and tup.group_size == 8
    # census: nested ops x trip count, entry once
    s = MM.comm_summary(cs, per_layer_trip=3, n_devices=8)
    want_layer = ar.wire_bytes_per_chip() + ag.wire_bytes_per_chip()
    assert s["per_layer_wire_bytes"] == int(want_layer)
    assert s["wire_bytes_per_call"] == int(
        s["entry_wire_bytes"] + 3 * want_layer)
    # link-capacity-bounded group bandwidths on the wrap-less 2x4 slice:
    # 10 links / 8 chips, 3 links / 4-row, 1 link / pair
    t8 = tup.wire_bytes_per_chip() / MM._group_bw(8, 8)
    assert MM._group_bw(8, 8) == pytest.approx(1.125e11)
    assert MM._group_bw(4, 8) == pytest.approx(6.75e10)
    assert MM._group_bw(2, 8) == pytest.approx(4.5e10)
    assert s["comm_seconds_per_call"] > t8 > 0


@pytest.fixture(scope="module")
def mesh_tp8():
    return make_mesh(MeshConfig(data=1, fsdp=1, tensor=8),
                     jax.devices()[:8])


def test_edit_forward_census_depth_invariant(mesh_tp8):
    """The trip-count model: the per-layer and entry censuses must not
    change with compiled depth — that is what licenses compiling 2 layers
    and modeling 32."""
    s = {}
    for depth in (2, 3):
        compiled, _ = MM.compile_edit_forward_8b(mesh_tp8, n_layers=depth)
        cs = MM.parse_collectives(compiled.as_text())
        s[depth] = MM.comm_summary(cs, per_layer_trip=1, n_devices=8)
    assert s[2]["entry_wire_bytes"] == s[3]["entry_wire_bytes"]
    assert s[2]["per_layer_wire_bytes"] == s[3]["per_layer_wire_bytes"]
    assert s[2]["per_layer_wire_bytes"] > 0


def test_edit_forward_8b_collectives_bounded(mesh_tp8):
    """Full-width TP-8 edit forward: only small activation collectives —
    every single collective's result must stay under 200 MB (the
    activation [B, 2424, 4096] scale), never logits-sized (~1.3 GB)."""
    compiled, cfg = MM.compile_edit_forward_8b(mesh_tp8, n_layers=2)
    assert cfg.d_model == 4096 and cfg.embedding_size == 134656
    cs = MM.parse_collectives(compiled.as_text())
    assert cs, "TP-8 forward must contain collectives"
    assert max(c.bytes for c in cs) < 200e6
    # per-layer comm exists (the two Megatron ARs)
    assert any(not c.in_entry and c.kind == "all-reduce" for c in cs)


def test_train_step_8b_collectives_bounded():
    """Sharded 8B train step (2x2x2): compiles at full width and contains
    no single collective anywhere near full-logits size.  Guards the
    vocab-head sharding (P(None, (fsdp, tensor))) that keeps the head
    GEMM collective-free."""
    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2),
                     jax.devices()[:8])
    compiled, _ = MM.compile_train_step_8b(mesh, n_layers=2)
    cs = MM.parse_collectives(compiled.as_text())
    assert cs
    # wte+head data-axis grad psum (~0.8 GB summed tuple) is the largest
    # legitimate op; the broken head sharding produced a single 1.4 GB
    # logits all-gather on top of that
    logits_like = 2 * 1290 * (134656 // 4) * 4 * 0.9
    for c in cs:
        if c.kind == "all-gather":
            assert c.bytes < logits_like, (c.kind, c.bytes)
    s = MM.comm_summary(cs, per_layer_trip=32, n_devices=8)
    assert s["comm_seconds_per_call"] > 0


def test_predict_edit_scaling_shape():
    analysis = {
        "n_text_forwards": 128, "n_image_forwards": 64,
        "edit": {
            "data1_fsdp1_tensor8": {
                "comm_seconds_per_edit": 3.0,
                "wire_bytes_per_edit": 10,
                "text_forward": {}, "image_forward": {},
                "data_idle_on_text_steps": False,
            },
            "data2_fsdp1_tensor4": {
                "comm_seconds_per_edit": 2.0,
                "wire_bytes_per_edit": 20,
                "text_forward": {}, "image_forward": {},
                "data_idle_on_text_steps": True,
            },
        },
    }
    out = MM.predict_edit_scaling(analysis, t_1chip_s=48.0, n_devices=8)
    # tp8: all forwards on 8 chips -> comp 6.0, comm 3.0 -> 9.0
    # d2t4: text on 4 chips (data idle) -> comp 128*(48/256)/4
    #       + 64*2*(48/256)/8 = 6.0+1.5 = 7.5, comm 2 -> 9.5
    assert out["mesh"] == "data1_fsdp1_tensor8"
    assert out["t_edit_s_no_overlap"] == pytest.approx(9.0)
    assert out["t_edit_s_full_overlap"] == pytest.approx(6.0)
    assert out["efficiency_no_overlap"] == pytest.approx(6.0 / 9.0)


def test_parse_collectives_tpu_layout_annotations():
    """The real-TPU compiled text carries tiling/memory-space annotations
    with parens inside the layout braces; the census regex must still see
    the collective (regression: the v5e:2x4 AOT census parsed 0)."""
    line = ('  %all-reduce.5 = bf16[2,2424,4096]{2,1,0:T(8,128)(2,1)} '
            'all-reduce(%fusion.135), channel_id=3, '
            'replica_groups=[1,8]<=[8], use_global_device_ids=true, '
            'to_apply=%add.clone')
    hlo = "ENTRY %main {\n" + line + "\n}\n"
    cols = MM.parse_collectives(hlo)
    assert len(cols) == 1
    c = cols[0]
    assert c.kind == "all-reduce"
    assert c.bytes == 2 * 2424 * 4096 * 2
    assert c.group_size == 8
    assert c.in_entry


def test_parse_cycles_body_entry_and_drop():
    hlo = """\
%body (p: f32[2]) -> f32[2] {
  %a = f32[2424,2424]{1,0} add(%p, %p), backend_config={"x":1,"window_config":{"estimated_cycles":"100"}}
  ROOT %b = f32[2]{0} add(%p, %p), backend_config={"window_config":{"estimated_cycles":"7"}}
}
ENTRY %main.1 (p: f32[2]) -> f32[2] {
  ROOT %c = f32[2]{0} add(%p, %p), backend_config={"window_config":{"estimated_cycles":"11"}}
}
"""
    body, entry = MM.parse_cycles(hlo)
    assert (body, entry) == (107, 11)
    body_ex, _ = MM.parse_cycles(hlo, "2424,2424")
    assert body_ex == 7
    assert MM.parse_cycles("no cycles here") == (0, 0)


def test_predict_uses_compiler_cycle_ratios():
    analysis = {
        "n_text_forwards": 128, "n_image_forwards": 64,
        "edit": {
            "data1_fsdp1_tensor8": {
                "comm_seconds_per_edit": 3.0,
                "wire_bytes_per_edit": 10,
                "text_forward": {}, "image_forward": {},
                "data_idle_on_text_steps": False,
                "compute_ratios": {1: 0.15, 2: 0.15},
            },
        },
    }
    out = MM.predict_edit_scaling(analysis, t_1chip_s=48.0, n_devices=8)
    # comp = 128*(48/256)*0.15 + 64*2*(48/256)*0.15 = 7.2 (not 6.0 = /8)
    assert out["compute_model"] == "compiler-cycle-ratio"
    assert out["t_compute_s"] == pytest.approx(7.2)
    assert out["t_edit_s_no_overlap"] == pytest.approx(10.2)


def test_parse_overlap_and_start_bytes():
    """Async collective-permute pairs: payload bytes halve the start op's
    (operand-alias, destination) tuple; compute scheduled inside the
    start->done window counts as overlapped."""
    hlo = """\
%body (p: f32[2]) -> f32[2] {
  %cps = (bf16[2,151,4096]{2,1,0}, bf16[2,151,4096]{2,1,0}, u32[], u32[]) collective-permute-start(%x), source_target_pairs={{0,1},{1,2}}
  %g1 = f32[2]{0} add(%p, %p), backend_config={"window_config":{"estimated_cycles":"60"}}
  %cpd = bf16[2,151,4096]{2,1,0} collective-permute-done(%cps)
  %g2 = f32[2]{0} add(%p, %p), backend_config={"window_config":{"estimated_cycles":"40"}}
  ROOT %r = f32[2]{0} add(%g1, %g2)
}
ENTRY %main (p: f32[2]) -> f32[2] {
  ROOT %c = f32[2]{0} add(%p, %p), backend_config={"window_config":{"estimated_cycles":"11"}}
}
"""
    ov = MM.parse_overlap(hlo)
    assert ov["async_pairs"] == 1
    assert ov["overlapped_cycles"] == 60
    assert ov["body_cycles"] == 100
    assert ov["overlap_fraction"] == pytest.approx(0.6)

    cols = MM.parse_collectives(hlo)
    assert len(cols) == 1  # the -done is not double-counted
    c = cols[0]
    assert c.kind == "collective-permute"
    assert c.bytes == 2 * 151 * 4096 * 2  # one payload, not the tuple
    assert c.group_size == 2
    assert not c.in_entry


def test_predict_with_overlap_evidence():
    """A ring entry whose schedule shows overlap hides comm up to the
    overlapped fraction of the phase's compute time."""
    analysis = {
        "n_text_forwards": 128, "n_image_forwards": 64,
        "edit": {
            "data1_fsdp1_tensor8": {
                "comm_seconds_per_edit": 3.0,
                "wire_bytes_per_edit": 10,
                "text_forward": {}, "image_forward": {},
                "data_idle_on_text_steps": False,
            },
            "data1_fsdp1_tensor8_ring": {
                "axes": {"data": 1, "tensor": 8},
                "decomposed_overlap": True,
                "comm_seconds_per_edit": 3.0,
                "wire_bytes_per_edit": 10,
                "text_forward": {
                    "comm_seconds_per_call": 3.0 / 192,
                    "overlap": {"async_pairs": 7, "overlap_fraction": 0.8,
                                "overlapped_cycles": 8, "body_cycles": 10},
                },
                "image_forward": {
                    "comm_seconds_per_call": 3.0 / 192,
                    "overlap": {"async_pairs": 7, "overlap_fraction": 0.8,
                                "overlapped_cycles": 8, "body_cycles": 10},
                },
                "data_idle_on_text_steps": False,
            },
        },
    }
    out = MM.predict_edit_scaling(analysis, t_1chip_s=48.0, n_devices=8)
    # both meshes: comp 6.0, comm 3.0 -> floor 9.0.  Ring phases:
    # text comm 2.0 vs 0.8*3.0 hidden -> exposed 0; image comm 1.0 vs
    # 0.8*3.0 -> exposed 0; evidenced = 6.0
    assert out["mesh"] == "data1_fsdp1_tensor8_ring"
    assert out["t_edit_s_no_overlap"] == pytest.approx(9.0)
    assert out["t_edit_s_evidenced"] == pytest.approx(6.0)
    assert out["overlap_evidence"]["text_forward"]["async_pairs"] == 7


def test_parse_start_bytes_kind_specific():
    """all-gather-start returns (shard, gathered) -> count the gathered
    buffer; reduce-scatter-start (full, scattered) -> the scattered one."""
    hlo = """\
%body (p: f32[2]) -> f32[2] {
  %ag = (bf16[1,64]{1,0}, bf16[8,64]{1,0}) all-gather-start(%x), replica_groups={{0,1,2,3,4,5,6,7}}, dimensions={0}
  %agd = bf16[8,64]{1,0} all-gather-done(%ag)
  %rs = (bf16[8,64]{1,0}, bf16[1,64]{1,0}) reduce-scatter-start(%y), replica_groups={{0,1,2,3,4,5,6,7}}, to_apply=%add
  ROOT %rsd = bf16[1,64]{1,0} reduce-scatter-done(%rs)
}
ENTRY %main (p: f32[2]) -> f32[2] {
  ROOT %c = f32[2]{0} add(%p, %p)
}
"""
    cols = MM.parse_collectives(hlo)
    assert [c.kind for c in cols] == ["all-gather", "reduce-scatter"]
    assert cols[0].bytes == 8 * 64 * 2      # gathered result
    assert cols[1].bytes == 1 * 64 * 2      # scattered result
    assert cols[0].group_size == 8


def test_ring_order_mesh_is_boundary_cycle():
    """ring_order=True must order the v5e:2x4 compile-only devices along
    the slice's boundary Hamiltonian cycle (the 2x4 slice is wrap-less,
    so this is its ONLY cycle): consecutive devices — including the wrap
    — differ by exactly one coordinate step."""
    try:
        mesh = MM._tpu_topology_mesh((1, 1, 8), ring_order=True)
    except Exception as e:          # topology API unavailable in some envs
        pytest.skip(f"v5e topology unavailable: {e!r}")
    devs = list(mesh.devices.flat)
    coords = [tuple(d.coords)[:2] for d in devs]
    assert len(set(coords)) == 8
    for i in range(8):
        a, b = coords[i], coords[(i + 1) % 8]
        assert abs(a[0] - b[0]) + abs(a[1] - b[1]) == 1, (i, a, b)


def test_bench_pick_headline_and_replay_constants():
    """bench.pick_headline prefers the evidenced time only with overlap
    evidence; the committed replay curves carry the depths the default
    BENCH_DEPTHS needs."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    floor_only = {"t_edit_s_no_overlap": 10.0}
    t, note = bench.pick_headline(floor_only)
    assert t == 10.0 and "floor" in note
    evidenced = {"t_edit_s_no_overlap": 10.0, "t_edit_s_evidenced": 7.0,
                 "overlap_evidence": {"text_forward": {"async_pairs": 64}}}
    t, note = bench.pick_headline(evidenced)
    assert t == 7.0 and "evidenced" in note
    # evidence present but not better -> floor
    same = {"t_edit_s_no_overlap": 10.0, "t_edit_s_evidenced": 10.0,
            "overlap_evidence": {"x": {}}}
    assert bench.pick_headline(same)[0] == 10.0
    for variant in ("a", "m"):
        assert set(bench.R3_MEASURED_CURVES[variant]) == {4, 8, 16}


def test_predict_d2_text_priced_as_replicated_b2():
    """On a data>1 mesh the batch-1 text forward replicates per data
    group, so it costs one B=2 forward's wall time (2*t_unit*r2) — the
    branch the 6.3 s/edit headline rests on.  Ratio keys survive a JSON
    round-trip (stringified)."""
    analysis = {
        "n_text_forwards": 128, "n_image_forwards": 64,
        "edit": {
            "data2_fsdp1_tensor4_sq_ring": {
                "axes": {"data": 2, "tensor": 4},
                "comm_seconds_per_edit": 1.0,
                "wire_bytes_per_edit": 10,
                "text_forward": {}, "image_forward": {},
                "data_idle_on_text_steps": True,
                "compute_ratios": {"2": 0.1},   # JSON-stringified key
            },
        },
    }
    out = MM.predict_edit_scaling(analysis, t_1chip_s=48.0, n_devices=8)
    # t_unit = 48/256 = 0.1875; t_img = 2*0.1875*0.1 = 0.0375
    # t_text = SAME 0.0375 (replicated B=2 program), NOT 0.1875/4
    # comp = 128*0.0375 + 64*0.0375 = 7.2
    assert out["compute_model"] == "compiler-cycle-ratio"
    assert out["t_compute_s"] == pytest.approx(192 * 0.0375)
    assert out["t_edit_s_no_overlap"] == pytest.approx(7.2 + 1.0)
