"""The driver perf contract: bench.py's ONE stdout JSON line must parse.

BENCH_r04 was rc=0/parsed=null because the line grew to ~2,160 chars —
past the driver's 2,000-char stdout window (r1's 528-char and r2's
1,103-char lines parsed fine).  These tests build every payload bench.py
can emit — final and progressively-armed, A and M, with and without the
multichip census, quantized tags — from the COMMITTED census/chunk
artifacts, and pin each one under ``bench.STDOUT_BUDGET`` (1500 chars,
25% headroom under the window).  The verbose blobs that caused r4's
overflow (overlap_evidence schedules, the int8-payload ring block,
compute ratios, model prose) must ride the sidecar instead.
"""

import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import bench  # noqa: E402

ERR = lambda *a: None   # silence the helpers' stderr chatter in tests


def _load_artifact(name):
    path = os.path.join(REPO, "artifacts", name)
    if not os.path.exists(path):
        pytest.skip(f"committed artifact {name} missing")
    with open(path) as f:
        return json.load(f)


def _a_scaling(t1=39.972, approximate=False):
    census = _load_artifact("census_v5e8_a.json")
    chunk = _load_artifact("chunk_overhead.json").get("entries")
    from mmada_parallel_tpu.parallel.multichip_model import (
        predict_edit_scaling)
    scaling = predict_edit_scaling(census, t1, 8, approximate=approximate,
                                   chunk_overhead=chunk)
    assert scaling is not None
    scaling["train_step_comm"] = census.get("train_step")
    if not approximate:
        scaling["q8"] = predict_edit_scaling(census, t1, 8,
                                             approximate=True,
                                             chunk_overhead=chunk)
    return scaling

CURVE_R4 = {4: 5.446, 8: 10.379, 16: 20.243}
COMPILE_S = {4: 14.2, 8: 17.9, 16: 34.2}


def _assert_budget(payload, label):
    line = json.dumps(payload)
    assert len(line) <= bench.STDOUT_BUDGET, (
        f"{label}: stdout line is {len(line)} chars > "
        f"{bench.STDOUT_BUDGET} budget — the r4 parsed=null failure mode. "
        "Move the new field to the verbose sidecar (write_bench_diag).")
    # and it must be the driver's schema
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline"):
        assert key in parsed, f"{label}: missing contract key {key}"
    assert isinstance(parsed["value"], (int, float))


def test_a_final_payload_under_budget():
    scaling = _a_scaling()
    m_var = bench.m_variant_summary(ERR)
    payload, verbose, ex = bench.build_a_payload(
        CURVE_R4, COMPILE_S, False, scaling,
        "replayed@artifacts/census_v5e8_a.json", m_variant=m_var)
    _assert_budget(payload, "A final")
    # the blobs that broke r4 must NOT be on stdout ...
    line = json.dumps(payload)
    for banned in ("overlap_evidence", "int8_payload_ring",
                   "compute_ratios", "body_cycles"):
        assert banned not in line, f"{banned} leaked into the stdout line"
    # ... and must survive in the sidecar
    mc = verbose["multichip"]
    assert mc["overlap_evidence"], "overlap evidence lost entirely"
    assert mc["int8_payload_ring"] is not None
    # the lean line still carries the contract numbers the judge reads
    diag = payload["diagnostics"]
    assert set(diag["depth_curve_s"]) == {"4", "8", "16"}
    m = diag["multichip"]
    for k in ("census_source", "mesh", "t_edit_s_no_overlap",
              "t_edit_s_evidenced", "t_edit_s_full_overlap", "comm_s",
              "efficiency", "overlap_frac"):
        assert k in m, f"lean multichip block lost {k}"
    assert ex["t_8b_1chip"] == pytest.approx(39.972, rel=1e-3)


def test_a_armed_payloads_under_budget():
    """Every HeadlineGuard.arm() payload (1-, 2-, 3-depth prefixes, with
    the replayed census) must fit: a driver timeout can fire mid-bench."""
    scaling = _a_scaling()
    m_var = bench.m_variant_summary(ERR)
    for n in (1, 2, 3):
        curve = dict(list(CURVE_R4.items())[:n])
        comp = dict(list(COMPILE_S.items())[:n])
        payload, _, _ = bench.build_a_payload(
            curve, comp, False, scaling,
            "replayed@artifacts/census_v5e8_a.json [STALE code fingerprint]",
            m_variant=m_var)
        _assert_budget(payload, f"A armed ({n} depths)")


def test_a_payload_no_census_and_quant_tags():
    payload, _, _ = bench.build_a_payload(CURVE_R4, COMPILE_S, True, None,
                                          None, quant="int8_bf16head")
    _assert_budget(payload, "A no-census replayed quant")


def test_m_payload_under_budget():
    census = _load_artifact("census_v5e8_m.json")
    chunk = _load_artifact("chunk_overhead.json").get("entries")
    scaling = bench.predict_from_census(census, 53.17, with_q8=False,
                                        chunk_overhead=chunk)
    payload, verbose, _ = bench.build_m_payload(
        bench.R3_MEASURED_CURVES["m"], {4: 20.0, 8: 25.0, 16: 40.0}, True,
        scaling, "replayed@artifacts/census_v5e8_m.json")
    _assert_budget(payload, "M final")
    assert "overlap_evidence" not in json.dumps(payload)
    assert verbose["multichip"]["overlap_evidence"]


def test_m_cached_payload_is_tagged_and_under_budget():
    """BENCH_CACHED curves use the opt-in approximation: the metric must
    say so, and the tag must not blow the stdout budget."""
    census = _load_artifact("census_v5e8_m.json")
    chunk = _load_artifact("chunk_overhead.json").get("entries")
    scaling = bench.predict_from_census(census, 50.0, with_q8=False,
                                        chunk_overhead=chunk)
    payload, _, _ = bench.build_m_payload(
        bench.R3_MEASURED_CURVES["m"], {}, False, scaling,
        "replayed@artifacts/census_v5e8_m.json", cached="0.95,4,0.25,1")
    assert "CACHED=0.95,4,0.25,1" in payload["metric"]
    _assert_budget(payload, "M cached")


def test_bench_cached_requires_m_variant(monkeypatch):
    monkeypatch.setenv("BENCH_CACHED", "0.95,4,0.25,1")
    monkeypatch.delenv("BENCH_VARIANT", raising=False)
    with pytest.raises(SystemExit, match="BENCH_VARIANT=m"):
        bench.main()


def test_m_variant_summary_is_compact():
    m_var = bench.m_variant_summary(ERR)
    if m_var is None:
        pytest.skip("M census artifact unusable")
    assert len(json.dumps(m_var)) <= 160
    assert "t_gen_s_evidenced" in m_var


def test_fit_stdout_budget_clamps_oversize():
    """Defense in depth: even a payload that somehow grows past the
    budget is clamped by shedding diagnostics, never the contract
    fields."""
    huge = {"metric": "m", "value": 1.0, "unit": "s", "vs_baseline": 2.0,
            "diagnostics": {"multichip": {"blob": "x" * 4000},
                            "depth_curve_s": {"4": 5.0}}}
    out = bench.fit_stdout_budget(huge)
    line = json.dumps(out)
    assert len(line) <= bench.STDOUT_BUDGET
    parsed = json.loads(line)
    assert parsed["value"] == 1.0 and parsed["vs_baseline"] == 2.0
    assert parsed["diagnostics"]["depth_curve_s"] == {"4": 5.0}


def test_guard_flush_writes_sidecar_and_clamped_line(tmp_path, capsys,
                                                     monkeypatch):
    """End-to-end through HeadlineGuard: the printed line fits the budget
    and the verbose diag lands in artifacts/bench_diag.json."""
    monkeypatch.setattr(bench, "REPO_DIR", str(tmp_path))
    guard = bench.HeadlineGuard(ERR)
    payload = {"metric": "m", "value": 1.0, "unit": "s",
               "vs_baseline": None,
               "diagnostics": {"multichip": {"pad": "y" * 3000}}}
    guard.emit(payload, diag={"overlap_evidence": {"text": 1}})
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    assert len(out[0]) <= bench.STDOUT_BUDGET
    assert json.loads(out[0])["value"] == 1.0
    with open(tmp_path / "artifacts" / "bench_diag.json") as f:
        assert json.load(f)["overlap_evidence"] == {"text": 1}
