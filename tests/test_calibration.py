"""Cycles->seconds calibration (parallel/calibration.py): the census
compute model's translation error, measured against the 1-chip depth
curve (VERDICT r4 weak #4 — the headline gets an explicit error bar)."""

import json
import os
import sys

import pytest

from mmada_parallel_tpu.parallel.calibration import (calibrate,
                                                     headline_bracket,
                                                     predicted_cycles,
                                                     table_means)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _synthetic_table(body1=100, entry1=10, body2=200, entry2=20):
    return {str(L): {"1": {"body": body1, "entry": entry1},
                     "2": {"body": body2, "entry": entry2}}
            for L in (4, 8, 16)}


def test_exact_proportional_curve_has_zero_residual():
    table = _synthetic_table()
    k_true = 1e-3
    curve = {L: k_true * predicted_cycles(table, L) for L in (4, 8, 16)}
    cal = calibrate(table, curve)
    assert cal["rel_err_pct"] == 0.0
    assert cal["k_s_per_cycle"] == pytest.approx(k_true)
    assert cal["body_spread_pct"] == 0.0
    # marginal/fixed split: model vs (exactly linear) measurement agree
    assert cal["marginal_s_pred"] == pytest.approx(cal["marginal_s_meas"],
                                                   abs=1e-3)
    assert cal["fixed_s_pred"] == pytest.approx(cal["fixed_s_meas"],
                                                abs=1e-3)


def test_residual_detects_model_mismatch():
    """A measured curve with fixed cost the cycle model can't see yields
    a nonzero residual — the error bar actually measures something."""
    table = _synthetic_table(body1=1, entry1=0, body2=2, entry2=0)
    k = 1e-3   # t(4) ~ 1.0 s compute + 0.5 s fixed the model can't see
    curve = {L: 0.5 + k * predicted_cycles(table, L) for L in (4, 8, 16)}
    cal = calibrate(table, curve)
    assert cal["rel_err_pct"] > 5.0
    assert cal["fixed_s_pred"] == 0.0
    assert cal["fixed_s_meas"] == pytest.approx(0.5, abs=1e-6)


def test_single_depth_curve_returns_none():
    assert calibrate(_synthetic_table(), {4: 5.0}) is None


def test_table_means_spread():
    table = _synthetic_table()
    table["8"]["1"]["body"] = 110   # 10% drift at one depth
    means = table_means(table)
    assert means["1"]["body_spread_pct"] == pytest.approx(
        100 * 10 / means["1"]["body"])


def test_headline_bracket():
    br = headline_bracket(6.4, {"rel_err_pct": 10.0})
    assert br == {"rel_err_pct": 10.0, "lo_s": 5.76, "hi_s": 7.04}
    assert headline_bracket(6.4, None) is None


def test_committed_artifact_calibrates_r4_curve():
    """The committed cycle table reproduces its recorded calibration and
    keeps the residual inside an honest-but-useful bound."""
    path = os.path.join(REPO, "artifacts", "cycle_calibration.json")
    if not os.path.exists(path):
        pytest.skip("cycle_calibration artifact not yet committed")
    with open(path) as f:
        art = json.load(f)
    r4 = {4: 5.446, 8: 10.379, 16: 20.243}
    cal = calibrate(art["table"], r4)
    assert cal == art["_meta"]["calibration_vs_r4_curve"]
    # the bracket must be tight enough to be informative: a >30% residual
    # would mean cycle ratios are not a usable compute model at all
    assert cal["rel_err_pct"] < 30.0
    # per-layer body cycles must be depth-independent (the model's core
    # structural assumption — scan body compiled once per depth)
    assert cal["body_spread_pct"] < 5.0


def test_bench_payload_with_calib_under_budget():
    """The calib bracket fields ride the lean stdout line — and keep it
    under the driver budget."""
    import bench
    from test_bench_payload import (COMPILE_S, CURVE_R4, _a_scaling,
                                    _assert_budget)

    if bench.load_cycle_calibration(lambda *a: None) is None:
        pytest.skip("cycle_calibration artifact not yet committed")
    payload, verbose, _ = bench.build_a_payload(
        CURVE_R4, COMPILE_S, False, _a_scaling(),
        "replayed@artifacts/census_v5e8_a.json",
        m_variant=bench.m_variant_summary(lambda *a: None))
    _assert_budget(payload, "A final with calib")
    mc = payload["diagnostics"]["multichip"]
    assert set(mc["calib"]) == {"rel_err_pct", "lo_s", "hi_s"}
    assert mc["calib"]["lo_s"] <= mc["t_edit_s_evidenced"] \
        <= mc["calib"]["hi_s"]
    assert "per_depth" in verbose["calibration"]
