"""Calibrate the cycle-count -> seconds translation on the 1-chip curve.

The v5e-8 headline is MODELED: measured 1-chip edit seconds x the TPU
compiler's per-layer cycle ratio between the 8-chip and 1-chip compiled
modules, plus census ICI comm (``multichip_model.predict_edit_scaling``).
That model leans on one translation: *compiler ``estimated_cycles`` are
proportional to wall time across compiled-module variants*.  The only
ground truth this host can offer for that translation is the measured
1-chip DEPTH curve — different depths are different compiled modules of
the same program family, exactly like 1-chip vs 8-chip shardings are.

So: AOT-compile the 1-chip edit program at the same depths the bench
measures (4/8/16; ``tools/calibrate_cycles.py`` writes the cycle table
to ``artifacts/cycle_calibration.json``), predict each depth's seconds
as ``k * cycles(L)`` with the single scalar ``k`` least-squares-fit over
the measured curve, and report the residual relative error.  That error
is attached to the headline as an explicit bracket
(``t_edit_s_evidenced * (1 +- rel_err)``) — the honest statement of how
far a cycles-proportional model can drift from measurement across module
variants (VERDICT r4 weak #4).

Cycle model per edit at depth ``L`` (A-headline forward counts):

    cycles(L) = n_text  * (entry_B1 + L * body_B1)
              + n_image * (entry_B2 + L * body_B2)

``body``/``entry`` come from :func:`multichip_model.parse_cycles` on the
1-chip module (body = the layer-scan while body, executed once per
layer; entry = heads + glue, once per forward).  The table stores them
per compiled depth so their depth-independence is *verified*, not
assumed (``body_spread_pct``).

Reference counterpart: none — the reference publishes no performance
model; this is evidence infrastructure for the TPU build's modeled
headline.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional


def _mean(xs):
    xs = list(xs)
    return sum(xs) / len(xs) if xs else 0.0


def table_means(table: Mapping[str, Mapping[str, Mapping[str, int]]]
                ) -> Dict[str, Dict[str, float]]:
    """Depth-averaged ``{batch: {body, entry, body_spread_pct}}`` from a
    ``{depth: {batch: {body, entry}}}`` cycle table."""
    out: Dict[str, Dict[str, float]] = {}
    batches = {b for per_depth in table.values() for b in per_depth}
    for b in sorted(batches):
        bodies = [table[d][b]["body"] for d in table if b in table[d]]
        entries = [table[d][b]["entry"] for d in table if b in table[d]]
        body_m = _mean(bodies)
        spread = (100.0 * (max(bodies) - min(bodies)) / body_m
                  if body_m else 0.0)
        out[b] = {"body": body_m, "entry": _mean(entries),
                  "body_spread_pct": spread}
    return out


def predicted_cycles(table: Mapping[str, Any], depth: int,
                     n_text: int = 128, n_image: int = 64) -> float:
    """Modeled per-edit cycles at ``depth`` from a cycle table."""
    means = table_means(table)
    total = 0.0
    for b, n_fwd in (("1", n_text), ("2", n_image)):
        if n_fwd == 0:
            continue
        m = means.get(b)
        if m is None:
            raise KeyError(f"cycle table has no batch-{b} entries")
        total += n_fwd * (m["entry"] + depth * m["body"])
    return total


def calibrate(table: Mapping[str, Any], curve: Mapping[int, float],
              n_text: int = 128, n_image: int = 64
              ) -> Optional[Dict[str, Any]]:
    """Fit ``seconds = k * cycles`` over the measured depth curve and
    report the residual — the cycles->seconds translation error.

    Returns None when the curve has fewer than 2 depths (a 1-point curve
    fits any k exactly; the residual would be vacuous).  Fields:

    * ``k_s_per_cycle`` — the fitted scalar (least squares through 0);
    * ``per_depth`` — measured vs predicted seconds;
    * ``rel_err_pct`` — max |pred-meas|/meas over depths: THE error bar;
    * ``marginal_s_meas/pred`` — per-layer seconds, both sides;
    * ``fixed_s_meas/pred`` — the intercepts: measured linear-fit
      intercept vs k x entry cycles (the census program's entry covers
      only heads+glue, not the sampler scan's per-step overhead, so a
      gap here is expected and shows up in rel_err_pct honestly);
    * ``body_spread_pct`` — max depth-to-depth drift of the per-layer
      body cycles (depth-independence check of the table itself).
    """
    curve = {int(L): float(t) for L, t in curve.items()}
    if len(curve) < 2:
        return None
    pred_c = {L: predicted_cycles(table, L, n_text, n_image)
              for L in curve}
    num = sum(pred_c[L] * curve[L] for L in curve)
    den = sum(pred_c[L] ** 2 for L in curve)
    if den <= 0:
        return None
    k = num / den
    per_depth = {str(L): {"meas_s": round(curve[L], 3),
                          "pred_s": round(k * pred_c[L], 3)}
                 for L in sorted(curve)}
    rel_err = max(abs(k * pred_c[L] - curve[L]) / curve[L] for L in curve)

    Ls = sorted(curve)
    m_meas = (curve[Ls[-1]] - curve[Ls[0]]) / (Ls[-1] - Ls[0])
    means = table_means(table)
    marg_cycles = (n_text * means.get("1", {}).get("body", 0.0)
                   + n_image * means.get("2", {}).get("body", 0.0))
    fixed_cycles = (n_text * means.get("1", {}).get("entry", 0.0)
                    + n_image * means.get("2", {}).get("entry", 0.0))
    spread = max((m["body_spread_pct"] for m in means.values()),
                 default=0.0)
    return {
        "k_s_per_cycle": k,
        "per_depth": per_depth,
        "rel_err_pct": round(100.0 * rel_err, 2),
        "marginal_s_meas": round(m_meas, 4),
        "marginal_s_pred": round(k * marg_cycles, 4),
        "fixed_s_meas": round(curve[Ls[0]] - m_meas * Ls[0], 4),
        "fixed_s_pred": round(k * fixed_cycles, 4),
        "body_spread_pct": round(spread, 3),
        "n_text_forwards": n_text,
        "n_image_forwards": n_image,
    }


def headline_bracket(t_evidenced_s: float,
                     calib: Optional[Mapping[str, Any]]
                     ) -> Optional[Dict[str, float]]:
    """``{rel_err_pct, lo_s, hi_s}`` — the modeled headline with the
    calibration residual applied as a symmetric bracket."""
    if not calib:
        return None
    e = calib["rel_err_pct"] / 100.0
    return {"rel_err_pct": calib["rel_err_pct"],
            "lo_s": round(t_evidenced_s * (1.0 - e), 3),
            "hi_s": round(t_evidenced_s * (1.0 + e), 3)}


def collect_cycle_table(depths=(4, 8, 16), seq: int = 2424,
                        batches=(1, 2)) -> Dict[str, Any]:
    """AOT-compile the 1-chip edit program (v5e compile-only topology
    device, no chip/tunnel needed) at each depth x batch and extract
    ``(body, entry)`` cycles — the calibration table.  ~40 s per compile
    on this host; run via ``tools/calibrate_cycles.py``."""
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from .multichip_model import compile_edit_forward_8b, parse_cycles

    topo = topologies.get_topology_desc("v5e:2x4", "tpu")
    mesh1 = Mesh(np.array(topo.devices[:1]).reshape(1, 1, 1),
                 ("data", "fsdp", "tensor"))
    table: Dict[str, Any] = {}
    for L in depths:
        per_b = {}
        for B in batches:
            compiled, _ = compile_edit_forward_8b(mesh1, n_layers=L,
                                                  seq=seq, batch=B)
            body, entry = parse_cycles(compiled.as_text())
            per_b[str(B)] = {"body": body, "entry": entry}
        table[str(L)] = per_b
    return table
