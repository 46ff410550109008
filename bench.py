"""End-to-end benchmark: one 512x512 thinking-aware edit (the BASELINE.json
headline: timesteps=64, text_steps=128, cfg_img=4.0, cfg_scale=0).

Runs the REAL pipeline — full-length assembled sequence, fused lax.scan
sampler, bf16 — on one chip at two reduced depths (the 8B does not fit one
v5e chip in bf16), fits ``t(L) = a + m*L`` to the measured depth curve, and
extrapolates to the 8B depth (32 layers) from the fit, so the headline
rests on measured per-layer marginal cost instead of a pure FLOPs ratio.
The reported headline is the 8B-extrapolated seconds per edit on a v5e-8,
MODELED from the 1-chip depth fit + an HLO collective census of the
AOT-compiled ``v5e:2x4`` modules (link-capacity ICI pricing, the TPU
compiler's per-layer cycle ratios, comm priced at the schedule-evidenced
overlap for the ring-TP path — see ``parallel/multichip_model.py``);
``vs_baseline`` is north-star-seconds / value (>1 beats the <=8 s target).

MFU context (measured r2, see README "Performance analysis"): v5e bf16 peak
is 197 TFLOP/s (394 is the int8 number); a clean [2424,4096]x[4096,12288]
GEMM sustains 178; the full sampler sustains ~150 == ~76% MFU.

Prints ONE JSON line on stdout; diagnostics go to stderr.
"""

import json
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

V5E_BF16_PEAK = 197e12  # per chip; 394 TOPS is int8, NOT bf16


def backbone_flops_per_token(d, h, n_layers, kv_ratio, seq):
    """Matmul FLOPs per token per forward (attention + MLP, no head)."""
    attn_proj = 2 * d * d * 2 + 2 * 2 * d * d * kv_ratio   # q,o + k,v
    attn_scores = 2 * 2 * seq * d                          # scores + values
    mlp = 3 * 2 * d * h
    return n_layers * (attn_proj + attn_scores + mlp)


def time_best3(run_once, label, err):
    """``(best_of_3, compile_first_s)`` — compile+first run, then best of
    3 timed runs.  ``run_once(i)`` must end in a full host sync
    (``np.asarray``) — ``block_until_ready`` alone has been observed not
    to block under the axon relay.  ``compile_first_s`` makes remote
    compile-cache misses visible in diagnostics (the same graph has cost
    anywhere from 20 s to 35 min cold, CLAUDE.md)."""
    t0 = time.time()
    run_once(0)
    compile_s = time.time() - t0
    err(f"[{label}] compile+first run: {compile_s:.1f}s"
        + (" (COLD remote compile)" if compile_s > 120 else ""))
    times = []
    for i in range(3):
        t0 = time.time()
        run_once(1 + i)
        times.append(time.time() - t0)
    return min(times), compile_s


STDOUT_BUDGET = 1500   # chars; the driver keeps a 2000-char stdout window
# (BENCH_r04 was rc=0/parsed=null: the one JSON line had grown to ~2,160
# chars — past that window — after overlap_evidence/int8 blobs moved into
# it; r1's 528-char and r2's 1,103-char lines parsed fine.  Everything
# verbose now goes to stderr + artifacts/bench_diag.json, and
# tests/test_bench_payload.py pins every payload under this budget.)


def fit_stdout_budget(payload, err=None):
    """Last-ditch size clamp: if the one stdout JSON line would overflow
    the driver's window, shed diagnostics sub-blocks (never the
    metric/value/unit/vs_baseline contract fields) until it fits."""
    line = json.dumps(payload)
    if len(line) <= STDOUT_BUDGET:
        return payload
    slim = dict(payload)
    diag = dict(slim.get("diagnostics") or {})
    # shed cheapest-to-lose first; "multichip" (the headline's evidence
    # block, incl. the calib bracket) goes only as a last resort
    for key in ("compile_first_run_s", "extrapolation",
                "depth_curve_source", "m_variant", "multichip"):
        if len(json.dumps(slim)) <= STDOUT_BUDGET:
            break
        if key in diag:
            diag.pop(key)
            slim["diagnostics"] = diag
            if err:
                err(f"[guard] stdout budget: dropped diagnostics.{key}")
    if len(json.dumps(slim)) > STDOUT_BUDGET:
        slim.pop("diagnostics", None)
        if err:
            err("[guard] stdout budget: dropped all diagnostics")
    return slim


class HeadlineGuard:
    """Guarantees the driver gets its one parsed JSON line.

    BENCH_r03 was rc=124/parsed=null: the single JSON line printed only
    after the depth curve AND the ~13-min census, and one cold remote
    compile (1548 s) pushed that past the driver timeout.  The guard
    inverts the contract: progressively ``arm()`` the best
    currently-supportable headline payload as soon as ANY depth is
    measured, and flush it on SIGTERM (what ``timeout`` sends) / SIGINT /
    interpreter exit if the final ``emit()`` was never reached.  Exactly
    one JSON line is printed either way — and it is clamped under the
    driver's stdout window (``fit_stdout_budget``; verbose diagnostics
    ride stderr + ``artifacts/bench_diag.json`` instead, BENCH_r04's
    failure mode)."""

    def __init__(self, err):
        self._payload = None
        self._diag = None
        self._printed = False
        self._err = err
        import atexit
        import signal
        atexit.register(self._flush)
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                signal.signal(sig, self._on_signal)
            except (ValueError, OSError):   # non-main thread etc.
                pass

    def arm(self, payload, diag=None):
        self._payload = payload
        if diag is not None:
            self._diag = diag

    def emit(self, payload=None, diag=None):
        if payload is not None:
            self._payload = payload
        if diag is not None:
            self._diag = diag
        self._flush()

    def _flush(self):
        if self._payload is not None and not self._printed:
            self._printed = True
            if self._diag:
                try:
                    write_bench_diag(self._diag, self._err)
                except Exception as e:   # the sidecar must never block
                    self._err(f"[guard] diag sidecar failed ({e!r})")
            print(json.dumps(fit_stdout_budget(self._payload, self._err)),
                  flush=True)

    def _on_signal(self, signum, frame):
        self._err(f"[guard] signal {signum}: flushing armed headline JSON "
                  "before dying")
        self._flush()
        os._exit(124)


REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def load_committed_census(variant, err):
    """Load ``artifacts/census_v5e8_<variant>.json`` (written by
    ``tools/refresh_census.py``) and report freshness: ``(census, label,
    fresh)`` or ``(None, None, False)``.  ``fresh`` means the artifact's
    ``code_sha`` matches the current census-relevant sources, so a replay
    is exactly what a live census would produce (the census is
    deterministic given code)."""
    path = os.path.join(REPO_DIR, "artifacts", f"census_v5e8_{variant}.json")
    if not os.path.exists(path):
        return None, None, False
    try:
        with open(path) as f:
            census = json.load(f)
    except (OSError, ValueError) as e:
        err(f"committed census unreadable ({e!r})")
        return None, None, False
    meta = census.get("_meta", {})
    sha = meta.get("code_sha")
    try:
        sys.path.insert(0, os.path.join(REPO_DIR, "tools"))
        from refresh_census import census_code_sha
        fresh = sha is not None and sha == census_code_sha()
    except Exception as e:
        err(f"code_sha check failed ({e!r}); treating artifact as stale")
        fresh = False
    label = (f"artifacts/census_v5e8_{variant}.json"
             + ("" if fresh else " [STALE code fingerprint]"))
    return census, label, fresh


def load_chunk_overhead(err):
    """Hardware-measured ring chunking-overhead entries
    (``artifacts/chunk_overhead.json``, written by
    ``tools/measure_chunk_overhead.py`` on the real chip), or None."""
    path = os.path.join(REPO_DIR, "artifacts", "chunk_overhead.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f).get("entries")
    except (OSError, ValueError) as e:
        err(f"chunk_overhead artifact unreadable ({e!r})")
        return None


def load_cycle_calibration(err):
    """1-chip cycle table (``artifacts/cycle_calibration.json``, written
    by ``tools/calibrate_cycles.py``) for the cycles->seconds calibration
    bracket, or None."""
    path = os.path.join(REPO_DIR, "artifacts", "cycle_calibration.json")
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f).get("table")
    except (OSError, ValueError) as e:
        err(f"cycle_calibration artifact unreadable ({e!r})")
        return None


def write_bench_diag(diag, err):
    """Verbose diagnostics sidecar: everything too big for the one stdout
    line (overlap_evidence schedules, the int8-payload ring block, compute
    ratios, the model-description prose) goes to
    ``artifacts/bench_diag.json`` + stderr instead (BENCH_r04 lesson)."""
    path = os.path.join(REPO_DIR, "artifacts", "bench_diag.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(diag, f, indent=1)
    err(f"[diag] verbose diagnostics -> {path}")
    err("[diag] " + json.dumps(diag))


MULTICHIP_MODEL_NOTE = (
    "HLO collective census at real 8B dims AOT-compiled for the v5e:2x4 "
    "topology; link-capacity-bounded ICI pricing; comm charged at the "
    "compiled schedule's evidenced overlap for decomposed-ring meshes, no "
    "overlap otherwise — a MODEL (schedule-evidenced overlap), not an "
    "8-chip measurement")


def compact_multichip(scaling, census_src, time_key="t_edit"):
    """Split a ``predict_edit_scaling`` dict into the LEAN stdout block
    and the VERBOSE sidecar block (stderr + artifacts/bench_diag.json).

    ``time_key`` renames the three modeled seconds fields (``t_edit`` for
    the A headline, ``t_gen`` for the M variant).  The lean block carries
    only scalars; evidence dicts, ratios and prose live in the sidecar.
    """
    ov = scaling.get("overlap_evidence") or {}
    compact = {
        "census_source": census_src,
        "mesh": scaling["mesh"],
        f"{time_key}_s_no_overlap": round(scaling["t_edit_s_no_overlap"], 3),
        f"{time_key}_s_evidenced": round(
            scaling.get("t_edit_s_evidenced",
                        scaling["t_edit_s_no_overlap"]), 3),
        f"{time_key}_s_full_overlap": round(
            scaling["t_edit_s_full_overlap"], 3),
        "comm_s": round(scaling["t_comm_s"], 3),
        "efficiency": round(scaling["efficiency_no_overlap"], 3),
        "compute_model": scaling.get("compute_model", "linear"),
    }
    if ov:
        compact["overlap_frac"] = {
            k.replace("_forward", ""): round(v.get("overlap_fraction", 0.0),
                                             3)
            for k, v in ov.items()}
    verbose = {
        "model": MULTICHIP_MODEL_NOTE,
        "overlap_evidence": ov or None,
        "compute_ratios": scaling.get("compute_ratios"),
        "chunk_overhead_measured": scaling.get("chunk_overhead_applied"),
        "collective_bytes_per_edit": scaling.get("wire_bytes_per_edit"),
        "int8_payload_ring": (None if not scaling.get("q8") else {
            "t_edit_s_evidenced": round(
                scaling["q8"]["t_edit_s_evidenced"], 3),
            "t_comm_s": round(scaling["q8"]["t_comm_s"], 3),
            "overlap_evidence": scaling["q8"].get("overlap_evidence"),
        }),
    }
    ts = scaling.get("train_step_comm") or {}
    if ts:
        compact["train_comm_s"] = round(
            ts.get("comm_seconds_per_call", 0.0), 3)
        verbose["collective_bytes_per_train_step"] = ts.get(
            "wire_bytes_per_call")
    return compact, verbose


def m_variant_summary(err):
    """Compact M-variant contract block for the A headline's diagnostics
    (VERDICT r4 item 8): the modeled v5e-8 interleave generation from the
    committed M census + the last measured (r3) M depth curve, so the M
    number survives in parsed driver form even when only the default A
    bench runs.  Returns None when the M census artifact is unusable."""
    try:
        census, label, fresh = load_committed_census("m", err)
        if census is None:
            return None
        t1, _, _ = extrapolate_depth(R3_MEASURED_CURVES["m"])
        scaling = predict_from_census(census, t1, with_q8=False,
                                      chunk_overhead=load_chunk_overhead(err))
        if scaling is None:
            return None
        return {
            "t_gen_s_evidenced": round(
                scaling.get("t_edit_s_evidenced",
                            scaling["t_edit_s_no_overlap"]), 3),
            "t_8b_1chip_s": round(t1, 3),
            "curve_source": "replayed-r3",
            "census": "fresh" if fresh else "stale",
        }
    except Exception as e:
        err(f"[m_variant] summary failed ({e!r})")
        return None


def predict_from_census(census, t_1chip_s, with_q8=True,
                        chunk_overhead=None):
    """In-process edit prediction from a census dict (replayed or live):
    pure dict math (``predict_edit_scaling``), no compiles."""
    from mmada_parallel_tpu.parallel.multichip_model import (
        predict_edit_scaling)
    n = census.get("n_devices", 8)
    scaling = predict_edit_scaling(census, t_1chip_s, n,
                                   chunk_overhead=chunk_overhead)
    scaling["train_step_comm"] = census.get("train_step")
    scaling["q8"] = (predict_edit_scaling(census, t_1chip_s, n,
                                          approximate=True,
                                          chunk_overhead=chunk_overhead)
                     if with_q8 else None)
    return scaling


def resolve_census(variant, t_1chip_s, err, with_q8=True,
                   predict_kw=None):
    """``(scaling, census_src)`` under the replay-first policy.

    * ``BENCH_MULTICHIP=0`` -> ``(None, ...)`` (linear label).
    * ``BENCH_CENSUS=replay`` -> committed artifact, even stale (labeled).
    * ``BENCH_CENSUS=auto`` (default) -> committed artifact when its
      ``code_sha`` matches the sources; otherwise ONE live census bounded
      by ``BENCH_CENSUS_BUDGET_S`` (default 900 s), falling back to the
      stale artifact (labeled) and then the linear assumption.  Replay is
      exact, not a compromise: the census is deterministic given code.
    * ``BENCH_CENSUS=live`` -> bounded live census first (replay fallback).
    * ``BENCH_MULTICHIP=cpu`` -> bounded live census on the virtual-CPU
      backend (the pre-r3 census flavor), replay fallback.
    """
    mc = os.environ.get("BENCH_MULTICHIP", "1")
    if mc == "0":
        return None, None
    mode = os.environ.get("BENCH_CENSUS", "auto")
    budget = float(os.environ.get("BENCH_CENSUS_BUDGET_S", "900"))
    census, label, fresh = load_committed_census(variant, err)
    chunk = load_chunk_overhead(err)

    def replay():
        if census is None:
            return None, None
        scaling = predict_from_census(census, t_1chip_s, with_q8,
                                      chunk_overhead=chunk)
        err(f"census: replayed {label}")
        return scaling, f"replayed@{label}"

    if mode == "replay" or (mode == "auto" and fresh and mc != "cpu"):
        scaling, src = replay()
        if scaling is not None:
            return scaling, src
        if mode == "replay":
            # explicit replay-only request: a missing/corrupt artifact must
            # not cost a ~13-min live census under a tight driver timeout —
            # degrade to the assume-linear label instead
            err("census: BENCH_CENSUS=replay but no committed artifact; "
                "skipping live census")
            return None, None
        mode = "auto"   # nothing to replay: fall through to live

    # bounded live census (stale/missing artifact, or explicitly asked)
    kw = dict(seq=2424, n_text_forwards=128, n_image_forwards=64,
              q8=with_q8)
    kw.update(predict_kw or {})
    backend = "cpu" if mc == "cpu" else "tpu"
    if budget > 60:
        try:
            from mmada_parallel_tpu.parallel.multichip_model import (
                run_in_subprocess)
            t0 = time.time()
            live = run_in_subprocess(t_1chip_s=t_1chip_s, backend=backend,
                                     timeout=budget, **kw)
            err(f"census: live [{backend}] in {time.time() - t0:.0f}s")
            # re-predict in-process so the measured chunk-overhead factor
            # applies to the live census too
            scaling = predict_from_census(live, t_1chip_s, with_q8,
                                          chunk_overhead=chunk)
            return scaling, f"live-{backend}"
        except Exception as e:
            err(f"live census [{backend}] failed/over budget ({e!r})")
    scaling, src = replay()
    if scaling is not None:
        return scaling, src
    return None, None


def tpu_available(timeout_s: float = 240.0) -> bool:
    """Probe the axon TPU backend in a SUBPROCESS with a timeout.

    When the tunnel is down, ``jax.devices()`` hangs indefinitely (no
    exception), which would wedge the whole bench; probing in a killable
    child turns that into a clean False."""
    import subprocess
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices()[0].platform == 'tpu'"],
            timeout=timeout_s, capture_output=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


# Round-3 measured depth curves (real v5e chip; README "Benchmark").
# Used ONLY as an explicitly-labeled replay when the TPU backend is
# unreachable at bench time — the multichip census still runs live (it
# AOT-compiles via the local libtpu client, no tunnel needed).
R3_MEASURED_CURVES = {
    "a": {4: 5.45, 8: 10.38, 16: 20.25},
    "m": {4: 7.23, 8: 13.80, 16: 26.92},
}


def pick_headline(scaling):
    """(seconds, note) from a multichip prediction dict: the
    schedule-evidenced time when the compiled v5e-8 modules show async
    overlap windows (ring-decomposed TP), else the no-overlap floor."""
    floor = scaling["t_edit_s_no_overlap"]
    evidenced = scaling.get("t_edit_s_evidenced", floor)
    if scaling.get("overlap_evidence") and evidenced < floor:
        return evidenced, ("v5e-8 modeled from HLO collective census + ICI "
                           "bandwidth; ring-decomposed TP comm overlap "
                           "evidenced by the compiled schedule")
    return floor, ("v5e-8 modeled from HLO collective census + ICI "
                   "bandwidth, no-overlap floor")


def extrapolate_depth(curve, target_layers=32):
    """``(t_target, method, marginal_s_per_layer|None)`` from a measured
    depth->seconds curve: linear fit ``t(L) = a + m*L`` when >=2 depths,
    else the FLOPs-ratio fallback."""
    Ls = sorted(curve)
    if len(Ls) >= 2:
        m = (curve[Ls[-1]] - curve[Ls[0]]) / (Ls[-1] - Ls[0])
        a = curve[Ls[0]] - m * Ls[0]
        return (a + target_layers * m,
                f"linear fit over measured depths {Ls}", m)
    L = Ls[0]
    return (curve[L] * target_layers / L,
            f"FLOPs-ratio extrapolation from {L} layers", None)


def build_a_payload(curve, compile_s, replayed, scaling, census_src,
                    quant="", seq=2424, n_forwards=192,
                    f_tok_layer=None, m_variant=None):
    """The one driver JSON payload for the A headline, buildable from any
    >=1-depth curve — armed progressively so a driver timeout mid-bench
    still yields a parsed artifact.  Returns ``(payload, verbose_diag,
    extras)``: the stdout line (LEAN — pinned <= ``STDOUT_BUDGET`` chars
    by ``tests/test_bench_payload.py``), the sidecar diagnostics
    (stderr + ``artifacts/bench_diag.json``), and derived scalars."""
    if f_tok_layer is None:
        f_tok_layer = backbone_flops_per_token(4096, 12288, 1, 1.0, seq)
    t_8b_1chip, method, m_per_layer = extrapolate_depth(curve)
    marginal_tflops = (f_tok_layer * seq * n_forwards / m_per_layer
                       / 1e12 if m_per_layer else None)
    if scaling is not None:
        t_8b_8chip, scale_note = pick_headline(scaling)
    else:
        t_8b_8chip = t_8b_1chip / 8.0
        scale_note = "ASSUMES linear v5e-8 scaling"
    L0 = min(curve)
    sustained = (f_tok_layer * L0 * seq * n_forwards) / curve[L0]
    tag = f" W8A8-{quant}" if quant.startswith("int8") else ""
    peak = 394e12 if quant.startswith("int8") else V5E_BF16_PEAK
    diagnostics = {
        "depth_curve_s": {str(k): round(v, 3) for k, v in curve.items()},
        "compile_first_run_s": {str(k): round(v, 1)
                                for k, v in compile_s.items()},
        "extrapolation": method,
        "sustained_tflops_min_depth": round(sustained / 1e12, 1),
        "marginal_backbone_tflops": (round(marginal_tflops, 1)
                                     if marginal_tflops else None),
        "mfu_pct": round(100 * sustained / peak, 1),
        "t_8b_1chip_s": round(t_8b_1chip, 3),
        "depth_curve_source": ("replayed-r3 (TPU unreachable)" if replayed
                               else "measured this run"),
    }
    verbose = {"v5e_peak_tflops": round(peak / 1e12)}
    if scaling is not None:
        compact, mc_verbose = compact_multichip(scaling, census_src)
        diagnostics["multichip"] = compact
        verbose["multichip"] = mc_verbose
        if len(curve) >= 2 and not quant:
            # cycles->seconds calibration bracket (the census compute
            # model's translation error, measured against THIS run's
            # depth curve; parallel/calibration.py).  int8 runs skip it:
            # the cycle table is a bf16-program artifact.
            table = load_cycle_calibration(lambda *a: None)
            if table is not None:
                from mmada_parallel_tpu.parallel.calibration import (
                    calibrate, headline_bracket)
                cal = calibrate(table, curve)
                br = headline_bracket(compact["t_edit_s_evidenced"], cal)
                if br is not None:
                    compact["calib"] = br
                    verbose["calibration"] = cal
    if m_variant:
        diagnostics["m_variant"] = m_variant
    payload = {
        "metric": f"sec per 512x512 edit, 64 img + 128 text steps{tag}"
                  " (8B depth from "
                  + ("REPLAYED-r3" if replayed else "measured")
                  + f" depth-curve fit; {scale_note})",
        "value": round(t_8b_8chip, 3),
        "unit": "s",
        "vs_baseline": round(8.0 / t_8b_8chip, 3),
        "diagnostics": diagnostics,
    }
    extras = {"t_8b_1chip": t_8b_1chip, "m_per_layer": m_per_layer,
              "marginal_tflops": marginal_tflops, "sustained": sustained}
    return payload, verbose, extras


def build_m_payload(curve, compile_s, replayed, scaling, census_src,
                    quant="", seq=2344, n_fwd=128, f_tok_layer=None,
                    cached=""):
    """M-variant (interleave) driver payload: same lean-stdout /
    verbose-sidecar split as :func:`build_a_payload`.  ``cached`` tags
    the metric when the opt-in feature-cache sampler produced the curve
    (the number is not comparable to the exact-parity path unlabeled)."""
    if f_tok_layer is None:
        f_tok_layer = backbone_flops_per_token(4096, 12288, 1, 1.0, seq)
    t_8b, method, _ = extrapolate_depth(curve)
    L0 = min(curve)
    sustained = f_tok_layer * L0 * seq * 2 * n_fwd / curve[L0]
    if scaling is not None:
        t_8chip, note = pick_headline(scaling)
    else:
        t_8chip = t_8b / 8
        note = "ASSUMES linear v5e-8 scaling"
    tag = f" W8A8-{quant}" if quant.startswith("int8") else ""
    if cached:
        tag += f" CACHED={cached}"
    diagnostics = {
        "depth_curve_s": {str(k): round(v, 3) for k, v in curve.items()},
        "compile_first_run_s": {str(k): round(v, 1)
                                for k, v in compile_s.items()},
        "sustained_tflops_min_depth": round(sustained / 1e12, 1),
        "seq_len": seq,
        "t_8b_1chip_s": round(t_8b, 3),
        "depth_curve_source": ("replayed-r3 (TPU unreachable)"
                               if replayed else "measured this run"),
    }
    verbose = {}
    if scaling is not None:
        compact, mc_verbose = compact_multichip(scaling, census_src,
                                                time_key="t_gen")
        diagnostics["multichip"] = compact
        verbose["multichip"] = mc_verbose
    payload = {
        "metric": "sec per 512x512 interleave generation, 128 text + "
                  f"30 image steps{tag} (variant M; 8B depth from "
                  + ("REPLAYED-r3 " if replayed else "")
                  + f"{method}; {note})",
        "value": round(t_8chip, 3),
        "unit": "s",
        "vs_baseline": None,
        "diagnostics": diagnostics,
    }
    return payload, verbose, {"t_8b_1chip": t_8b, "sustained": sustained}


def replay_curve_if_unreachable(variant, depths, blocked_by=""):
    """``(replayed, curve, remaining_depths)`` — the shared
    TPU-unreachable fallback for both bench variants: replay the
    committed r3 depth curve (explicitly labeled downstream) so the
    driver still gets a headline while the census runs live.

    ``blocked_by`` names an env mode (quant/cached) that has NO committed
    replay curve; with one active, an unreachable TPU is a hard error
    rather than a silently-wrong replay.
    """
    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    if tpu_available():
        return False, {}, depths
    if blocked_by:
        raise SystemExit("TPU backend unreachable; the committed replay "
                         "curves cover only the exact bf16 sampler "
                         f"({blocked_by} needs the real chip)")
    tag = "[M] " if variant == "m" else ""
    err(f"{tag}TPU backend unreachable (tunnel down?) — REPLAYING the r3 "
        "measured depth curve; the multichip census replays the committed "
        "artifact (or runs live under BENCH_CENSUS_BUDGET_S if stale)")
    committed = R3_MEASURED_CURVES[variant]
    curve = {L: committed[L] for L in depths if L in committed}
    if not curve:
        raise SystemExit("replay curves cover only depths "
                         f"{sorted(committed)}; got BENCH_DEPTHS={depths}")
    if len(curve) < len(depths):
        err(f"{tag}replay: depths {sorted(set(depths) - set(curve))} "
            "not in the committed curve; dropped")
    return True, curve, []


def bench_m(depths, quant):
    """Opt-in M-variant benchmark (``BENCH_VARIANT=m``): one interleave
    generation at the reference defaults (``MMaDA-Parallel-M/inference.py:
    114-124`` — text_steps=128, image_steps=30, 1024 VQ tokens, msl=256),
    cond+uncond batched per forward.  Same depth-curve protocol as the A
    headline."""
    import functools
    import jax
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.models import LLaDAConfig, init_llada_params
    from mmada_parallel_tpu.samplers.interleave import (
        InterleaveOptions, interleave_generate, interleave_generate_cached)

    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    # BENCH_CACHED=ratio,interval,warmup[,img] switches to the adaptive
    # feature cache (opt-in approximation), e.g. BENCH_CACHED=0.95,4,0.25,0
    cached_env = os.environ.get("BENCH_CACHED", "")
    if cached_env:
        parts = cached_env.split(",")
        cached_kw = {"cache_ratio": float(parts[0]),
                     "refresh_interval": int(parts[1]),
                     "warmup_ratio": float(parts[2]),
                     "refresh_on_image_steps": (bool(int(parts[3]))
                                                if len(parts) > 3 else True)}
        gen = functools.partial(interleave_generate_cached, **cached_kw)
        err(f"[M] cached sampler: {cached_kw}")
    else:
        gen = interleave_generate
    T = tk.TOKENS_M
    # instr_len 35 (not 32) makes total_len 2344 ≡ 0 (mod 8) so the v5e-8
    # census can price the ring-TP path for M too (the ring requires the
    # sequence to divide the TP degree; prompt length is a free benchmark
    # choice — production prompts vary per request anyway)
    n_vq, msl, instr_len = 1024, 256, 35
    prompt = ([T.interleave, T.soi] + [T.vq_offset + 7] * n_vq + [T.eoi]
              + [T.bos] + list(range(1000, 1000 + instr_len - 2)) + [T.eos])
    ids, lay = tk.assemble_interleave_sequence(prompt, n_vq, msl)
    un_prompt = ([T.interleave, T.soi] + [0] * n_vq + [T.eoi]
                 + [T.bos, T.eos] + [T.eos] * (instr_len - 2))
    un_ids, _ = tk.assemble_interleave_sequence(un_prompt, n_vq, msl)
    seq = lay.total_len
    opts = InterleaveOptions()  # reference defaults; image_temp 1.0 -> key
    err(f"[M] sequence length: {seq}; depths: {depths}")

    guard = HeadlineGuard(err)
    compile_s = {}
    n_fwd = InterleaveOptions().text_steps
    f_tok_layer = backbone_flops_per_token(4096, 12288, 1, 1.0, seq)
    o = InterleaveOptions()
    m_census_kw = dict(seq=seq, n_text_forwards=0,
                       n_image_forwards=o.text_steps + o.image_steps,
                       q8=False)

    def m_payload(curve, replayed, scaling, census_src):
        return build_m_payload(curve, compile_s, replayed, scaling,
                               census_src, quant=quant, seq=seq,
                               n_fwd=n_fwd, f_tok_layer=f_tok_layer,
                               cached=cached_env)

    def arm_from(curve, replayed):
        try:
            t1 = extrapolate_depth(curve)[0]
            scaling = census_src = None
            if os.environ.get("BENCH_MULTICHIP", "1") != "0":
                census, label, _ = load_committed_census("m", err)
                if census is not None:
                    scaling = predict_from_census(
                        census, t1, with_q8=False,
                        chunk_overhead=load_chunk_overhead(err))
                    census_src = f"replayed@{label}"
            p = m_payload(curve, replayed, scaling, census_src)
            guard.arm(p[0], diag=p[1])
        except Exception as e:
            err(f"[guard] arm failed ({e!r})")

    replayed, curve, depths = replay_curve_if_unreachable(
        "m", depths,
        blocked_by=("BENCH_QUANT" if quant
                    else "BENCH_CACHED" if cached_env else ""))
    if curve:
        arm_from(curve, replayed)
    for L in depths:
        cfg = LLaDAConfig.llada_8b(n_layers=L, param_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16)
        params = jax.jit(lambda k, cfg=cfg: init_llada_params(k, cfg))(
            jax.random.key(0))
        if quant.startswith("int8"):
            from mmada_parallel_tpu.ops.quant import quantize_llada_params
            params = jax.jit(lambda p: quantize_llada_params(
                p, quantize_head="bf16head" not in quant))(params)
        run = jax.jit(lambda p, i, u, k, cfg=cfg: gen(
            p, cfg, i, u, lay, opts, key=k))
        i_dev = jnp.asarray(ids)[None]
        u_dev = jnp.asarray(un_ids)[None]

        def run_once(i, run=run, params=params):
            fin, _ = run(params, i_dev, u_dev, jax.random.key(1 + i))
            np.asarray(fin)

        curve[L], compile_s[L] = time_best3(run_once, f"M {L} layers", err)
        err(f"[M {L} layers] interleave time: {curve[L]:.2f}s")
        del params, run
        import gc
        jax.clear_caches()
        gc.collect()
        arm_from(curve, replayed)

    # same modeled v5e-8 scaling as the A headline: every M forward is
    # batch-2 (cond+uncond always batched), text_steps + image_steps
    # total; replay-first census policy (resolve_census)
    t_8b = extrapolate_depth(curve)[0]
    scaling, census_src = resolve_census("m", t_8b, err, with_q8=False,
                                         predict_kw=m_census_kw)
    if scaling is not None:
        err(f"[M] modeled v5e-8 [{census_src}]: "
            f"{scaling['t_edit_s_no_overlap']:.2f}s no-overlap / "
            f"{scaling.get('t_edit_s_evidenced', 0):.2f}s modeled "
            "(schedule-evidenced overlap) / "
            f"{scaling['t_edit_s_full_overlap']:.2f}s full-overlap "
            f"({100 * scaling['efficiency_no_overlap']:.0f}% floor)")
    payload, verbose, ex = m_payload(curve, replayed, scaling, census_src)
    err(f"[M] sustained at {min(curve)} layers: "
        f"{ex['sustained'] / 1e12:.0f} TFLOP/s; 8B-extrapolated "
        f"{ex['t_8b_1chip']:.2f}s/gen 1-chip")
    guard.emit(payload, diag=verbose)


def bench_serve(depth: int, batch: int, n_requests: int):
    """Opt-in serving benchmark (``BENCH_SERVE=depth,batch,requests``,
    e.g. ``4,4,8``): measured edits/min/chip through ``TI2TIServer`` —
    solo (batch 1) vs continuously batched — at the headline edit shape
    (512x512 grid, 256 text tokens, reference step counts).  Quantifies
    the production-path claim: per-edit fixed cost (head/sampling dispatch,
    ~0.5 s at depth 4) amortizes across the batch; GEMMs are FLOP-neutral
    in batch, so the win is the fixed-cost share plus dispatch overlap.
    """
    import threading
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.models import LLaDAConfig, init_llada_params
    from mmada_parallel_tpu.samplers import TI2TIOptions
    from mmada_parallel_tpu.serving import ServeConfig, TI2TIServer

    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    if not os.environ.get("BENCH_SERVE_TINY") and not tpu_available():
        raise SystemExit("BENCH_SERVE needs the real chip; TPU backend "
                         "unreachable")
    _, _, gh, gw = tk.calculate_vq_params(512, 512, 16)
    if os.environ.get("BENCH_SERVE_TINY"):   # CPU smoke of the glue only
        cfg = LLaDAConfig.tiny(d_model=64, n_heads=4, n_kv_heads=4,
                               n_layers=depth, mlp_hidden_size=128,
                               vocab_size=126464 + 8192)
        opts = TI2TIOptions(text_steps=4, timesteps=4, temperature=0.0,
                            text_temperature=0.0, cfg_scale=0.0,
                            cfg_img=4.0)
        gh, gw = 4, 4
    else:
        cfg = LLaDAConfig.llada_8b(n_layers=depth,
                                   param_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16)
        opts = TI2TIOptions(text_steps=128, timesteps=64, temperature=0.0,
                            text_temperature=0.0, cfg_scale=0.0,
                            cfg_img=4.0)
    params = init_llada_params(jax.random.key(0), cfg)
    plen = 192
    prompt = list(range(1000, 1000 + plen))

    results = {}
    for B, label in ((1, "solo"), (batch, "batched")):
        srv = TI2TIServer(params, cfg, opts,
                          ServeConfig(batch_size=B, max_wait_ms=200.0,
                                      grid_hw=(gh, gw)))
        t0 = time.time()
        srv.warmup([plen])
        err(f"[serve {label} B={B}] warmup(compile): "
            f"{time.time() - t0:.1f}s")
        srv.submit(prompt)  # first real batch through; not timed
        t0 = time.time()
        outs = [None] * n_requests

        def one(i):
            outs[i] = srv.submit(prompt)

        threads = [threading.Thread(target=one, args=(i,))
                   for i in range(n_requests)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        dt = time.time() - t0
        assert all(o is not None and o["codes"].shape[-1] for o in outs)
        stats = srv.stats()
        srv.close()
        results[label] = {"seconds": dt, "batch_size": B,
                          "edits_per_min": 60.0 * n_requests / dt,
                          "batches": stats["batches"]}
        err(f"[serve {label} B={B}] {n_requests} edits in {dt:.1f}s -> "
            f"{results[label]['edits_per_min']:.2f} edits/min/chip "
            f"({stats['batches']} batches)")

    eff = (results["batched"]["edits_per_min"]
           / results["solo"]["edits_per_min"])
    err(f"[serve] batching throughput gain: {eff:.2f}x at B={batch}")
    print(json.dumps(fit_stdout_budget({
        "metric": f"TI2TIServer edits/min/chip, {depth}-layer 8B-width "
                  f"512x512 edits, continuous batching B={batch} "
                  f"(solo comparison in diagnostics)",
        "value": round(results["batched"]["edits_per_min"], 3),
        "unit": "edits/min",
        "vs_baseline": None,
        "diagnostics": {"solo": results["solo"],
                        "batched": results["batched"],
                        "batching_throughput_gain": round(eff, 3),
                        "n_requests": n_requests},
    }, err)))


def bench_train(depths):
    """Opt-in train-step benchmark (``BENCH_TRAIN=2,3`` or ``=1`` for the
    default depths): one full SFT train step — forward + interleave loss +
    backward + AdamW — at real 8B width and the M interleave shape
    (msl 256 + 1024 VQ tokens, seq 1290), per-chip batch 1, bf16 params
    (the reference recipe trains bf16 params, ``scripts/train.sh``),
    ``remat="whole_layer"``.  Measured on one chip at reduced depths
    (AdamW's two moments cap the depth that fits 16 GB), depth-fit to 32
    layers; the v5e-8 step is modeled as measured-fit x the census's
    weak-scaling compiler cycle ratio + the census train-step ICI time
    (data2_fsdp2_tensor2, global batch 4)."""
    from mmada_parallel_tpu.models import (LLaDAConfig, init_llada_params,
                                           llada_forward)
    from mmada_parallel_tpu.training.losses import m_interleave_loss
    from mmada_parallel_tpu.training.trainer import (OptimizerConfig,
                                                     make_optimizer,
                                                     make_train_step,
                                                     TrainState)

    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    if not tpu_available():
        raise SystemExit("BENCH_TRAIN needs the real chip; TPU backend "
                         "unreachable")
    msl, n_vq = 256, 1024
    L = 8 + 1 + n_vq + 1 + msl
    err(f"train step: seq {L}, B=1/chip, bf16 params, depths {depths}")
    curve = {}
    for d in depths:
        cfg = LLaDAConfig.llada_8b(n_layers=d, param_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16,
                                   remat="whole_layer")
        params = init_llada_params(jax.random.key(0), cfg)
        opt = make_optimizer(OptimizerConfig(lr=1e-4), params)
        state = TrainState.create(params, opt)

        def loss_fn(p, batch, key, cfg=cfg):
            ids, labels, t = batch
            logits = llada_forward(p, cfg, ids)
            out = m_interleave_loss(logits, labels, t, msl, n_vq)
            return out["loss"], {"text_loss": out["text_loss"]}

        step = jax.jit(make_train_step(loss_fn, opt), donate_argnums=0)
        ids = jnp.ones((1, L), jnp.int32)
        batch = (ids, ids, jnp.full((1,), 0.5, jnp.float32))
        key = jax.random.key(1)
        holder = [state]
        del params, state

        def run_once(i):
            holder[0], metrics = step(holder[0], batch, key)
            np.asarray(metrics["loss"])

        try:
            curve[d], _ = time_best3(run_once, f"train {d} layers", err)
            err(f"[train {d} layers] step time: {curve[d]:.3f}s")
        except Exception as e:  # deeper depths may not fit 16 GB w/ AdamW
            err(f"[train {d} layers] failed ({type(e).__name__}); skipping")
        # drop every reference to the live state BEFORE the next depth's
        # init runs, or its ~2/3-of-HBM params+moments leak into it
        holder.clear()
        del run_once, holder, opt, step
        import gc
        jax.clear_caches()
        gc.collect()
    if not curve:
        raise RuntimeError("no train depth fit in memory")

    t_8b, method, m_per_layer = extrapolate_depth(curve)
    err(f"8B train step (1 chip, fit): {t_8b:.2f}s "
        f"({m_per_layer and round(m_per_layer, 4)}s/layer marginal)")

    scaling = None
    mc = os.environ.get("BENCH_MULTICHIP", "1")
    if mc not in ("0", "cpu"):
        # replay-first: the A census artifact carries the train-step
        # census; a live census (n_*_forwards=0 -> train-step only) runs
        # only when the artifact is stale/missing, under the budget cap
        census, label, fresh = load_committed_census("a", err)
        mode = os.environ.get("BENCH_CENSUS", "auto")
        if census is not None and (fresh or mode == "replay"):
            scaling = census.get("train_step")
            err(f"[train] census: replayed {label}")
        elif mode == "replay":
            err("[train] census: BENCH_CENSUS=replay but no committed "
                "artifact; skipping live census")
        else:
            try:
                from mmada_parallel_tpu.parallel.multichip_model import (
                    run_in_subprocess)
                budget = float(os.environ.get("BENCH_CENSUS_BUDGET_S",
                                              "900"))
                analysis = run_in_subprocess(backend="tpu", timeout=budget,
                                             n_text_forwards=0,
                                             n_image_forwards=0, q8=False)
                scaling = analysis["train_step"]
            except Exception as e:
                err(f"[train] live census failed ({e!r})")
                if census is not None:
                    scaling = census.get("train_step")
                    err(f"[train] census: replayed {label} (stale)")
    diagnostics = {
        "depth_curve_s": {str(k): round(v, 3) for k, v in curve.items()},
        "extrapolation": method,
        "t_8b_1chip_s": round(t_8b, 3),
        "seq_len": L,
    }
    if scaling is not None and scaling.get("compute_ratio_weak"):
        ratio = scaling["compute_ratio_weak"]
        comm = scaling["comm_seconds_per_call"]
        t_comp = t_8b * ratio
        floor = t_comp + comm
        # schedule-evidenced overlap (same pricing as the edit headline):
        # async FSDP all-gather/reduce-scatter windows in the compiled
        # train module hide comm up to overlap_fraction of compute time
        ov = scaling.get("overlap") or {}
        frac = ov.get("overlap_fraction", 0.0) if ov.get("async_pairs") \
            else 0.0
        t8 = t_comp + max(0.0, comm - frac * t_comp)
        global_batch = 4   # batch_per_device 1 x data 2 x fsdp 2
        diagnostics["multichip"] = {
            "mesh": scaling["mesh"],
            "compute_ratio_weak": round(ratio, 4),
            "comm_seconds_per_step": round(comm, 3),
            "overlap_frac": round(frac, 3),
            "async_pairs": ov.get("async_pairs"),
            "t_step_s_v5e8_no_overlap": round(floor, 3),
            "t_step_s_v5e8": round(t8, 3),
            "global_batch": global_batch,
            "tokens_per_s_v5e8": round(global_batch * L / t8, 1),
            "model": "weak scaling: measured 1-chip step x compiler "
                     "cycle ratio (per-chip batch constant) + census "
                     "ICI time at schedule-evidenced overlap",
        }
        err(f"[train] modeled v5e-8 step: {t8:.2f}s (floor {floor:.2f}s, "
            f"overlap frac {frac:.2f}, "
            f"{diagnostics['multichip']['tokens_per_s_v5e8']} tok/s "
            f"global batch {global_batch})")
        value = round(t8, 3)
        note = ("v5e-8 modeled: weak-scaling cycle ratio + census ICI "
                "time (schedule-evidenced overlap)")
    else:
        value = round(t_8b, 3)
        note = "1-chip measured depth fit"
    payload = {
        "metric": "sec per 8B SFT train step (interleave loss, seq "
                  f"{L}, B=1/chip, bf16, whole-layer remat; {note})",
        "value": value,
        "unit": "s",
        "vs_baseline": None,
        "diagnostics": diagnostics,
    }
    try:
        with open(os.path.join(REPO_DIR, "artifacts",
                               "bench_train.json"), "w") as f:
            json.dump(payload, f, indent=1)
    except OSError as e:
        err(f"[train] artifact write failed ({e!r})")
    print(json.dumps(fit_stdout_budget(payload, err)))


def main():
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.models import LLaDAConfig, init_llada_params
    from mmada_parallel_tpu.samplers import TI2TIOptions, generate_ti2ti
    from mmada_parallel_tpu.utils.compile_cache import (
        enable_compilation_cache)

    enable_compilation_cache()  # repeat runs hit disk, not the remote
    err = lambda *a: print(*a, file=sys.stderr, flush=True)

    # depth curve: measure the edit at these reduced depths and fit
    # t(L) = a + m*L (a: fixed per-edit cost — heads, sampling ops, dispatch;
    # m: per-layer marginal cost).  BENCH_DEPTHS=4 falls back to the r1-style
    # single-depth FLOPs-ratio extrapolation.  16 layers is the deepest that
    # fits one v5e chip in bf16; the driver-default curve measures it so the
    # fit rests on three points.
    depths = [int(x) for x in
              os.environ.get("BENCH_DEPTHS", "4,8,16").split(",")]
    # BENCH_QUANT=int8 switches to the W8A8 path (ops/quant.py) — an opt-in
    # approximation (the dense bf16 path is the parity default), run on the
    # int8 MXU (394 TOPS vs 197 bf16 TFLOP/s); int8_bf16head keeps the
    # vocab head dense (better trajectory fidelity, see ops/quant.py)
    quant = os.environ.get("BENCH_QUANT", "")
    # BENCH_VARIANT=m benchmarks the M interleave path instead (diagnostic;
    # the driver contract headline stays the A edit)
    if os.environ.get("BENCH_VARIANT", "a").lower() == "m":
        return bench_m(depths, quant)
    if os.environ.get("BENCH_CACHED"):
        # the cached sampler rides the M path only; say so rather than
        # silently re-measuring the standard A edit
        raise SystemExit("BENCH_CACHED needs BENCH_VARIANT=m (the "
                         "adaptive feature cache is the interleave "
                         "sampler's knob)")
    # BENCH_SERVE=depth,batch,requests measures the TI2TIServer
    # continuous-batching path (diagnostic)
    serve_env = os.environ.get("BENCH_SERVE", "")
    if serve_env:
        d, b, r = (serve_env.split(",") + ["4", "4", "8"])[:3]
        return bench_serve(int(d), int(b), int(r))
    # BENCH_TRAIN=2,3 (or =1 for the defaults) measures the SFT train step
    # (diagnostic; AdamW moments cap the 1-chip depth)
    train_env = os.environ.get("BENCH_TRAIN", "")
    if train_env:
        td = [2, 3] if train_env == "1" else \
            [int(x) for x in train_env.split(",")]
        return bench_train(td)

    _, _, gh, gw = tk.calculate_vq_params(512, 512, 16)
    prompt = list(range(1000, 1050))
    in_img = [tk.TOKENS_A.vq_offset + 7] * (gh * (gw + 1))
    con_prompt = (prompt[:-1] + [tk.TOKENS_A.boi] + in_img
                  + [tk.TOKENS_A.eoi] + prompt[-1:])
    ids, lay = tk.assemble_ti2ti_sequence(con_prompt, 256, gh, gw, [126355])
    seq = lay.total_len
    err(f"sequence length: {seq}; depths: {depths}")

    opts = TI2TIOptions(text_steps=128, timesteps=64, temperature=1.0,
                        text_temperature=0.7, cfg_scale=0.0, cfg_img=4.0)
    un_img = np.asarray(prompt, np.int32)
    n_forwards = opts.text_steps + opts.timesteps  # cond + 1 uncond branch
    f_tok_layer = backbone_flops_per_token(4096, 12288, 1, 1.0, seq)

    guard = HeadlineGuard(err)
    compile_s = {}
    # bf16-modeled M numbers would be misattributed inside a W8A8-tagged
    # payload, so quant runs drop the cross-variant record (the calib
    # bracket is gated the same way)
    m_summary = (m_variant_summary(err)
                 if os.environ.get("BENCH_MULTICHIP", "1") != "0"
                 and not quant else None)

    def a_payload(curve, replayed, scaling, census_src):
        return build_a_payload(curve, compile_s, replayed, scaling,
                               census_src, quant=quant, seq=seq,
                               n_forwards=n_forwards,
                               f_tok_layer=f_tok_layer, m_variant=m_summary)

    def arm_from(curve, replayed):
        """Cheap (replay-only, no compiles) arm of the timeout guard."""
        try:
            t1 = extrapolate_depth(curve)[0]
            scaling = census_src = None
            if os.environ.get("BENCH_MULTICHIP", "1") != "0":
                census, label, _ = load_committed_census("a", err)
                if census is not None:
                    scaling = predict_from_census(
                        census, t1, chunk_overhead=load_chunk_overhead(err))
                    census_src = f"replayed@{label}"
            p = a_payload(curve, replayed, scaling, census_src)
            guard.arm(p[0], diag=p[1])
        except Exception as e:   # arming must never kill the bench
            err(f"[guard] arm failed ({e!r})")

    replayed, curve, depths = replay_curve_if_unreachable(
        "a", depths, blocked_by="BENCH_QUANT" if quant else "")
    if curve:
        arm_from(curve, replayed)
    for L in depths:
        cfg = LLaDAConfig.llada_8b(n_layers=L, param_dtype=jnp.bfloat16,
                                   compute_dtype=jnp.bfloat16)
        # jit the init: fuses normal->scale->bf16 cast so no f32 param
        # tensor ever materializes (eager init OOMs at 16 layers after the
        # shallower depths' compile caches have fragmented HBM)
        params = jax.jit(lambda k, cfg=cfg: init_llada_params(k, cfg))(
            jax.random.key(0))
        if quant.startswith("int8"):
            from mmada_parallel_tpu.ops.quant import quantize_llada_params
            qh = "bf16head" not in quant
            params = jax.jit(lambda p: quantize_llada_params(
                p, quantize_head=qh))(params)
        run = jax.jit(lambda p, i, k, cfg=cfg: generate_ti2ti(
            p, cfg, i, lay, opts, uncond_image_prefix=un_img, key=k))
        ids_dev = jnp.asarray(ids)[None, :]

        def run_once(i, run=run, params=params):
            fin, _ = run(params, ids_dev, jax.random.key(1 + i))
            np.asarray(fin)

        curve[L], compile_s[L] = time_best3(run_once, f"{L} layers", err)
        err(f"[{L} layers] edit time: {curve[L]:.2f}s; "
            f"{n_forwards / curve[L]:.1f} denoise steps/s/chip")
        del params, run
        import gc
        jax.clear_caches()
        gc.collect()
        arm_from(curve, replayed)   # each depth improves the timeout JSON

    # final headline: replay-first census policy (resolve_census) — the
    # committed v5e:2x4 AOT census artifact replays instantly when its
    # code fingerprint matches; a LIVE census (re-AOT, ~13 min) runs only
    # when the artifact is stale/missing or BENCH_CENSUS=live, bounded by
    # BENCH_CENSUS_BUDGET_S.  BENCH_MULTICHIP=0 keeps the r2-style
    # "assume linear" label.
    t_8b_1chip, _, m_per_layer = extrapolate_depth(curve)
    if m_per_layer is not None:
        err(f"fit: fixed {t_8b_1chip - 32 * m_per_layer:.2f}s + "
            f"{m_per_layer:.3f}s/layer")
    scaling, census_src = resolve_census("a", t_8b_1chip, err)
    if scaling is not None:
        err(f"multichip census [{census_src}]: best mesh "
            f"{scaling['mesh']}; per-edit wire "
            f"{scaling['wire_bytes_per_edit'] / 1e9:.0f} GB -> "
            f"comm {scaling['t_comm_s']:.2f}s; compute model "
            f"{scaling.get('compute_model', 'linear')} "
            f"{scaling.get('compute_ratios')}; modeled v5e-8 edit "
            f"{scaling['t_edit_s_no_overlap']:.2f}s no-overlap / "
            f"{scaling.get('t_edit_s_evidenced', 0):.2f}s modeled "
            "(schedule-evidenced overlap) / "
            f"{scaling['t_edit_s_full_overlap']:.2f}s full-overlap "
            f"({100 * scaling['efficiency_no_overlap']:.0f}% "
            "scaling efficiency floor)")
    payload, verbose, ex = a_payload(curve, replayed, scaling, census_src)
    t1, marginal_tflops, sustained = (ex["t_8b_1chip"],
                                      ex["marginal_tflops"], ex["sustained"])
    if marginal_tflops is not None:
        err(f"marginal backbone throughput {marginal_tflops:.0f} TFLOP/s "
            f"({100 * marginal_tflops * 1e12 / V5E_BF16_PEAK:.0f}% of "
            "v5e bf16 peak)")
    err(f"8B-extrapolated: {t1:.2f}s/edit on 1 chip, "
        f"{payload['value']:.2f}s/edit on v5e-8")
    err(f"sustained at {min(curve)} layers: {sustained / 1e12:.0f} "
        f"TFLOP/s == {100 * sustained / V5E_BF16_PEAK:.0f}% of v5e bf16 "
        "peak (197)")
    guard.emit(payload, diag=verbose)


if __name__ == "__main__":
    main()
