"""On-chip op-level breakdown of the benchmark A edit (VERDICT r3 #8).

Takes a ``jax.profiler`` device trace of ONE bench-config edit at reduced
depth and aggregates XLA-op self-time into components (backbone GEMMs,
attention kernel, vocab heads, sampling ops, ...), so the fixed-vs-marginal
split from the depth-curve fit gets a measured *composition*:

    /opt/venv/bin/python tools/profile_edit_breakdown.py [--layers 4]

Writes ``artifacts/profile_breakdown_a.json`` and prints the category
table.  The trace is parsed with the installed ``xprof`` converter
(the TensorBoard profile plugin's backend) — no TensorBoard UI needed.
If the axon relay yields no device plane, the script says so and exits
nonzero rather than fabricating numbers.
"""

import argparse
import glob
import json
import os
import re
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_run(n_layers: int):
    """The exact bench.py A-edit program at reduced depth."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mmada_parallel_tpu import tokens as tk
    from mmada_parallel_tpu.models import LLaDAConfig, init_llada_params
    from mmada_parallel_tpu.samplers import TI2TIOptions, generate_ti2ti

    _, _, gh, gw = tk.calculate_vq_params(512, 512, 16)
    prompt = list(range(1000, 1050))
    in_img = [tk.TOKENS_A.vq_offset + 7] * (gh * (gw + 1))
    con_prompt = (prompt[:-1] + [tk.TOKENS_A.boi] + in_img
                  + [tk.TOKENS_A.eoi] + prompt[-1:])
    ids, lay = tk.assemble_ti2ti_sequence(con_prompt, 256, gh, gw, [126355])
    opts = TI2TIOptions(text_steps=128, timesteps=64, temperature=1.0,
                        text_temperature=0.7, cfg_scale=0.0, cfg_img=4.0)
    un_img = np.asarray(prompt, np.int32)

    cfg = LLaDAConfig.llada_8b(n_layers=n_layers, param_dtype=jnp.bfloat16,
                               compute_dtype=jnp.bfloat16)
    params = jax.jit(lambda k: init_llada_params(k, cfg))(jax.random.key(0))
    run = jax.jit(lambda p, i, k: generate_ti2ti(
        p, cfg, i, lay, opts, uncond_image_prefix=un_img, key=k))
    i_dev = jnp.asarray(ids)[None]

    def run_once(i=0):
        fin, _ = run(params, i_dev, jax.random.key(1 + i))
        np.asarray(fin)
    return run_once, lay.total_len


def parse_trace(trace_dir: str):
    """Return the ``hlo_stats`` rows (list of dicts) from the xplane dump.

    The xprof converter emits a gviz DataTable JSON (the ``tqx`` CSV knob
    is ignored); ``hlo_stats`` carries per-HLO-op device self-time, the
    compiler's own op category, the JAX ``tf_op_name`` trace path, and a
    ``source_info`` file:line attribution.
    """
    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise RuntimeError(f"no xplane.pb under {trace_dir}")
    tools = rtd.xspace_to_tool_names(paths)
    print(f"[trace] planes: {paths}\n[trace] tools: {tools}",
          file=sys.stderr)
    if "hlo_stats" not in tools:
        raise RuntimeError(f"no hlo_stats tool among {tools}")
    data, _ = rtd.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    cols = [c["id"] for c in tbl["cols"]]
    rows = [{k: c["v"] if c else None
             for k, c in zip(cols, r["c"])} for r in tbl["rows"]]
    if not rows:
        raise RuntimeError("hlo_stats table empty")
    return rows


# The layer-scan body shows up as a SECOND while level in the JAX op path
# (outer while = sampler step loop, inner while = lax.scan over stacked
# layers) — ops there scale with depth ("marginal"); everything else
# (vocab heads, sampling/top-k/rng, copies) is the per-edit fixed cost.
_MARGINAL_RE = re.compile(r"while/body.*while/body")
_SRC_RE = re.compile(r">([^<>]+\.(?:py|cc):\d+)<")


def aggregate_hlo(rows):
    by_cat, by_src, split = {}, {}, {"marginal_per_layer": 0.0,
                                     "fixed_per_edit": 0.0}
    total = 0.0
    for r in rows:
        t = float(r.get("total_self_time") or 0.0)
        if t <= 0.0:
            continue
        total += t
        cat = str(r.get("category") or "unknown")
        by_cat[cat] = by_cat.get(cat, 0.0) + t
        m = _SRC_RE.search(str(r.get("source_info") or ""))
        src = m.group(1).replace("/root/repo/", "") if m else "(no source)"
        by_src[src] = by_src.get(src, 0.0) + t
        kind = ("marginal_per_layer"
                if _MARGINAL_RE.search(str(r.get("tf_op_name") or ""))
                else "fixed_per_edit")
        split[kind] += t
    return by_cat, by_src, split, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--out", default=os.path.join(
        REPO, "artifacts", "profile_breakdown_a.json"))
    ap.add_argument("--trace_dir", default=None,
                    help="parse an existing trace instead of re-running; "
                         "pass steady/traced wall via --steady/--traced")
    ap.add_argument("--steady", type=float, default=None)
    ap.add_argument("--traced", type=float, default=None)
    args = ap.parse_args()

    if args.trace_dir:
        if args.steady is None or args.traced is None:
            ap.error("--trace_dir needs --steady and --traced (wall "
                     "seconds of the original runs) before the minutes "
                     "of trace parsing start")
        trace_dir, steady, traced = args.trace_dir, args.steady, args.traced
        dev, seq = "(reparsed trace)", None
    else:
        import jax
        from mmada_parallel_tpu.utils.compile_cache import (
            enable_compilation_cache)
        enable_compilation_cache()

        dev = jax.devices()[0]
        print(f"[device] {dev} platform={dev.platform}", file=sys.stderr)
        run_once, seq = build_run(args.layers)
        t0 = time.time()
        run_once(0)                      # compile + 1st run
        print(f"[compile+run] {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        run_once(1)                      # steady state, untraced
        steady = time.time() - t0
        print(f"[steady] {steady:.2f}s", file=sys.stderr)

        import jax.profiler
        trace_dir = tempfile.mkdtemp(prefix="edit_trace_")
        with jax.profiler.trace(trace_dir):
            t0 = time.time()
            run_once(2)
            traced = time.time() - t0
        print(f"[traced run] {traced:.2f}s; trace in {trace_dir}",
              file=sys.stderr)

    rows = parse_trace(trace_dir)
    by_cat, by_src, split, total = aggregate_hlo(rows)
    gemm_rates = [float(r["normalized_flop_rate"]) for r in rows
                  if "convolution" in str(r.get("category") or "")
                  and float(r.get("normalized_flop_rate") or 0) > 0]
    out = {
        "_meta": {"kind": "edit-op-breakdown", "layers": args.layers,
                  "seq": seq, "steady_wall_s": round(steady, 3),
                  "traced_wall_s": round(traced, 3),
                  "device": str(dev)},
        "device_self_time_us_by_category":
            {k: round(v, 1) for k, v in
             sorted(by_cat.items(), key=lambda kv: -kv[1])},
        "device_self_time_us_by_source":
            {k: round(v, 1) for k, v in
             sorted(by_src.items(), key=lambda kv: -kv[1])[:20]},
        "fixed_vs_marginal_us": {k: round(v, 1) for k, v in split.items()},
        "device_total_us": round(total, 1),
        "device_busy_frac_of_wall": round(total / 1e6 / traced, 4),
        "gemm_flop_rate_gflops": {
            "max": round(max(gemm_rates), 1) if gemm_rates else None,
            "weighted_note": "per-op normalized_flop_rate from the "
                             "compiler; body GEMMs cluster at the top",
        },
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
