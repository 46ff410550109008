"""Measure the ring-TP per-chunk scheduling overhead on the real chip and
commit it as ``artifacts/chunk_overhead.json``.

See :mod:`mmada_parallel_tpu.parallel.chunk_proxy` for what is measured
(the literal per-chip ring schedule with identity permute vs the
FLOP-identical monolithic program, per-layer marginal).  bench.py folds
the committed factor into ring-mesh compute terms
(``predict_edit_scaling(chunk_overhead=...)``) and records it as
``diagnostics.multichip.chunk_overhead_measured``.

Run on the axon-tunnel host (needs the real chip):

    /opt/venv/bin/python tools/measure_chunk_overhead.py
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = [
    # one chip of the headline data2_fsdp1_tensor4_sq_ring mesh
    dict(g=4, batch=1, seq=2424, depths=(4, 12)),
    # one chip of the data1_fsdp1_tensor8_ring mesh (B=2 rows everywhere)
    dict(g=8, batch=2, seq=2424, depths=(4, 12)),
]


def main():
    import jax

    from mmada_parallel_tpu.parallel.chunk_proxy import (
        measure_chunk_overhead)
    from mmada_parallel_tpu.utils.compile_cache import (
        enable_compilation_cache)

    enable_compilation_cache()
    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    platform = jax.devices()[0].platform
    if platform != "tpu":
        err(f"WARNING: default backend is {platform!r}, not tpu — the "
            "committed artifact must come from the real chip")
    entries = {}
    t0 = time.time()
    for kw in CONFIGS:
        m = measure_chunk_overhead(err=err, **kw)
        entries[f"g{kw['g']}_B{kw['batch']}"] = m
        import gc
        jax.clear_caches()
        gc.collect()
    out = {"entries": entries,
           "_meta": {"kind": "chunk_overhead", "platform": platform,
                     "wall_s": round(time.time() - t0, 1)}}
    path = os.path.join(REPO, "artifacts", "chunk_overhead.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    err(f"wrote {path} in {time.time() - t0:.0f}s")
    print(json.dumps({k: round(v["factor"], 4)
                      for k, v in entries.items()}))


if __name__ == "__main__":
    main()
