"""Regenerate ``artifacts/cycle_calibration.json``: the 1-chip cycle
table that calibrates the census's cycles->seconds translation.

AOT-compiles the 1-chip edit program (local libtpu compile-only client,
v5e topology device — no tunnel, no chip) at the bench's measured depths
(4/8/16) x batch sizes (1, 2) and stores the parsed ``(body, entry)``
compiler cycle estimates.  bench.py fits ``seconds = k * cycles(L)``
against the LIVE measured depth curve at bench time and attaches the
residual as the headline's error bracket
(``parallel/calibration.py``; VERDICT r4 weak #4).  ~40 s per compile,
6 compiles total.

    /opt/venv/bin/python tools/calibrate_cycles.py

Rerun after changing any census-relevant source (same list as
tools/refresh_census.py — the artifact stores that ``code_sha``).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEPTHS = (4, 8, 16)
SEQ = 2424


def artifact_path() -> str:
    return os.path.join(REPO, "artifacts", "cycle_calibration.json")


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")  # AOT only; never touch TPU

    from mmada_parallel_tpu.utils.compile_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "refresh_census", os.path.join(REPO, "tools", "refresh_census.py"))
    rc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rc)

    from mmada_parallel_tpu.parallel.calibration import (calibrate,
                                                         collect_cycle_table)

    t0 = time.time()
    table = collect_cycle_table(DEPTHS, seq=SEQ)
    # self-check against the last committed measured curve (r4): the
    # artifact records what the calibration looked like at refresh time;
    # bench recomputes against its own live curve.
    r4_curve = {4: 5.446, 8: 10.379, 16: 20.243}
    calib = calibrate(table, r4_curve)
    out = {
        "table": table,
        "_meta": {
            "kind": "cycle_calibration",
            "backend": "tpu-aot-v5e-1chip",
            "seq": SEQ,
            "depths": list(DEPTHS),
            "code_sha": rc.census_code_sha(),
            "wall_s": round(time.time() - t0, 1),
            "calibration_vs_r4_curve": calib,
        },
    }
    path = artifact_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"cycle table refreshed in {time.time() - t0:.0f}s -> {path}",
          file=sys.stderr)
    print(json.dumps(calib, indent=1), file=sys.stderr)


if __name__ == "__main__":
    main()
