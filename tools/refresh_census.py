"""Regenerate the committed v5e-8 census artifacts (``artifacts/``).

The census is DETERMINISTIC given the code: it AOT-compiles the sharded
8B programs for a ``v5e:2x4`` topology via the local libtpu compile-only
client (no tunnel, no chip; ~13 min per variant on this host) and walks
the HLO for collectives/cycles.  bench.py therefore replays the committed
artifact at driver time (instant) instead of recompiling, and each
artifact carries a ``code_sha`` fingerprint of the census-relevant
sources so bench.py can tell a fresh replay from a stale one.

Run after changing any file in :data:`CENSUS_CODE_FILES`:

    /opt/venv/bin/python tools/refresh_census.py [a|m|all]

``--check`` just compares each committed artifact's ``code_sha`` to the
current sources (exit 1 if any is stale) without recompiling anything.
"""

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Sources the census output depends on: the census/compile machinery, the
# ring decomposition it compiles, and the model it shards.  A docstring
# edit false-invalidates — the cost is one bounded live-census attempt at
# bench time (or a rerun of this script), never a wrong number.
CENSUS_CODE_FILES = [
    "mmada_parallel_tpu/parallel/multichip_model.py",
    "mmada_parallel_tpu/parallel/tp_overlap.py",
    "mmada_parallel_tpu/parallel/mesh.py",
    "mmada_parallel_tpu/models/llada.py",
    # the kernel-true ring modules compile attention_impl="pallas": the
    # dispatch gates and the Mosaic kernel shape the censused HLO too
    "mmada_parallel_tpu/ops/attention.py",
    "mmada_parallel_tpu/ops/rope_attention.py",
]

# (variant -> run_in_subprocess kwargs) — must mirror what bench.py's
# corresponding path would pass for a live census.
VARIANTS = {
    "a": dict(seq=2424, n_text_forwards=128, n_image_forwards=64, q8=True),
    "m": dict(seq=2344, n_text_forwards=0, n_image_forwards=158, q8=False),
}


def census_code_sha() -> str:
    h = hashlib.sha256()
    for rel in CENSUS_CODE_FILES:
        with open(os.path.join(REPO, rel), "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def artifact_path(variant: str) -> str:
    return os.path.join(REPO, "artifacts", f"census_v5e8_{variant}.json")


def refresh(variant: str, timeout: int = 3600) -> str:
    from mmada_parallel_tpu.parallel.multichip_model import run_in_subprocess

    kw = VARIANTS[variant]
    t0 = time.time()
    out = run_in_subprocess(backend="tpu", timeout=timeout, **kw)
    out["_meta"] = {"kind": "census", "variant": variant,
                    "backend": "tpu-aot-v5e:2x4",
                    "code_sha": census_code_sha(),
                    "wall_s": round(time.time() - t0, 1), **kw}
    path = artifact_path(variant)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[{variant}] census refreshed in {time.time() - t0:.0f}s "
          f"-> {path} (code_sha {out['_meta']['code_sha']})",
          file=sys.stderr)
    return path


def check() -> bool:
    sha = census_code_sha()
    ok = True
    for v in VARIANTS:
        path = artifact_path(v)
        try:
            with open(path) as f:
                got = json.load(f)["_meta"]["code_sha"]
        except (OSError, KeyError, ValueError):
            got = "<missing>"
        fresh = got == sha
        ok = ok and fresh
        print(f"[{v}] {path}: artifact {got} vs current {sha} -> "
              f"{'FRESH' if fresh else 'STALE'}")
    return ok


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which == "--check":
        sys.exit(0 if check() else 1)
    for v in (VARIANTS if which == "all" else [which]):
        refresh(v)
