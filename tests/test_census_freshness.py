"""Guard: committed census artifacts must match committed census sources.

Round 3's top operational defect was a bench artifact the driver could
not parse; since r4 ``bench.py`` instead REPLAYS the committed
``artifacts/census_v5e8_{a,m}.json`` whenever their ``code_sha`` matches
the census-relevant sources (``tools/refresh_census.py``), and pays a
bounded ~13-min live census otherwise.  A stale artifact in a clean
tree is therefore a committed inconsistency: every driver bench run
would silently burn its census budget.  This test fails on that state.

While census sources carry *uncommitted* edits the staleness is just
work-in-progress (the refresh costs ~26 min, far too slow for the dev
loop), so the test SKIPS — loudly — instead of failing.  Run
``/opt/venv/bin/python tools/refresh_census.py`` before committing
changes to any file in ``CENSUS_CODE_FILES``.
"""

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# import by explicit file path (not sys.path.insert) so a generically
# named module later added to tools/ can't shadow imports in other tests
import importlib.util  # noqa: E402

_spec = importlib.util.spec_from_file_location(
    "refresh_census", os.path.join(REPO, "tools", "refresh_census.py"))
_rc = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_rc)
CENSUS_CODE_FILES = _rc.CENSUS_CODE_FILES
VARIANTS = _rc.VARIANTS
artifact_path = _rc.artifact_path
census_code_sha = _rc.census_code_sha


def _census_sources_dirty():
    """True when any census-relevant source has uncommitted changes.

    ``census_code_sha()`` also depends on tools/refresh_census.py itself
    (it holds the CENSUS_CODE_FILES list), so a WIP edit there must count
    as dirty too — otherwise the test FAILS instead of skipping."""
    watched = list(CENSUS_CODE_FILES) + ["tools/refresh_census.py"]
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--"] + watched,
            cwd=REPO, capture_output=True, text=True, timeout=30)
    except (OSError, subprocess.TimeoutExpired):
        return True   # can't tell -> don't fail the suite on a guess
    if out.returncode != 0:
        return True
    return bool(out.stdout.strip())


def test_committed_census_artifacts_are_fresh():
    import json

    sha = census_code_sha()
    stale = []
    paths = [artifact_path(v) for v in VARIANTS]
    # the cycle-calibration table (tools/calibrate_cycles.py) hangs off
    # the same sources: stale means the headline's error bracket is
    # computed from an outdated compiled program
    paths.append(os.path.join(REPO, "artifacts", "cycle_calibration.json"))
    for path in paths:
        try:
            with open(path) as f:
                got = json.load(f)["_meta"]["code_sha"]
        except (OSError, KeyError, ValueError):
            got = "<missing>"
        if got != sha:
            stale.append(f"{os.path.basename(path)} ({got} != {sha})")
    if not stale:
        return
    if _census_sources_dirty():
        pytest.skip(
            "census artifacts stale but census sources have uncommitted "
            "edits (work in progress): " + ", ".join(stale) + " — run "
            "tools/refresh_census.py before committing")
    pytest.fail(
        "committed census artifacts are STALE vs committed sources — every "
        "driver bench run will pay a bounded live census instead of the "
        "instant replay: " + ", ".join(stale) + ". Fix: "
        "/opt/venv/bin/python tools/refresh_census.py && git add artifacts/")
