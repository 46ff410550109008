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
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from refresh_census import (CENSUS_CODE_FILES, VARIANTS, artifact_path,
                            census_code_sha)


def _census_sources_dirty():
    """True when any census-relevant source has uncommitted changes."""
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--"] + list(CENSUS_CODE_FILES),
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
    for variant in VARIANTS:
        path = artifact_path(variant)
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
