"""Test configuration: force an 8-device CPU mesh before jax initializes.

Multi-chip sharding logic is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``); real-TPU behaviour is covered
by ``bench.py`` and the driver's compile checks.
"""

import os

# NOTE: under the axon TPU tunnel, sitecustomize force-sets
# jax_platforms="axon,cpu" at interpreter boot, so the env var alone is NOT
# enough — the config must be updated after import, before first device use.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
# Persistent compile cache for the whole session, in a TESTS-OWN dir:
# warm reruns skip the big CPU compiles (the dominant fast-tier cost on
# this one-core host), and the real-TPU bench cache dir stays untouched.
# CLI mains that call enable_compilation_cache() pick the same dir up via
# the env var, so they can't re-point the session mid-run.
_test_cache = os.path.join(os.path.expanduser("~"), ".cache",
                           "mmada_parallel_tpu", "xla_cpu_tests")
os.environ.setdefault("MMADA_TPU_COMPILE_CACHE", _test_cache)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from mmada_parallel_tpu.utils.compile_cache import \
    enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import hashlib  # noqa: E402

import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: long-running closure tests (train-to-convergence demos, "
        "ring-TP e2e suites, reference-code-in-the-loop parity).  Fast "
        "tier: `pytest -m 'not heavy'` (~9 min warm compile cache); "
        "plain `pytest tests/` runs everything.")


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]


def fixture_store_path(name: str, sources, **kwargs) -> str:
    """Cache path for a trained-fixture ``.npz``, keyed by the sha of the
    SOURCES that shape the trained params (the demo script + the training
    stack it exercises) and the run kwargs — any change to those retrains;
    an unchanged stack reuses the converged params and the test session
    drops the two ~4-minute convergence runs.  The cached fixture's eval
    asserts still run, so a stale-but-loadable cache can only PASS if the
    current inference stack still solves the task with those weights."""
    h = hashlib.sha256()
    for rel in sources:
        with open(os.path.join(REPO, rel), "rb") as f:
            h.update(f.read())
    h.update(repr(sorted(kwargs.items())).encode())
    cache = os.path.join(os.path.expanduser("~"), ".cache",
                         "mmada_parallel_tpu", "fixtures")
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, f"{name}_{h.hexdigest()[:16]}.npz")
