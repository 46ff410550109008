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
# keep tests hermetic: CLI mains call enable_compilation_cache(), which
# would point the suite at the real-TPU bench's persistent cache dir
# (foreign-machine CPU AOT entries load with feature-mismatch warnings)
os.environ["MMADA_TPU_NO_COMPILE_CACHE"] = "1"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import hashlib  # noqa: E402

import pytest  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: long-running closure tests (train-to-convergence demos, "
        "ring-TP e2e suites, reference-code-in-the-loop parity).  Fast "
        "tier: `pytest -m 'not heavy'` (<10 min); plain `pytest tests/` "
        "runs everything.")


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
