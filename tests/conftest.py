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

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
