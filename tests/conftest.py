"""Test configuration: force an 8-device CPU mesh before jax initializes.

Multi-chip sharding logic is validated on a virtual CPU mesh
(``--xla_force_host_platform_device_count=8``); real-TPU behaviour is covered
by ``bench.py`` and the driver's compile checks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    return devs[:8]
