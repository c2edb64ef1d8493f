"""Test harness: force JAX onto 8 virtual CPU devices (SURVEY.md §4).

Must run before jax initializes its backends, hence env manipulation at
import time. All tests are CPU-runnable; multi-device tests see an 8-device
mesh exactly like a v5e-8 slice topology-wise.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flag is
# honored. Must run before any backend initialization.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, devs
    return devs
