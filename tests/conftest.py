"""Test configuration: force an 8-device virtual CPU mesh.

The environment's TPU plugin ignores the ``JAX_PLATFORMS`` env var, so the
platform must also be forced through ``jax.config`` before any computation.
Running tests on CPU keeps them deterministic, hermetic, and lets
``xla_force_host_platform_device_count`` provide 8 virtual devices for the
sharding tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float32 matmul accuracy for numerical oracles (TPU-style bf16 default
# otherwise leaks in on some builds).
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 0
