"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax import — pytest imports conftest before test modules,
and no module imports jax at collection time before this executes.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU tests deterministic and fast.
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 0
