"""Test configuration: force an 8-device virtual CPU mesh.

The environment's TPU plugin ignores the ``JAX_PLATFORMS`` env var, so the
platform must also be forced through ``jax.config`` before any computation.
Running tests on CPU keeps them deterministic, hermetic, and lets
``xla_force_host_platform_device_count`` provide 8 virtual devices for the
sharding tests.

Suite wall-clock on a single CPU core is dominated by XLA:CPU *compiles*
(the models under test are tiny), so two compile-side levers are on by
default here:

  * ``--xla_backend_optimization_level=0`` — tests assert numerics via
    tolerances or same-process comparisons, not via optimized-binary
    speed; measured ~1.7x faster cold compiles on the heaviest test.
  * a tests-only persistent compilation cache (``.cache/xla_tests``,
    gitignored) — repeat runs load executables instead of recompiling;
    measured ~2.1x on the heaviest test, larger suite-wide.
    Opt out with ``DIFFSHEG_NO_TEST_COMPILE_CACHE=1`` (the cold numbers
    in README were measured that way).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# float32 matmul accuracy for numerical oracles (TPU-style bf16 default
# otherwise leaks in on some builds).
jax.config.update("jax_default_matmul_precision", "highest")

if not os.environ.get("DIFFSHEG_NO_TEST_COMPILE_CACHE"):
    _cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache", "xla_tests")
    try:
        os.makedirs(_cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except OSError:
        pass

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_seed():
    return 0
