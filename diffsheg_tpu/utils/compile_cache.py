"""Persistent XLA compilation cache.

The serving pipeline compiles once per (audio length, batch) signature;
on a remote-attached TPU that compile is minutes.  JAX's persistent
compilation cache survives process restarts (verified on this
environment's axon backend), so cold-start cost is paid once per machine,
not once per process — the production behaviour a serving deployment
expects.

Enabled by the CLI and the benchmarks; opt out with
DIFFSHEG_NO_COMPILE_CACHE=1 or redirect with DIFFSHEG_COMPILE_CACHE=<dir>.

Caveat observed on this development environment: its remote-compile TPU
plugin serves small executables from the cache but recompiles the large
Mosaic-containing serving pipeline; on standard TPU runtimes the cache
covers those too, so it stays enabled.
"""

from __future__ import annotations

import os


def enable_persistent_cache(default_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a stable directory.

    Call before the first compilation.  Returns the directory in use, or
    None when disabled.
    """
    if os.environ.get("DIFFSHEG_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get("DIFFSHEG_COMPILE_CACHE") or default_dir
    if cache_dir is None:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        cache_dir = os.path.join(repo_root, ".cache", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache anything that took meaningful compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
