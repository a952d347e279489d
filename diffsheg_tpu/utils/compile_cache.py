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
    candidates = []
    if cache_dir is not None:
        candidates.append(cache_dir)
    else:
        repo_root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        candidates.append(os.path.join(repo_root, ".cache", "xla"))
        candidates.append(os.path.join(
            os.path.expanduser("~"), ".cache", "diffsheg_tpu", "xla"))
    for cand in candidates:
        try:
            os.makedirs(cand, exist_ok=True)
        except OSError:
            continue  # e.g. read-only site-packages install
        import jax

        jax.config.update("jax_compilation_cache_dir", cand)
        # cache anything that took meaningful compile time
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return cand
    return None


def purge_persistent_cache() -> int:
    """Delete every entry in the active persistent cache directory.

    Needed because the cache can be POISONED: when the remote compile
    service degrades it returns XLA:CPU AOT executables under the TPU
    key (round-4 incident), the cache stores them, and every later
    process — including ones running while the service is healthy —
    silently replays host-CPU execution from the cache (measured: the
    3372-FPS serving pipeline at 26 FPS with ``cpu_aot_loader.cc``
    load warnings).  Returns the number of entries removed.
    """
    import jax

    d = jax.config.jax_compilation_cache_dir
    if not d or not os.path.isdir(d):
        return 0
    n = 0
    for name in os.listdir(d):
        p = os.path.join(d, name)
        try:
            if os.path.isfile(p):
                os.remove(p)
                n += 1
        except OSError:
            pass
    return n
