"""Environment diagnostics (``diffsheg_tpu doctor``).

The reference has no equivalent; on a TPU deployment the failure modes
are environmental — an unreachable remote-attached device (the plugin
blocks forever in ``jax.devices()``), a missing Mosaic backend, a C++
toolchain that cannot build the native data plane, a mis-set platform
env var.  ``doctor`` checks each with a bounded probe and prints one
line per subsystem, so "why is it hanging/slow" is one command instead
of an archaeology session.

Exit code 0 when every check passes, 1 otherwise.
"""

from __future__ import annotations

import importlib
import os
import threading
import time
from typing import List, Optional, Tuple


def _line(ok: Optional[bool], name: str, detail: str) -> str:
    mark = {True: "ok  ", False: "FAIL", None: "warn"}[ok]
    return f"[{mark}] {name:<18} {detail}"


def _versions() -> List[Tuple[Optional[bool], str, str]]:
    out = []
    for mod in ("jax", "jaxlib", "flax", "optax", "orbax.checkpoint",
                "numpy"):
        try:
            m = importlib.import_module(mod)
            out.append((True, mod, getattr(m, "__version__", "?")))
        except Exception as e:  # noqa: BLE001 — report, don't crash doctor
            out.append((False, mod, f"import failed: {e}"))
    return out


def _probe_devices(timeout: float):
    """``jax.devices()`` in a side thread: a dead remote-attach tunnel
    blocks it indefinitely, which is exactly the condition worth
    diagnosing with a bounded wait."""
    result: dict = {}

    def probe():
        try:
            import jax
            result["devices"] = jax.devices()
        except Exception as e:  # noqa: BLE001
            result["error"] = e

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout)
    if t.is_alive():
        return False, (f"TIMED OUT after {timeout:.0f}s — device backend "
                       "unreachable (remote-attach tunnel down?); try "
                       "--platform cpu"), None
    if "error" in result:
        return (False,
                f"{type(result['error']).__name__}: {result['error']}", None)
    devs = result["devices"]
    kinds = sorted({d.device_kind for d in devs})
    return True, (f"{len(devs)} x {'/'.join(kinds)} "
                  f"(platform {devs[0].platform})"), devs[0].platform


def _dispatch_latency() -> Tuple[bool, str]:
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8,))
    f(x).block_until_ready()              # compile
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        f(x).block_until_ready()
    ms = (time.perf_counter() - t0) / reps * 1e3
    note = " (remote-attached: expect ~25ms)" if ms > 5 else ""
    return True, f"{ms:.2f} ms per jitted dispatch{note}"


def _pallas_status(platform: Optional[str]) -> Tuple[Optional[bool], str]:
    """``platform`` comes from the bounded device probe — NEVER call
    ``jax.default_backend()`` here, it initializes the backend and hangs
    exactly when doctor is most needed (dead remote tunnel)."""
    if os.environ.get("DIFFSHEG_NO_PALLAS"):
        return None, "disabled via DIFFSHEG_NO_PALLAS=1 (pure-XLA fallback)"
    try:
        importlib.import_module("jax.experimental.pallas")
    except Exception as e:  # noqa: BLE001
        return False, f"import failed: {e}"
    if platform is None:
        return None, "importable (backend unknown — device probe failed)"
    if platform in ("tpu", "axon"):
        return True, f"available (Mosaic on '{platform}' backend)"
    return True, (f"available (backend '{platform}': kernels run in "
                  "interpret mode / XLA fallback)")


def _dataplane_status() -> Tuple[bool, str]:
    from diffsheg_tpu import runtime

    if runtime.native_available():
        return True, "C++ library built and loaded (threaded gather/parse)"
    return False, ("native library unavailable (g++ build failed?) — "
                   "falling back to numpy paths")


def _compile_cache_status() -> Tuple[Optional[bool], str]:
    if os.environ.get("DIFFSHEG_NO_COMPILE_CACHE"):
        return None, "disabled via DIFFSHEG_NO_COMPILE_CACHE=1"
    from diffsheg_tpu.utils.compile_cache import enable_persistent_cache

    d = enable_persistent_cache()
    if d is None:
        return None, "disabled"
    n = sum(len(files) for _, _, files in os.walk(d))
    return True, f"{d} ({n} cached executables)"


def _calibration_checks() -> List[Tuple[Optional[bool], str, str]]:
    """Execution-sanity probes (``doctor --calibrate``): prove the device
    actually executes at hardware-plausible rates.  A degraded remote
    plugin can serve CPU executables while ``default_backend()`` still
    says "tpu" (round-4 incident) — only timed compute with a forced,
    bounded host readback can tell."""
    from diffsheg_tpu.utils.calibration import calibrate, envelope_for

    res = calibrate(bandwidth=True, allow_cpu=True)
    out: List[Tuple[Optional[bool], str, str]] = []
    if res.backend == "cpu":
        out.append((None, "calibration",
                    "cpu backend — no envelope to enforce"))
        return out
    lo, hi = envelope_for(res.device_kind)
    out.append((res.ok, "calib-compute",
                f"{res.calib_tflops:.1f} TFLOP/s sustained "
                f"(envelope [{lo:.0f}, {hi:.0f}] for {res.device_kind!r})"
                + ("" if res.ok else f" — {res.reason}")))
    out.append((True, "calib-dispatch",
                f"{res.dispatch_ms:.1f} ms round trip"
                + (" (remote-attached: expect ~25-40ms)"
                   if res.dispatch_ms > 5 else "")))
    if res.d2h_mbps or res.h2d_mbps:
        out.append((True, "calib-bandwidth",
                    f"h2d {res.h2d_mbps:.0f} MB/s, "
                    f"d2h {res.d2h_mbps:.0f} MB/s"))
    # execution locality: a degraded service compiling FRESH for the
    # matching host produces a CPU executable with NO loader warning and
    # can pass the envelope probes minutes apart from a CPU-resident
    # program (2026-08-20 incident); host-CPU burn during a blocking call
    # is the per-program discriminator (~0.02 on-device vs ~1.0 on-host)
    try:
        import jax
        import jax.numpy as jnp

        from diffsheg_tpu.utils.calibration import (HOST_EXEC_FRAC_LIMIT,
                                                    host_cpu_fraction)
        f = jax.jit(lambda a, b: (a @ b).sum())
        a = jnp.ones((2048, 2048), jnp.bfloat16)
        f(a, a).block_until_ready()  # compile outside the probe
        wall, frac = host_cpu_fraction(
            lambda: f(a, a).block_until_ready())
        out.append((frac <= HOST_EXEC_FRAC_LIMIT, "calib-locality",
                    f"host_cpu_frac {frac:.3f} over a {wall * 1e3:.1f} ms "
                    f"call (limit {HOST_EXEC_FRAC_LIMIT}; above it the "
                    f"'tpu' program is executing on this host)"))
    except Exception as e:  # noqa: BLE001
        out.append((False, "calib-locality", f"{type(e).__name__}: {e}"))
    return out


def run_doctor(device_timeout: float = 20.0, platform: str = "",
               calibrate: bool = False) -> int:
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    checks: List[Tuple[Optional[bool], str, str]] = []
    for ok, mod, detail in _versions():
        checks.append((ok, mod, detail))
    for k, v in (("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS")),
                 ("XLA_FLAGS", os.environ.get("XLA_FLAGS"))):
        if v:
            checks.append((None, k, f"set: {v!r}"))
    ok, detail, platform_seen = _probe_devices(device_timeout)
    checks.append((ok, "devices", detail))
    if ok:
        try:
            lat_ok, lat_detail = _dispatch_latency()
            checks.append((lat_ok, "dispatch", lat_detail))
        except Exception as e:  # noqa: BLE001
            checks.append((False, "dispatch", f"{type(e).__name__}: {e}"))
    pk, pd = _pallas_status(platform_seen)
    checks.append((pk, "pallas", pd))
    try:
        dk, dd = _dataplane_status()
    except Exception as e:  # noqa: BLE001
        dk, dd = False, f"{type(e).__name__}: {e}"
    checks.append((dk, "dataplane", dd))
    try:
        ck, cd = _compile_cache_status()
    except Exception as e:  # noqa: BLE001
        ck, cd = False, f"{type(e).__name__}: {e}"
    checks.append((ck, "compile-cache", cd))
    if calibrate and ok:
        try:
            checks.extend(_calibration_checks())
        except Exception as e:  # noqa: BLE001
            checks.append((False, "calibration",
                           f"{type(e).__name__}: {e}"))
    elif calibrate:
        checks.append((False, "calibration",
                       "skipped — device probe failed"))

    failed = False
    for ok, name, detail in checks:
        print(_line(ok, name, detail))
        failed |= ok is False
    print(_line(not failed, "doctor", "all checks passed" if not failed
                else "some checks FAILED"))
    return 1 if failed else 0
