"""Shared validity guards for throughput benchmarks.

Every benchmark that publishes a JSON artifact on the remote-attached TPU
must refuse to certify a degraded backend (see utils/calibration.py for
the incident history).  This module packages the three-step discipline
``bench.py`` established so satellite benchmarks (``examples/show_bench``
and friends) enforce the same rules without duplicating the flow:

1. :func:`calibrate_or_exit` — backend-level probe (achieved TFLOP/s vs
   the device kind's physical envelope), JSON + nonzero rc on failure;
2. :func:`build_guarded` — per-program probe around build+warmup: the
   CPU-AOT load signature on fd 2 OR a host-execution locality breach
   triggers ONE purge-and-recompile retry, then a loud invalid exit;
3. :func:`timed_reps` — the measured loop, returning per-rep wall times
   plus the host-CPU fraction over the whole block for the artifact.

There is no reference equivalent (the reference trusts CUDA timings);
this is a consequence of benchmarking through a tunnel whose health
varies by the hour.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Callable, Tuple

from diffsheg_tpu.utils.calibration import (CPU_AOT_SIGNATURE,
                                            HOST_EXEC_FRAC_LIMIT,
                                            CalibrationResult, calibrate,
                                            host_cpu_fraction, scan_stderr)


def calibrate_or_exit(metric: str, unit: str = "frames/s",
                      allow_cpu: bool = False) -> CalibrationResult:
    """Run the backend calibration; on failure print an invalid artifact
    (``value`` 0, ``valid: false``) and exit nonzero."""
    calib = calibrate(allow_cpu=allow_cpu)
    print(f"calibration[{calib.backend}/{calib.device_kind}]: "
          f"{calib.calib_tflops:.1f} TFLOP/s sustained, "
          f"dispatch {calib.dispatch_ms:.1f} ms"
          + ("" if calib.ok else f"  INVALID: {calib.reason}"),
          file=sys.stderr)
    if not calib.ok:
        print(json.dumps({"metric": metric, "value": 0.0, "unit": unit,
                          "vs_baseline": 0.0, **calib.json_fields()}))
        sys.exit(1)
    return calib


def build_guarded(build_and_warm: Callable[[], object],
                  probe_call: Callable[[object], None],
                  retry: Callable[[], None],
                  metric: str, calib: CalibrationResult,
                  unit: str = "frames/s",
                  max_probe_wall: float = float("inf")):
    """Build + warm a pipeline with per-program fallback detection.

    ``build_and_warm()`` constructs and warms the program(s) under test;
    ``probe_call(built)`` runs ONE blocking call of the program that will
    be timed.  On a load-signature hit, a locality breach, or a probe
    call slower than ``max_probe_wall`` (the plausibility floor that
    catches REMOTE-side CPU fallback — no local warning, idle local
    process, impossibly slow call), ``retry()`` is invoked (purge caches
    / clear executables) and the build runs once more; a second detection
    prints an invalid artifact and exits 1.  Returns the built object.
    """
    for attempt in (0, 1):
        with scan_stderr() as scan:
            built = build_and_warm()
        if calib.backend == "cpu":
            return built  # honest-CPU run: host execution is expected
        if scan.found(CPU_AOT_SIGNATURE):
            reason = (f"XLA:CPU AOT loader signature at executable load "
                      f"({scan.count(CPU_AOT_SIGNATURE)} loads)")
        else:
            wall, frac = host_cpu_fraction(lambda: probe_call(built))
            print(f"execution-locality probe: wall={wall:.3f}s "
                  f"host_cpu_frac={frac:.3f} (limit {HOST_EXEC_FRAC_LIMIT}) "
                  f"max_wall={max_probe_wall:.1f}s", file=sys.stderr)
            if frac <= HOST_EXEC_FRAC_LIMIT and wall <= max_probe_wall:
                return built
            reason = ((f"program executes on the host CPU "
                       f"(host_cpu_frac={frac:.2f} over a {wall:.2f}s "
                       f"call)") if frac > HOST_EXEC_FRAC_LIMIT else
                      (f"probe call took {wall:.1f}s > {max_probe_wall:.1f}s "
                       f"plausibility floor — remote-side CPU fallback"))
        if attempt == 0:
            print(f"CPU fallback detected at warmup ({reason}) — "
                  f"purging and recompiling fresh in-process",
                  file=sys.stderr)
            retry()
            continue
        print(json.dumps({
            "metric": metric, "value": 0.0, "unit": unit,
            "vs_baseline": 0.0, **calib.json_fields(),
            "valid": False,
            "invalid_reason": "benched program runs on the host CPU even "
                              "after a fresh compile — degraded compile "
                              f"service: {reason}",
        }))
        sys.exit(1)


def timed_reps(call: Callable[[int], object], n: int) -> Tuple[list, float]:
    """Time ``call(i).block_until_ready()`` for i in range(n).

    Returns (per-rep wall seconds, host_cpu_frac over the whole block).
    """
    totals = []
    c0, w0 = time.process_time(), time.perf_counter()
    for i in range(n):
        t0 = time.perf_counter()
        out = call(i)
        out.block_until_ready()
        totals.append(time.perf_counter() - t0)
    frac = (time.process_time() - c0) / max(time.perf_counter() - w0, 1e-9)
    return totals, frac
