"""Backend calibration probe: prove the device is what it claims to be.

Why this exists — the round-4 incident: the remote-attach TPU plugin
silently degraded to serving **XLA:CPU AOT executables** while
``jax.default_backend()`` still answered ``"tpu"``.  In that mode a
4096^3 bf16 matmul "completed" in 0.04 ms (an impossible 3179 TFLOP/s,
8x the v5e's 394 peak) because ``block_until_ready()`` returned without
executing anything, and any forced host readback of the result hung
forever.  The benchmark accepted the broken timings and published a
sub-baseline number with exit code 0.

The only trustworthy certificate is a *timed computation whose result is
forced back to the host* (with a bounded wait, since the failure mode is
a hang).  This module runs three probes and checks the achieved numbers
against a physical envelope for the reported device kind:

1. dispatch: a trivial jitted op with full readback -> round-trip ms;
2. compute: K chained ``N x N`` bf16 matmuls under one ``lax.scan`` (so
   the tunnel round-trip is amortized), small-slice readback, value
   checked -> sustained TFLOP/s.  A CPU masquerading as a v5e lands
   ~0.05-1 TFLOP/s; a fake-async executor either hangs the readback or
   reports a rate above the hardware peak.  Both fail the envelope.
3. bandwidth (optional, ``doctor --calibrate``): timed host->device put
   and device->host get of an 8 MiB buffer.

Consumers: ``bench.py`` refuses to certify a throughput headline when
calibration fails (nonzero rc, ``valid: false`` in the JSON artifact);
``diffsheg_tpu doctor --calibrate`` prints the same numbers for
operators, so "slow model" vs "broken backend" is one command.

There is no reference equivalent (the reference trusts CUDA timings,
trainers/ddpm_beat_trainer.py:1243-1315); this guard is a consequence of
running behind a remote-attach tunnel whose health varies by day.
"""

from __future__ import annotations

import contextlib
import dataclasses
import os
import sys
import threading
import time
from typing import Optional, Tuple

import numpy as np

# The load-time signature of the round-4 degraded mode: an executable the
# runtime believes is a TPU program is actually an XLA:CPU AOT result
# (compiled remotely, executed on this host).  Printed by XLA's
# cpu_aot_loader.cc at executable load.  This is per-PROGRAM — the matmul
# calibration probe can pass while the serving pipeline silently lands on
# the host (observed: calibration 114 TFLOP/s, pipeline 26 FPS), e.g.
# when a poisoned persistent-cache entry is replayed — so consumers must
# scan the load of the exact program they are about to time.
CPU_AOT_SIGNATURE = "Loading XLA:CPU AOT result"

# Execution-locality limit for host_cpu_fraction(): a program executing on
# the TPU behind the tunnel leaves the local process ~idle while it blocks
# (measured 0.02 on the calibration matmul at 113 TFLOP/s), while XLA:CPU
# execution burns local CPU ~= wall time (measured 0.99 on a numpy matmul
# loop; multithreaded XLA:CPU can exceed 1.0 since process_time() sums all
# threads).  Anything above 0.5 means the "TPU" program is actually
# running on this host.  This catches the failure mode the load-time
# signature cannot: a FRESH degraded-service compile targeted at the
# matching host has no machine-feature mismatch, so cpu_aot_loader.cc
# prints nothing (observed: calibration 109 TFLOP/s, zero loader warnings,
# pipeline at 25 FPS = the round-4 CPU number).
HOST_EXEC_FRAC_LIMIT = 0.5


def host_cpu_fraction(run_once) -> Tuple[float, float]:
    """Time one synchronous call and return ``(wall_s, host_cpu_frac)``.

    ``host_cpu_frac`` is process CPU seconds (all threads) divided by wall
    seconds for the call — the physical discriminator between "this
    executable ran on the device" (~0.0) and "this executable ran on the
    local host" (~1.0).  ``run_once`` must block until the result is ready.
    """
    c0 = time.process_time()
    t0 = time.perf_counter()
    run_once()
    wall = time.perf_counter() - t0
    cpu = time.process_time() - c0
    return wall, (cpu / wall if wall > 0 else 0.0)


class StderrScan:
    """Live fd-level TEE of stderr for the duration of a ``with`` block:
    everything still reaches the real stderr in real time (compile
    progress stays visible, tracebacks are never swallowed) while a copy
    accumulates for ``found(pattern)`` / ``count(pattern)``.

    XLA's C++ logging writes straight to fd 2, so Python-level
    ``sys.stderr`` redirection cannot see it; this works at the fd
    level (dup2 onto a pipe, pump thread tees to the saved fd)."""

    def __init__(self):
        self.text = ""
        self._chunks: list = []

    def found(self, pattern: str) -> bool:
        return pattern in self.text

    def count(self, pattern: str) -> int:
        return self.text.count(pattern)


@contextlib.contextmanager
def scan_stderr():
    scan = StderrScan()
    sys.stderr.flush()
    saved = os.dup(2)
    r, w = os.pipe()
    os.dup2(w, 2)
    os.close(w)  # fd 2 is now the pipe's only write end

    def pump():
        while True:
            try:
                data = os.read(r, 65536)
            except OSError:
                break
            if not data:
                break
            scan._chunks.append(data)
            try:
                os.write(saved, data)  # live tee to the real stderr
            except OSError:
                pass

    th = threading.Thread(target=pump, daemon=True)
    th.start()
    try:
        yield scan
    finally:
        sys.stderr.flush()
        os.dup2(saved, 2)  # closes the pipe's write end -> pump sees EOF
        th.join(5.0)
        os.close(saved)
        try:
            os.close(r)
        except OSError:
            pass
        scan.text = b"".join(scan._chunks).decode("utf-8",
                                                  errors="replace")

# Sustained-TFLOP/s envelope per device kind (prefix-matched, bf16 chained
# matmuls with one host round-trip amortized over the chain).  Lower bound
# is deliberately loose — a tunnel with 10x today's latency still passes —
# while remaining ~20x above anything a host CPU can fake.  Upper bound is
# a physics check: a rate above the advertised peak means the timing path
# is broken (round-4 mode measured 8x peak).
_ENVELOPES = {
    "TPU v5 lite": (20.0, 500.0),   # v5e: 394 bf16 peak/chip
    "TPU v5": (20.0, 1000.0),       # v5p: 459 bf16 peak/chip
    "TPU v4": (20.0, 700.0),
    "TPU v6": (20.0, 2000.0),
}
_DEFAULT_TPU_ENVELOPE = (10.0, 2500.0)


@dataclasses.dataclass
class CalibrationResult:
    ok: bool
    reason: str                      # one line; "" when ok
    backend: str = ""
    device_kind: str = ""
    calib_tflops: float = 0.0        # sustained, chained-matmul probe
    dispatch_ms: float = 0.0         # trivial-op round trip, min of reps
    h2d_mbps: float = 0.0            # 0.0 when bandwidth probe skipped
    d2h_mbps: float = 0.0

    def json_fields(self) -> dict:
        f = {
            "backend": self.backend,
            "device_kind": self.device_kind,
            "calib_tflops": round(self.calib_tflops, 2),
            "dispatch_ms": round(self.dispatch_ms, 2),
            "valid": self.ok,
        }
        if not self.ok:
            f["invalid_reason"] = self.reason
        return f


def _readback(x, timeout: float) -> Optional[np.ndarray]:
    """np.asarray(x) in a daemon thread with a bounded wait.

    In the degraded mode the transfer never completes; a plain
    ``np.asarray`` would hang the benchmark forever.  Returns None on
    timeout (the daemon thread is abandoned — acceptable for a probe
    that is about to fail the whole run anyway).
    """
    box: dict = {}

    def go():
        try:
            box["v"] = np.asarray(x)
        except Exception as e:  # noqa: BLE001 — surfaced as a probe failure
            box["e"] = e

    th = threading.Thread(target=go, daemon=True)
    th.start()
    th.join(timeout)
    if th.is_alive():
        return None
    if "e" in box:
        raise box["e"]
    return box["v"]


def envelope_for(device_kind: str) -> Tuple[float, float]:
    for prefix, env in _ENVELOPES.items():
        if device_kind.startswith(prefix):
            return env
    return _DEFAULT_TPU_ENVELOPE


def calibrate(n: int = 4096, chain: int = 50, reps: int = 3,
              first_timeout: float = 600.0, timeout: float = 120.0,
              bandwidth: bool = False,
              allow_cpu: bool = False) -> CalibrationResult:
    """Run the calibration probes against the current default backend.

    ``first_timeout`` bounds the compile+first-execute call (the matmul
    chain is a trivial program — ~1 s on a healthy compile service);
    ``timeout`` bounds each steady-state readback.
    """
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    dev = jax.devices()[0]
    kind = dev.device_kind
    res = CalibrationResult(ok=True, reason="", backend=backend,
                            device_kind=kind)

    if backend == "cpu":
        # an honest CPU backend: no envelope to enforce, but a throughput
        # headline measured here is meaningless unless explicitly allowed
        # (tests / local smoke runs).
        res.ok = allow_cpu
        res.reason = "" if allow_cpu else (
            "backend is cpu — not a TPU measurement")
        return res

    # --- probe 1: dispatch round trip -----------------------------------
    f_small = jax.jit(lambda x: x + 1.0)
    x_small = jnp.zeros((8,), jnp.float32)
    out = _readback(f_small(x_small), first_timeout)
    if out is None:
        res.ok = False
        res.reason = (f"dispatch-probe readback hung >{first_timeout:.0f}s "
                      "— degraded backend (round-4 CPU-AOT mode)")
        return res
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        got = _readback(f_small(x_small), timeout)
        times.append(time.perf_counter() - t0)
        if got is None:
            res.ok = False
            res.reason = f"dispatch readback hung >{timeout:.0f}s"
            return res
    res.dispatch_ms = min(times) * 1e3

    # --- probe 2: sustained matmul throughput ---------------------------
    def chain_fn(a, b):
        def body(c, _):
            return (c @ b) * (1.0 / n), ()
        c, _ = jax.lax.scan(body, a, None, length=chain)
        return c

    f = jax.jit(chain_fn)
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.ones((n, n), jnp.bfloat16)
    first = _readback(f(a, b)[:1, :1], first_timeout)
    if first is None:
        res.ok = False
        res.reason = (f"matmul readback hung >{first_timeout:.0f}s — "
                      "degraded backend (round-4 CPU-AOT mode)")
        return res
    best = float("inf")
    val = None
    for _ in range(reps):
        t0 = time.perf_counter()
        val = _readback(f(a, b)[:1, :1], timeout)
        dt = time.perf_counter() - t0
        if val is None:
            res.ok = False
            res.reason = f"matmul readback hung >{timeout:.0f}s"
            return res
        best = min(best, dt)
    res.calib_tflops = 2.0 * n ** 3 * chain / best / 1e12
    # value check: ones-chain normalized by 1/n is exactly 1.0 — a fake
    # executor returning zeros/garbage fails here even if timing looks sane
    if not np.allclose(np.asarray(val, np.float32), 1.0, atol=0.1):
        res.ok = False
        res.reason = (f"matmul value check failed (got {val!r}, want 1.0) "
                      "— backend returned garbage")
        return res

    lo, hi = envelope_for(kind)
    if not (lo <= res.calib_tflops <= hi):
        res.ok = False
        res.reason = (f"calibrated {res.calib_tflops:.1f} TFLOP/s outside "
                      f"[{lo:.0f}, {hi:.0f}] envelope for {kind!r} — "
                      + ("impossibly fast: timing path broken"
                         if res.calib_tflops > hi else
                         "too slow: likely CPU execution behind a TPU "
                         "label"))
        return res

    # --- probe 3: host<->device bandwidth (doctor only) -----------------
    if bandwidth:
        mb = 8.0
        host = np.zeros((int(mb * 1024 * 1024 // 4),), np.float32)
        t0 = time.perf_counter()
        on_dev = jax.device_put(host)
        on_dev.block_until_ready()
        res.h2d_mbps = mb / (time.perf_counter() - t0)
        t0 = time.perf_counter()
        back = _readback(on_dev, timeout)
        if back is None:
            res.ok = False
            res.reason = f"bandwidth readback hung >{timeout:.0f}s"
            return res
        res.d2h_mbps = mb / (time.perf_counter() - t0)

    return res
