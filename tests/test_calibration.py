"""Backend calibration probe tests (utils/calibration.py).

The probe exists because of the round-4 incident: a degraded remote
plugin served CPU executables under a "tpu" label, block_until_ready()
returned without executing, and readbacks hung — bench.py certified a
0.46x headline with rc=0.  These tests pin the guard's decision logic
on the honest-CPU backend (the failure mode itself cannot be reproduced
here; the envelope and hang-bounding logic can).
"""

import os
import time

import numpy as np

from diffsheg_tpu.utils.calibration import (CalibrationResult, _readback,
                                            calibrate, envelope_for,
                                            scan_stderr)


class TestStderrScan:
    def test_sees_fd_level_writes(self):
        """XLA's C++ logging writes to fd 2 directly — the scan must see
        raw-fd writes, not only sys.stderr ones."""
        with scan_stderr() as scan:
            os.write(2, b"raw: Loading XLA:CPU AOT result marker\n")
        assert scan.found("Loading XLA:CPU AOT result")
        assert scan.count("Loading XLA:CPU AOT result") == 1

    def test_tee_restores_stderr(self):
        before = os.fstat(2).st_ino if hasattr(os, "fstat") else None
        with scan_stderr() as scan:
            os.write(2, b"tee check\n")
        # fd 2 usable again after the scan
        os.write(2, b"")
        assert scan.found("tee check")
        if before is not None:
            assert os.fstat(2).st_ino == before

    def test_exception_does_not_swallow(self):
        try:
            with scan_stderr() as scan:
                os.write(2, b"pre-raise output\n")
                raise RuntimeError("boom")
        except RuntimeError:
            pass
        assert scan.found("pre-raise output")


class TestEnvelope:
    def test_v5e_envelope(self):
        lo, hi = envelope_for("TPU v5 lite")
        assert lo <= 114.7 <= hi       # measured healthy sustained rate
        assert not (lo <= 2.1 <= hi)   # 1-core AMX host peak: fails low
        assert not (lo <= 3179 <= hi)  # round-4 impossible rate: fails high

    def test_unknown_kind_gets_default(self):
        lo, hi = envelope_for("TPU v99 hyperdrive")
        assert 0 < lo < hi

    def test_prefix_match_order(self):
        # "TPU v5 lite" must match the lite row, not the v5p row
        assert envelope_for("TPU v5 lite") == envelope_for("TPU v5 litepod")
        assert envelope_for("TPU v5p")[1] > envelope_for("TPU v5 lite")[1]


class TestReadback:
    def test_returns_value(self):
        out = _readback(np.arange(3.0), timeout=5.0)
        np.testing.assert_array_equal(out, [0.0, 1.0, 2.0])

    def test_bounded_on_hang(self):
        class Hangs:
            def __array__(self, dtype=None, copy=None):
                time.sleep(30.0)
                return np.zeros(1)

        t0 = time.perf_counter()
        assert _readback(Hangs(), timeout=0.2) is None
        assert time.perf_counter() - t0 < 5.0

    def test_propagates_errors(self):
        class Raises:
            def __array__(self, dtype=None, copy=None):
                raise RuntimeError("transfer failed")

        try:
            _readback(Raises(), timeout=5.0)
        except RuntimeError as e:
            assert "transfer failed" in str(e)
        else:
            raise AssertionError("expected RuntimeError")


class TestCalibrateOnCpu:
    def test_cpu_backend_refused_by_default(self):
        res = calibrate()
        assert res.backend == "cpu"
        assert not res.ok
        assert "cpu" in res.reason
        fields = res.json_fields()
        assert fields["valid"] is False
        assert "invalid_reason" in fields

    def test_cpu_backend_allowed_explicitly(self):
        res = calibrate(allow_cpu=True)
        assert res.ok
        assert res.json_fields()["valid"] is True
        assert "invalid_reason" not in res.json_fields()


class TestResultFields:
    def test_json_fields_roundtrip(self):
        res = CalibrationResult(ok=True, reason="", backend="tpu",
                                device_kind="TPU v5 lite",
                                calib_tflops=114.66, dispatch_ms=23.25)
        f = res.json_fields()
        assert f == {"backend": "tpu", "device_kind": "TPU v5 lite",
                     "calib_tflops": 114.66, "dispatch_ms": 23.25,
                     "valid": True}


class TestHostCpuFraction:
    """host_cpu_fraction(): the execution-locality discriminator.

    Added after the 2026-08-20 incident where a FRESH degraded-service
    compile produced a host-CPU pipeline with NO cpu_aot_loader warning
    (machine features matched), so the signature scan passed and bench.py
    certified 25 FPS valid:true.  Local-CPU-burn vs idle-blocking is the
    physical signal the signature cannot miss.
    """

    def test_busy_loop_reads_as_host_execution(self):
        from diffsheg_tpu.utils.calibration import (HOST_EXEC_FRAC_LIMIT,
                                                    host_cpu_fraction)

        def busy():
            t0 = time.perf_counter()
            x = 0
            while time.perf_counter() - t0 < 0.1:
                x += 1
            return x

        wall, frac = host_cpu_fraction(busy)
        assert wall >= 0.1
        assert frac > HOST_EXEC_FRAC_LIMIT

    def test_blocking_wait_reads_as_device_execution(self):
        from diffsheg_tpu.utils.calibration import (HOST_EXEC_FRAC_LIMIT,
                                                    host_cpu_fraction)

        wall, frac = host_cpu_fraction(lambda: time.sleep(0.1))
        assert wall >= 0.1
        assert frac < HOST_EXEC_FRAC_LIMIT
