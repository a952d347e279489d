"""Environment diagnostics command."""

import os


class TestDoctor:
    def test_doctor_passes_on_cpu(self, capsys):
        from diffsheg_tpu.cli.doctor import run_doctor

        rc = run_doctor(device_timeout=60.0)
        out = capsys.readouterr().out
        assert rc == 0
        for name in ("jax", "devices", "dispatch", "pallas", "dataplane",
                     "doctor"):
            assert f"] {name}" in out, out
        assert "all checks passed" in out

    def test_pallas_status_handles_unknown_backend(self):
        """When the device probe failed, pallas status must not touch the
        backend (jax.default_backend() hangs on a dead remote tunnel)."""
        from diffsheg_tpu.cli.doctor import _pallas_status

        ok, detail = _pallas_status(None)
        assert ok is None and "unknown" in detail
        ok, detail = _pallas_status("tpu")
        assert ok is True and "Mosaic" in detail
        ok, detail = _pallas_status("cpu")
        assert ok is True and "interpret" in detail

    def test_pallas_status_respects_kill_switch(self, monkeypatch):
        from diffsheg_tpu.cli.doctor import _pallas_status

        monkeypatch.setenv("DIFFSHEG_NO_PALLAS", "1")
        ok, detail = _pallas_status("tpu")
        assert ok is None and "DIFFSHEG_NO_PALLAS" in detail

    def test_cli_wiring(self):
        from diffsheg_tpu.cli.main import build_parser

        args = build_parser().parse_args(["doctor", "--device-timeout", "5"])
        assert args.device_timeout == 5.0 and args.fn is not None
