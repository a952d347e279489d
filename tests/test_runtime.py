"""Native data-plane tests: C++ gather/parse vs numpy oracle."""

import numpy as np

from diffsheg_tpu import runtime


def test_native_builds():
    assert runtime.native_available(), "C++ dataplane failed to build"


def test_gather_rows_matches_numpy():
    rng = np.random.RandomState(0)
    src = rng.randn(500, 7, 3).astype(np.float32)
    idx = rng.randint(0, 500, size=64)
    out = runtime.gather_rows(src, idx)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_rows_large_threaded():
    src = np.arange(4096 * 300, dtype=np.float64).reshape(4096, 300)
    idx = np.random.RandomState(1).permutation(4096)
    out = runtime.gather_rows(src, idx, n_threads=4)
    np.testing.assert_array_equal(out, src[idx])


def test_parse_float_text():
    flat, rows = runtime.parse_float_text(b"1.0 -2.5 3e2\n4 5 6\r\n7 8 9\n")
    assert rows == 3
    np.testing.assert_allclose(flat, [1.0, -2.5, 300.0, 4, 5, 6, 7, 8, 9])


def test_parse_frames_file(tmp_path):
    p = tmp_path / "frames.bvh"
    arr = np.random.RandomState(2).randn(20, 141)
    np.savetxt(p, arr, fmt="%.8f")
    got = runtime.parse_frames_file(str(p))
    np.testing.assert_allclose(got, arr, atol=1e-7)


def test_parse_empty(tmp_path):
    p = tmp_path / "empty.txt"
    p.write_text("")
    got = runtime.parse_frames_file(str(p))
    assert got.size == 0


def test_stale_binary_detected(monkeypatch, tmp_path):
    """An edited dataplane.cpp invalidates a previously built .so.

    Guard for the staleness check in runtime._lib_is_fresh: the hash
    sidecar written at build time must stop matching when the source
    changes, forcing a rebuild on next import (no ABI bump needed).
    """
    src = tmp_path / "dataplane.cpp"
    lib = tmp_path / "libdataplane.so"
    sidecar = tmp_path / "libdataplane.so.srchash"
    src.write_text("// v1")
    lib.write_bytes(b"ELFnotreally")
    monkeypatch.setattr(runtime, "_SRC", str(src))
    monkeypatch.setattr(runtime, "_LIB_PATH", str(lib))
    monkeypatch.setattr(runtime, "_HASH_PATH", str(sidecar))
    # no sidecar at all -> stale
    assert not runtime._lib_is_fresh()
    sidecar.write_text(runtime._src_hash())
    assert runtime._lib_is_fresh()
    src.write_text("// v2 — edited source")
    assert not runtime._lib_is_fresh()


def test_parse_dense_single_char_values():
    """Maximally dense input must not truncate (regression: max_vals bound)."""
    text = b" ".join(b"7" for _ in range(17))
    flat, rows = runtime.parse_float_text(text)
    assert len(flat) == 17
    assert rows == 1
    np.testing.assert_allclose(flat, 7.0)
