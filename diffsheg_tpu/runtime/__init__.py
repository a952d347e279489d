"""Native runtime: C++ data-plane with ctypes bindings.

Builds ``dataplane.cpp`` into a shared library on first use (g++ -O3) and
exposes:

  - :func:`gather_rows` — threaded batch gather over a memory-mapped 2-D
    view (the batch-assembly hot path of the input pipeline);
  - :func:`parse_float_text` — bulk float parsing for BVH/numeric text
    (the cache-build hot path).

Every entry point has a numpy fallback, so the package works without a
compiler; the native path is used automatically when the library builds.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "native", "dataplane.cpp")
_LIB_PATH = os.path.join(_HERE, "native", "libdataplane.so")
_HASH_PATH = _LIB_PATH + ".srchash"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _src_hash() -> str:
    with open(_SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _lib_is_fresh() -> bool:
    """True iff the built .so corresponds to the current source.

    The hash sidecar (written at build time) is the staleness guard: an
    edited ``dataplane.cpp`` triggers a rebuild on next import even when a
    stale binary exists, without relying on ABI-version bumps or mtimes
    (mtimes are unreliable across git checkouts).
    """
    if not os.path.exists(_LIB_PATH):
        return False
    try:
        with open(_HASH_PATH) as f:
            return f.read().strip() == _src_hash()
    except OSError:
        return False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             "-pthread", _SRC, "-o", _LIB_PATH],
            check=True, capture_output=True, timeout=120)
        with open(_HASH_PATH, "w") as f:
            f.write(_src_hash())
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _lib_is_fresh():
            if not os.path.exists(_SRC) or not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.dt_abi_version.restype = ctypes.c_int32
            if lib.dt_abi_version() != 1:
                return None
            lib.dt_gather_rows.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32]
            lib.dt_parse_floats.restype = ctypes.c_int64
            lib.dt_parse_floats.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def native_available() -> bool:
    return _load() is not None


def gather_rows(src: np.ndarray, indices: np.ndarray,
                out: Optional[np.ndarray] = None,
                n_threads: int = 4) -> np.ndarray:
    """dst[i] = src[indices[i]]; src is (N, ...) C-contiguous (memmap ok)."""
    idx = np.ascontiguousarray(indices, dtype=np.int64)
    row_shape = src.shape[1:]
    row_bytes = int(np.prod(row_shape, dtype=np.int64)) * src.dtype.itemsize
    if out is None:
        out = np.empty((len(idx),) + row_shape, dtype=src.dtype)
    lib = _load()
    if lib is None or not src.flags["C_CONTIGUOUS"]:
        np.take(src, idx, axis=0, out=out)
        return out
    lib.dt_gather_rows(
        src.ctypes.data_as(ctypes.c_void_p), row_bytes,
        idx.ctypes.data_as(ctypes.c_void_p), len(idx),
        out.ctypes.data_as(ctypes.c_void_p), n_threads)
    return out


def parse_float_text(text: bytes) -> Tuple[np.ndarray, int]:
    """Parse whitespace-separated floats -> (flat float64 array, n_rows)."""
    lib = _load()
    if lib is None:
        rows = [r.split() for r in text.decode().splitlines() if r.strip()]
        flat = np.asarray([float(v) for r in rows for v in r])
        return flat, len(rows)
    # Upper bound on value count: N single-char values need 2N-1 bytes,
    # so (len+1)//2 + 1 can never truncate.
    max_vals = max(16, (len(text) + 1) // 2 + 1)
    out = np.empty(max_vals, dtype=np.float64)
    n_rows = ctypes.c_int64(0)
    n = lib.dt_parse_floats(text, len(text),
                            out.ctypes.data_as(ctypes.c_void_p), max_vals,
                            ctypes.byref(n_rows))
    return out[:n].copy(), int(n_rows.value)


def parse_frames_file(path: str) -> np.ndarray:
    """Numeric frame file -> (T, C) float64 (native bulk parse)."""
    with open(path, "rb") as f:
        text = f.read()
    flat, rows = parse_float_text(text)
    if rows == 0:
        return np.zeros((0, 0))
    assert len(flat) % rows == 0, (len(flat), rows, path)
    return flat.reshape(rows, -1)
