"""ctypes loader for the native staging engine (native/stage.cpp).

Compiles the shared library on first use (g++ -O3) into a build artifact keyed
by the source hash — no binary is checked in, staleness detection doesn't
depend on checkout mtimes, and `-march=native` is safe because the library is
always built on the machine that runs it. Falls back to numpy implementations
if the toolchain is unavailable. All entry points are differentially tested
against the numpy fallbacks (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_SRC = os.path.join(_NATIVE_DIR, "stage.cpp")

_lock = threading.Lock()
_lib = None
_tried = False


def _so_path() -> str:
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    return os.path.join(_NATIVE_DIR, "build", f"libclownstage-{digest}.so")


def _load():
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        try:
            so = _so_path()
            if not os.path.exists(so):
                os.makedirs(os.path.dirname(so), exist_ok=True)
                tmp = so + f".tmp{os.getpid()}"
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
                     _SRC, "-o", tmp],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so)  # atomic: concurrent builders converge
            lib = ctypes.CDLL(so)
            L = ctypes.c_long
            lib.stage_i16_to_i32_lanes.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, L, L, L, L, L]
            lib.zero_rows_i32.argtypes = [ctypes.c_void_p, L, L, L]
            lib.shift_rows_i32.argtypes = [ctypes.c_void_p, L, L, L]
            lib.unstage_i32_to_streams.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, L, L, L, L]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def stage_chunk(chunk: np.ndarray, staging: np.ndarray, row_off: int) -> None:
    """(B, n, C) int16 -> staging rows [row_off, row_off+n) lane-major int32."""
    b, n, c = chunk.shape
    assert staging.flags.c_contiguous and chunk.flags.c_contiguous
    assert staging.dtype == np.int32 and chunk.dtype == np.int16
    lib = _load()
    if lib is not None:
        lib.stage_i16_to_i32_lanes(
            chunk.ctypes.data, staging.ctypes.data, b, n, c, staging.shape[1], row_off
        )
    else:
        staging[row_off : row_off + n, : b * c] = (
            chunk.transpose(1, 0, 2).reshape(n, b * c).astype(np.int32)
        )


def zero_rows(staging: np.ndarray, row_off: int, n: int) -> None:
    lib = _load()
    if lib is not None:
        lib.zero_rows_i32(staging.ctypes.data, staging.shape[1], row_off, n)
    else:
        staging[row_off : row_off + n] = 0


def shift_rows(staging: np.ndarray, rows_keep: int, shift: int) -> None:
    """staging[r] = staging[r + shift] for r in [0, rows_keep)."""
    if shift == 0:
        return
    lib = _load()
    if lib is not None:
        lib.shift_rows_i32(staging.ctypes.data, rows_keep, staging.shape[1], shift)
    else:
        staging[:rows_keep] = staging[shift : shift + rows_keep]


def unstage_output(lanes_out: np.ndarray, b: int, c: int) -> np.ndarray:
    """(m, B*C) int32 lane-major -> (B, m, C) int32."""
    m, ld = lanes_out.shape
    assert ld >= b * c
    lanes_out = np.ascontiguousarray(lanes_out[:, : b * c], dtype=np.int32)
    lib = _load()
    out = np.empty((b, m, c), np.int32)
    if lib is not None:
        lib.unstage_i32_to_streams(lanes_out.ctypes.data, out.ctypes.data, b, m, c, b * c)
    else:
        out[:] = lanes_out.reshape(m, b, c).transpose(1, 0, 2)
    return out
