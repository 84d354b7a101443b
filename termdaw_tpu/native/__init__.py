"""ctypes loader for the native C++ runtime library.

Builds libtermdaw_native.so on first use (g++ via the Makefile) and exposes
typed wrappers. Every entry point has a pure-numpy fallback in the
fileio layer, so a missing toolchain only costs speed. Disable with
TERMDAW_NATIVE=0.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libtermdaw_native.so"
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_DIR)],
            check=True, capture_output=True, timeout=120,
        )
        return _LIB_PATH.exists()
    except (subprocess.SubprocessError, OSError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("TERMDAW_NATIVE", "1") == "0":
        return None
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    c_i64 = ctypes.c_int64
    lib.unpack24.argtypes = [ctypes.c_void_p, c_i64, ctypes.c_void_p]
    lib.pack24.argtypes = [ctypes.c_void_p, c_i64, ctypes.c_void_p]
    lib.quantize16.argtypes = [
        ctypes.c_void_p, c_i64, ctypes.c_float, ctypes.c_void_p
    ]
    lib.quantize32.argtypes = [
        ctypes.c_void_p, c_i64, ctypes.c_double, ctypes.c_void_p
    ]
    lib.interleave2.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, c_i64, ctypes.c_void_p
    ]
    lib.deinterleave2.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, c_i64, ctypes.c_void_p,
        ctypes.c_void_p,
    ]
    lib.scan_frames.argtypes = [ctypes.c_void_p, c_i64, ctypes.c_void_p, c_i64]
    lib.scan_frames.restype = c_i64
    _lib = lib
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def unpack24(raw: bytes) -> np.ndarray | None:
    lib = get_lib()
    if lib is None:
        return None
    n = len(raw) // 3
    src = np.frombuffer(raw, dtype=np.uint8, count=n * 3)
    dst = np.empty(n, np.int32)
    lib.unpack24(_ptr(src), n, _ptr(dst))
    return dst


def pack24(vals: np.ndarray) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(vals, np.int32)
    dst = np.empty(len(src) * 3, np.uint8)
    lib.pack24(_ptr(src), len(src), _ptr(dst))
    return dst.tobytes()


def scan_frames(buf: bytes | bytearray, max_frames: int = 4096):
    """Return list of (offset, length) complete frames, or None if the
    native library is unavailable. Raises ValueError on malformed data."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.frombuffer(bytes(buf), dtype=np.uint8)
    spans = np.empty(max_frames * 2, np.int64)
    n = lib.scan_frames(_ptr(src), len(src), _ptr(spans), max_frames)
    if n < 0:
        raise ValueError(f"malformed packet stream (code {n})")
    return [(int(spans[i * 2]), int(spans[i * 2 + 1])) for i in range(n)]
