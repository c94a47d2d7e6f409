"""Build + load the native mask codec (g++ at first use, cached .so)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_FAILED = False


def _build(src: str, out: str) -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", src, "-o", out],
            check=True, capture_output=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def load_cocomask():
    """Returns the ctypes library or None if the toolchain is unavailable."""
    global _LIB, _FAILED
    with _LOCK:
        if _LIB is not None or _FAILED:
            return _LIB
        so = os.path.join(_HERE, "libcocomask.so")
        src = os.path.join(_HERE, "cocomask.cpp")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            if not _build(src, so):
                _FAILED = True
                return None
        lib = ctypes.CDLL(so)
        lib.rle_decode_string.restype = ctypes.c_int
        lib.rle_decode_string.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.rle_decode_counts.restype = ctypes.c_int
        lib.rle_decode_counts.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
        lib.polygon_fill.restype = ctypes.c_int
        lib.polygon_fill.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
        _LIB = lib
        return _LIB
