"""Build + load the native host libraries (g++ at first use, cached .so)."""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIB = None
_FAILED = False
_CANON_LIB = None
_CANON_FAILED = False


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


def load_canonicalize():
    """Native scene-graph canonicalization (canonicalize.cpp), or None."""
    global _CANON_LIB, _CANON_FAILED
    with _LOCK:
        if _CANON_LIB is not None or _CANON_FAILED:
            return _CANON_LIB
        so = os.path.join(_HERE, "libcanonicalize.so")
        src = os.path.join(_HERE, "canonicalize.cpp")
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            if not _build(src, so):
                _CANON_FAILED = True
                return None
        lib = ctypes.CDLL(so)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.location_triplets_minimal.restype = ctypes.c_int64
        lib.location_triplets_minimal.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, i32p, i32p,
            ctypes.c_int64]
        lib.augment_triplets.restype = ctypes.c_int64
        lib.augment_triplets.argtypes = [
            i32p, ctypes.c_int64, ctypes.c_int32,
            i32p, ctypes.c_int32, i32p, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.c_uint64,
            i32p, i32p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
        _CANON_LIB = lib
        return _CANON_LIB
