"""ctypes binding for the native JPEG decoder, with lazy self-build.

Loads ``_jpeg_native.so`` next to this file; if absent, compiles it once
with g++ (libjpeg + pthreads — both in the base image).  All callers fall
back to PIL when the toolchain or libjpeg is unavailable, so this module is
an accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_HERE, "_jpeg_native.so")
_SRC_PATH = os.path.join(_HERE, "jpeg_decode.cpp")

_lib = None
_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-o",
        _SO_PATH,
        _SRC_PATH,
        "-ljpeg",
        "-lpthread",
    ]
    try:
        subprocess.run(
            cmd, check=True, capture_output=True, timeout=120
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        stale = os.path.exists(_SO_PATH) and (
            os.path.getmtime(_SRC_PATH) > os.path.getmtime(_SO_PATH)
        )
        if not os.path.exists(_SO_PATH) or stale:
            if os.environ.get("GEO_TPU_NO_NATIVE") == "1" or not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            _build_failed = True
            return None
        lib.gg_decode_resize.restype = ctypes.c_int
        lib.gg_decode_resize.argtypes = [
            ctypes.c_char_p,
            ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.gg_decode_batch.restype = None
        lib.gg_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_size_t),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def decode_resize(blob: bytes, size: int) -> np.ndarray:
    """Decode one JPEG to (size, size, 3) uint8.  Raises on decode error."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native jpeg decoder unavailable")
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.gg_decode_resize(
        blob,
        len(blob),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size,
        size,
    )
    if rc != 0:
        raise ValueError(f"jpeg decode failed (code {rc})")
    return out


def decode_batch(
    blobs: List[bytes], size: int, n_threads: int = 0
) -> np.ndarray:
    """Decode a list of JPEGs to (n, size, size, 3) uint8 in parallel.

    Failed images come back as zeros (the reference's black-placeholder
    fallback, backend/data.py:135-156).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native jpeg decoder unavailable")
    n = len(blobs)
    out = np.zeros((n, size, size, 3), np.uint8)
    if n == 0:
        return out
    arr_t = ctypes.c_char_p * n
    len_t = ctypes.c_size_t * n
    bufs = arr_t(*blobs)
    lens = len_t(*[len(b) for b in blobs])
    status = (ctypes.c_int * n)()
    if n_threads <= 0:
        n_threads = min(n, os.cpu_count() or 1)
    lib.gg_decode_batch(
        bufs,
        lens,
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        size,
        size,
        n_threads,
        status,
    )
    for i in range(n):
        if status[i] != 0:
            out[i] = 0
    return out
