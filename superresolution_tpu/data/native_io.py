"""ctypes bindings for the native (C++) TIFF decoder, with auto-build.

The .so is compiled on first use (g++ -O3 -shared) and cached next to the
source; decode falls back to PIL (data/io.py) when the toolchain or format
is unavailable. `decode_batch` is the hot path the Loader uses: N files in
one native call across a thread pool, zero Python per-image overhead.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "native")
_SRC = os.path.join(_NATIVE_DIR, "loader.cpp")
_SO = os.path.join(_NATIVE_DIR, "libsrloader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
             "-o", _SO, "-pthread"],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SRC) > os.path.getmtime(_SO)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.srloader_decode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.srloader_decode.restype = ctypes.c_int
        lib.srloader_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        lib.srloader_decode_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def decode_tiff(path: str, max_hw: int = 4096) -> np.ndarray | None:
    """Decode one grayscale TIFF natively -> HWC float32 [0,1], or None."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_hw * max_hw, np.float32)
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    rc = lib.srloader_decode(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        buf.size, ctypes.byref(h), ctypes.byref(w))
    if rc != 0:
        return None
    return buf[: h.value * w.value].reshape(h.value, w.value, 1).copy()


def decode_batch(paths: list[str], hw: tuple[int, int],
                 num_threads: int = 4) -> np.ndarray | None:
    """Decode a batch of same-size grayscale TIFFs -> [N,H,W,1] float32,
    or None if any file fails/the native path is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(paths)
    h, w = hw
    out = np.empty((n, h * w), np.float32)
    hs = np.empty(n, np.int64)
    ws = np.empty(n, np.int64)
    status = np.empty(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.srloader_decode_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        h * w, hs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ws.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), num_threads)
    if (status != 0).any() or (hs != h).any() or (ws != w).any():
        return None
    return out.reshape(n, h, w, 1)
