"""ctypes binding for the native runtime library (native/rtvb_native.c).

The reference's IO/runtime layer is C++ (stb_image_write PNG encode +
std::execution::par batch frame writes, OfflineBackend.cpp:133-184; FNV-1a
chunk hashing, WorldSceneManager.cpp:240-279).  This module loads the TPU
build's C equivalent — building it on first use when a compiler is around —
and exposes None-safe handles so callers can fall back to pure Python.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "librtvb_native.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO_PATH) and os.path.exists(
            os.path.join(_NATIVE_DIR, "Makefile")):
        try:  # build on demand (make -C native)
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.rtvb_fnv1a64.restype = ctypes.c_uint64
        lib.rtvb_fnv1a64.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.rtvb_write_png.restype = ctypes.c_int
        lib.rtvb_write_png.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.c_int, ctypes.c_char_p]
        lib.rtvb_write_pngs.restype = ctypes.c_int
        lib.rtvb_write_pngs.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_void_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def fnv1a64(data: bytes) -> int | None:
    lib = _load()
    if lib is None:
        return None
    return int(lib.rtvb_fnv1a64(data, len(data)))


def write_png(path: str, img) -> bool:
    """img: (H, W, 3) uint8 C-contiguous numpy array."""
    import numpy as np
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(img, np.uint8)
    h, w = img.shape[:2]
    rc = lib.rtvb_write_png(path.encode(), w, h,
                            img.ctypes.data_as(ctypes.c_char_p))
    return rc == 0


def write_pngs(paths: list[str], frames, threads: int = 8) -> bool:
    """Batch parallel encode (std::execution::par role). frames: list of
    (H, W, 3) uint8 arrays, all the same size."""
    import numpy as np
    lib = _load()
    if lib is None or not paths:
        return False
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    n = len(paths)
    patharr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    framearr = (ctypes.c_void_p * n)(*[f.ctypes.data for f in frames])
    rc = lib.rtvb_write_pngs(patharr, framearr, w, h, n, threads)
    return rc == 0
