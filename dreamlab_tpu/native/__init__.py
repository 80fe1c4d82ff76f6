"""Native (C) host-side helpers with graceful Python fallbacks.

``encode_png(arr)`` uses the zlib-backed C encoder (native/pngenc.c) when
the shared object is present or can be built with the system compiler;
otherwise callers fall back to PIL. Build is a single cc invocation —
no pybind11 (not in this image); the boundary is ctypes.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "pngenc.c")
_SO = os.path.join(_DIR, "_pngenc.so")

_lib = None
_lib_lock = threading.Lock()
_build_failed = False


def _build() -> bool:
    cc = os.environ.get("CC", "cc")
    cmd = [cc, "-O3", "-shared", "-fPIC", "-o", _SO, _SRC, "-lz"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        logger.info("built %s", _SO)
        return True
    except (subprocess.SubprocessError, OSError) as e:
        logger.warning("pngenc build failed (%s); falling back to PIL", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            logger.warning("pngenc load failed: %s", e)
            _build_failed = True
            return None
        lib.pngenc_encode.restype = ctypes.POINTER(ctypes.c_ubyte)
        lib.pngenc_encode.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_size_t),
        ]
        lib.pngenc_free.argtypes = [ctypes.POINTER(ctypes.c_ubyte)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def encode_png(arr: np.ndarray, *, level: int = 1, filter_mode: int = 2) -> Optional[bytes]:
    """[H, W] or [H, W, {1,3,4}] uint8 → PNG bytes, or None if the native
    encoder is unavailable (caller falls back to PIL)."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    out_len = ctypes.c_size_t(0)
    ptr = lib.pngenc_encode(
        arr.ctypes.data_as(ctypes.c_char_p), h, w, c, level, filter_mode,
        ctypes.byref(out_len),
    )
    if not ptr:
        return None
    try:
        return ctypes.string_at(ptr, out_len.value)
    finally:
        lib.pngenc_free(ptr)
