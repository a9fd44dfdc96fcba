"""ctypes binding to the native entropy codec (libhimg_entropy.so).

Loads (building on demand) the C++ backend from himg_tpu/native.  All
functions mirror entropy.bitpack semantics exactly; `available()` gates the
dispatch in bitpack so environments without a toolchain fall back to the
NumPy path transparently.
"""

from __future__ import annotations

import ctypes

import numpy as np

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    import os
    if os.environ.get("HIMG_NATIVE", "1") in ("0", "false", ""):
        return None  # explicit opt-out -> NumPy/Python fallback paths
    from ..native.build import build
    path = build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
    except OSError:
        return None
    lib.he_max_compressed_size.restype = ctypes.c_int64
    lib.he_max_compressed_size.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.he_compress.restype = ctypes.c_int64
    lib.he_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64]
    lib.he_decompress.restype = ctypes.c_int32
    lib.he_decompress.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def compress(data: np.ndarray, block_size: int) -> bytes:
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    n = data.size
    if n < 1:
        return b""
    cap = lib.he_max_compressed_size(n, block_size)
    out = np.empty(cap, dtype=np.uint8)
    size = lib.he_compress(data.ctypes.data_as(ctypes.c_char_p), n,
                           block_size, out.ctypes.data, cap)
    if size < 0:
        raise ValueError("native entropy compression failed")
    return out[:size].tobytes()


def decompress(data: bytes, out_size: int, block_size: int,
               n_threads: int = 0) -> np.ndarray:
    lib = _load()
    out = np.empty(out_size, dtype=np.uint8)
    rc = lib.he_decompress(data, len(data), block_size,
                           out.ctypes.data, out_size, n_threads)
    if rc != 0:
        raise ValueError(f"native entropy decompression failed (rc={rc})")
    return out
