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
    bind_prototypes(lib)
    _lib = lib
    return _lib


def bind_prototypes(lib) -> None:
    """Declare the codec's C ABI on a loaded library handle.  The single
    source of truth for every export's signature -- also used by tests
    that load alternative builds (e.g. the SSE2-only fallback)."""
    lib.he_max_compressed_size.restype = ctypes.c_int64
    lib.he_max_compressed_size.argtypes = [ctypes.c_int64, ctypes.c_int64]
    lib.he_compress.restype = ctypes.c_int64
    lib.he_compress.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64]
    lib.he_decompress.restype = ctypes.c_int32
    lib.he_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
    lib.he_histogram.restype = ctypes.c_int32
    lib.he_histogram.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
    lib.he_pack_with_code.restype = ctypes.c_int64
    lib.he_pack_with_code.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
    lib.he_compress_assisted.restype = ctypes.c_int64
    lib.he_compress_assisted.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
    lib.he_last_phase_ms.restype = None
    lib.he_last_phase_ms.argtypes = [ctypes.c_void_p]


def available() -> bool:
    return _load() is not None


def compress(data: np.ndarray, block_size: int, view: bool = False):
    """view=True returns a zero-copy memoryview of the scratch buffer
    (for callers that immediately join it into a container and drop it);
    default returns an owned bytes object."""
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
    return out[:size].data if view else out[:size].tobytes()


def compress_assisted(data: np.ndarray, block_size: int,
                      hist: np.ndarray, view: bool = False):
    """Compress with a precomputed 261-bin token histogram.

    The TPU-assisted encode path: `hist` comes from the device
    (entropy/device_hist.block_histograms summed per frame), so the host
    runs a single fused SIMD scan+pack pass instead of tokenize + pack.
    Byte-identical to compress() when hist matches the data (tested).
    """
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    n = data.size
    if n < 1:
        return b""
    hist = np.ascontiguousarray(hist, dtype=np.int64)
    if hist.size != 261:
        raise ValueError("hist must have 261 bins")
    cap = lib.he_max_compressed_size(n, block_size)
    out = np.empty(cap, dtype=np.uint8)
    size = lib.he_compress_assisted(
        data.ctypes.data_as(ctypes.c_char_p), n, block_size,
        hist.ctypes.data, out.ctypes.data, cap)
    if size < 0:
        raise ValueError(
            f"native assisted compression failed (rc={size})")
    return out[:size].data if view else out[:size].tobytes()


def last_phase_ms() -> dict:
    """Phase timings (ms) of the most recent native codec call."""
    lib = _load()
    out = np.zeros(6, dtype=np.float64)
    lib.he_last_phase_ms(out.ctypes.data)
    names = ("tokenize", "tree", "pack", "fixup", "tree_lut", "decode")
    return dict(zip(names, out.tolist()))


def histogram(data: np.ndarray, block_size: int) -> np.ndarray:
    """261-bin token histogram of a byte buffer (the sharded-assembly
    analysis pass; per-shard results are summed like a psum)."""
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    hist = np.zeros(261, dtype=np.int64)
    rc = lib.he_histogram(data.ctypes.data_as(ctypes.c_char_p), data.size,
                          block_size, hist.ctypes.data)
    if rc != 0:
        raise ValueError("native histogram failed")
    return hist


def pack_with_code(data: np.ndarray, block_size: int, codes: np.ndarray,
                   bits: np.ndarray):
    """Pack blocks against a shared code table (sharded local-pack step).

    Returns (payload uint8[total], sizes int64[n_blocks], bits int64[n]):
    payloads back-to-back with no header/prefixes/stale-bit fix-up.
    """
    lib = _load()
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    n = data.size
    if n < 1:
        return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                np.zeros(0, np.int64))
    bs = block_size if block_size > 0 else n
    n_blocks = n // bs
    codes = np.ascontiguousarray(codes, dtype=np.uint32)
    bits8 = np.ascontiguousarray(bits, dtype=np.uint8)
    cap = 8 * n + 1024
    out = np.empty(cap, dtype=np.uint8)
    sizes = np.empty(n_blocks, dtype=np.int64)
    tbits = np.empty(n_blocks, dtype=np.int64)
    total = lib.he_pack_with_code(
        data.ctypes.data_as(ctypes.c_char_p), n, bs,
        codes.ctypes.data, bits8.ctypes.data, out.ctypes.data, cap,
        sizes.ctypes.data, tbits.ctypes.data)
    if total < 0:
        raise ValueError("native pack_with_code failed")
    return out[:total], sizes, tbits


def decompress(data, out_size: int, block_size: int,
               n_threads: int = 0) -> np.ndarray:
    """data: any contiguous byte buffer (bytes, memoryview, ndarray) --
    the container layer hands over zero-copy views of the stream."""
    lib = _load()
    src = np.frombuffer(data, dtype=np.uint8)  # zero-copy
    # (Measured, not a lever: replacing the codec's pre-zeroing memset
    # with np.zeros + a skip flag is +0.6% -- the memset is 0.26 ms/frame
    # and calloc memsets reused arena chunks anyway.)
    out = np.empty(out_size, dtype=np.uint8)
    rc = lib.he_decompress(src.ctypes.data, src.size, block_size,
                           out.ctypes.data, out_size, n_threads)
    if rc != 0:
        raise ValueError(f"native entropy decompression failed (rc={rc})")
    return out
