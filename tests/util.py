"""Shared test helpers: oracle invocation and test-image generation.

Oracle invocations are memoized content-addressed under
``build-ref/oracle_cache`` (the reference C++ is deterministic integer
code, so outputs are stable golden files): repeated suite runs and the
encode/decode test pairs that share a config skip the process spawn and
the reference encode entirely.  Delete the directory to force live
regeneration against the oracle binaries.
"""

from __future__ import annotations

import hashlib
import subprocess

import numpy as np


def make_image(h: int, w: int, c: int, seed: int = 7, noise: float = 20.0):
    """Smooth structured image + noise (more codec-realistic than noise)."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = 128 + 100 * np.sin(xx / 17.0) * np.cos(yy / 23.0)
    img = np.stack(
        [(base + rng.normal(0, noise, (h, w)) + 30 * k) % 256 for k in range(c)],
        axis=-1)
    return img.astype(np.uint8)


def _cache_path(oracle_dir, kind: str, payload: bytes):
    d = oracle_dir / "oracle_cache"
    d.mkdir(exist_ok=True)
    return d / f"{kind}-{hashlib.sha1(payload).hexdigest()}.bin"


def oracle_encode(oracle_dir, img: np.ndarray, quality: int, use_ycbcr: bool,
                  tmp_path) -> bytes:
    h, w, c = img.shape
    key = (f"enc1|{w}x{h}x{c}|{quality}|{int(use_ycbcr)}|".encode()
           + img.tobytes())
    cached = _cache_path(oracle_dir, "enc", key)
    if cached.exists():
        return cached.read_bytes()
    raw = tmp_path / "in.raw"
    out = tmp_path / "out.himg"
    img.tofile(raw)
    subprocess.run(
        [str(oracle_dir / "oracle"), "encode", str(raw), str(w), str(h),
         str(c), str(quality), str(int(use_ycbcr)), str(out)],
        check=True, capture_output=True)
    data = out.read_bytes()
    cached.write_bytes(data)
    return data


def oracle_decode(oracle_dir, data: bytes, tmp_path):
    """Returns the decoded image, or None if the reference decoder fails.

    The reference cannot decode its own output when a chunk compresses
    below one block's uncompressed size (HuffmanDec compares block_size
    against the *compressed* size, huffman_dec.h/cpp:221-259) -- callers
    treat None as 'reference bug, skip comparison'.
    """
    cached = _cache_path(oracle_dir, "dec", data)
    if cached.exists():
        d = cached.read_bytes()
    else:
        inp = tmp_path / "in.himg"
        out = tmp_path / "out.raw"
        inp.write_bytes(data)
        proc = subprocess.run(
            [str(oracle_dir / "oracle"), "decode", str(inp), str(out)],
            capture_output=True)
        d = out.read_bytes() if proc.returncode == 0 else b""
        # Cache successes only: a transient failure (OOM, disk, signal)
        # must not be content-addressed into a permanent empty sentinel
        # that silently skips the comparison forever (ADVICE r4).  The
        # known reference decode bug re-runs live each time -- it is a
        # cheap subprocess on a tiny input.
        if proc.returncode == 0:
            cached.write_bytes(d)
    if not d:
        return None
    w, h, c = np.frombuffer(d[:12], dtype=np.uint32)
    return np.frombuffer(d[12:], dtype=np.uint8).reshape(h, w, c)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10 * np.log10(255.0 ** 2 / mse)
