"""Shared test helpers: oracle invocation and test-image generation."""

from __future__ import annotations

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


def oracle_encode(oracle_dir, img: np.ndarray, quality: int, use_ycbcr: bool,
                  tmp_path) -> bytes:
    raw = tmp_path / "in.raw"
    out = tmp_path / "out.himg"
    img.tofile(raw)
    h, w, c = img.shape
    subprocess.run(
        [str(oracle_dir / "oracle"), "encode", str(raw), str(w), str(h),
         str(c), str(quality), str(int(use_ycbcr)), str(out)],
        check=True, capture_output=True)
    return out.read_bytes()


def oracle_decode(oracle_dir, data: bytes, tmp_path):
    """Returns the decoded image, or None if the reference decoder fails.

    The reference cannot decode its own output when a chunk compresses
    below one block's uncompressed size (HuffmanDec compares block_size
    against the *compressed* size, huffman_dec.h/cpp:221-259) -- callers
    treat None as 'reference bug, skip comparison'.
    """
    inp = tmp_path / "in.himg"
    out = tmp_path / "out.raw"
    inp.write_bytes(data)
    proc = subprocess.run(
        [str(oracle_dir / "oracle"), "decode", str(inp), str(out)],
        capture_output=True)
    if proc.returncode != 0:
        return None
    d = out.read_bytes()
    w, h, c = np.frombuffer(d[:12], dtype=np.uint32)
    return np.frombuffer(d[12:], dtype=np.uint8).reshape(h, w, c)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10 * np.log10(255.0 ** 2 / mse)
