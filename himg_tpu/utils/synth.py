"""Shared synthetic photographic-like test content for the benchmarks.

One generator so every harness (bench.py, tools/bench256, tools/microbench)
times the same content statistics; the sin/cos base approximates smooth
photographic gradients and the per-frame noise keeps entropy realistic.
"""

from __future__ import annotations

import numpy as np


def synth_frames(b: int, h: int, w: int, c: int = 3,
                 seed: int = 42) -> np.ndarray:
    """uint8 [B, H, W, C] synthetic frames (smooth base + noise).

    Noise is drawn independently PER CHANNEL (like sensor noise): shared
    per-frame noise cancels in the YCbCr chroma differences and makes the
    content ~20% more compressible, which would silently inflate the
    entropy-stage numbers relative to the round-1/2 baselines.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 100 * np.sin(xx / 17.0) * np.cos(yy / 23.0)).astype(
        np.float32)
    frames = np.empty((b, h, w, c), np.uint8)
    for k in range(b):
        for ch in range(c):
            frames[k, ..., ch] = (base + rng.normal(0, 10, (h, w))
                                  + 20 * ch + 5 * k) % 256
    return frames


def real_frames(b: int, h: int, w: int, c: int = 3) -> np.ndarray:
    """uint8 [B, H, W, C] frames tiled from real photographs.

    Sources are scikit-learn's bundled sample photos (china.jpg,
    flower.jpg; BSD-licensed, shipped with the package -- no network).
    Each frame tiles one photo with a per-frame pixel offset so frames
    differ while keeping true photographic statistics; entropy-stage
    numbers on this content are the content-robustness row next to the
    synthetic baseline (BASELINE.md).
    """
    from sklearn.datasets import load_sample_images
    photos = load_sample_images().images
    frames = np.empty((b, h, w, c), np.uint8)
    for k in range(b):
        src = np.asarray(photos[k % len(photos)], np.uint8)[..., :c]
        if c > src.shape[-1]:
            src = np.concatenate(
                [src] + [src[..., -1:]] * (c - src.shape[-1]), axis=-1)
        sh, sw = src.shape[:2]
        oy, ox = (37 * k) % sh, (61 * k) % sw
        ty = -(-(h + oy) // sh)
        tx = -(-(w + ox) // sw)
        big = np.tile(src, (ty, tx, 1))
        frames[k] = big[oy:oy + h, ox:ox + w]
    return frames


def pack_rgbx(frames: np.ndarray) -> np.ndarray:
    """uint8 [B, H, W, C<=4] -> packed uint32 [B, H, W] (channel k in
    byte k, little-endian) for BatchCodec's packed pixel format."""
    out = np.zeros(frames.shape[:3], np.uint32)
    for k in range(frames.shape[-1]):
        out |= frames[..., k].astype(np.uint32) << (8 * k)
    return out
