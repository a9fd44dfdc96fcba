"""Multiplier-less YCbCr color transform (batched, elementwise).

Forward (ycbcr.cpp:15-52):   Y  = (R + 2G + B + 2) >> 2
                             Cb = (B - G + 256) >> 1
                             Cr = (R - G + 256) >> 1
Inverse (ycbcr.cpp:54-82):   Cb' = 2*Cb - 255, Cr' = 2*Cr - 255
                             G = Y - ((Cb' + Cr' + 2) >> 2), B = G + Cb',
                             R = G + Cr', all clamped to [0, 255].

Channels beyond the first three (alpha) pass through untouched.  The
forward transform halves Cb/Cr (lossy by design); decode is deterministic.
Operates on [..., C] uint8 arrays; pure VPU arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb_to_ycbcr(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., C>=3] RGB(+extras) -> YCbCr(+extras)."""
    x = img.astype(jnp.int16)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = (r + 2 * g + b + 2) >> 2
    cb = (b - g + 256) >> 1
    cr = (r - g + 256) >> 1
    out = jnp.stack([y, cb, cr], axis=-1).astype(jnp.uint8)
    if img.shape[-1] > 3:
        out = jnp.concatenate([out, img[..., 3:]], axis=-1)
    return out


def rgb_to_ycbcr_planar(chans: jnp.ndarray) -> jnp.ndarray:
    """uint8 [C>=3, H, W] planar RGB(+extras) -> planar YCbCr(+extras).

    Identical arithmetic to rgb_to_ycbcr, but channel slicing happens on
    the major axis so every vector op runs at full lane occupancy (the
    interleaved form keeps C=3 in the 128-wide lane axis and wastes
    125/128 of the VPU -- measured in tools/microbench)."""
    x = chans.astype(jnp.int16)
    r, g, b = x[0], x[1], x[2]
    y = (r + 2 * g + b + 2) >> 2
    cb = (b - g + 256) >> 1
    cr = (r - g + 256) >> 1
    out = jnp.stack([y, cb, cr], axis=0).astype(jnp.uint8)
    if chans.shape[0] > 3:
        out = jnp.concatenate([out, chans[3:]], axis=0)
    return out


def ycbcr_to_rgb_planar(chans: jnp.ndarray) -> jnp.ndarray:
    """uint8 [C>=3, H, W] planar YCbCr(+extras) -> planar RGB, clamped."""
    x = chans.astype(jnp.int16)
    y, cb, cr = x[0], x[1], x[2]
    cb2 = (cb << 1) - 255
    cr2 = (cr << 1) - 255
    g = y - ((cb2 + cr2 + 2) >> 2)
    b = g + cb2
    r = g + cr2
    out = jnp.clip(jnp.stack([r, g, b], axis=0), 0, 255).astype(jnp.uint8)
    if chans.shape[0] > 3:
        out = jnp.concatenate([out, chans[3:]], axis=0)
    return out


def ycbcr_to_rgb(img: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., C>=3] YCbCr(+extras) -> RGB(+extras), clamped."""
    x = img.astype(jnp.int16)
    y, cb, cr = x[..., 0], x[..., 1], x[..., 2]
    cb2 = (cb << 1) - 255
    cr2 = (cr << 1) - 255
    g = y - ((cb2 + cr2 + 2) >> 2)
    b = g + cb2
    r = g + cr2
    rgb = jnp.stack([r, g, b], axis=-1)
    out = jnp.clip(rgb, 0, 255).astype(jnp.uint8)
    if img.shape[-1] > 3:
        out = jnp.concatenate([out, img[..., 3:]], axis=-1)
    return out
