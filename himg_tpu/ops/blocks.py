"""Image <-> 8x8 block-grid layout transforms and the coefficient interleave.

TPU-shape design: a [H, W] channel plane becomes a [rows, cols, 8, 8]
block tensor in one reshape/transpose (XLA handles these as cheap layout
ops), with the reference's exact edge-padding quirks applied up front:

- right padding replicates the last image column per row
  (encoder.cpp:26-52's per-row `col` carry)
- bottom padding fills every padded row of a block with the single value at
  the block's bottom-right valid pixel (the reference keeps the last
  scanned value in `col` and floods the remaining rows with it)

The FRES coefficient interleave (encoder.cpp:320-326) stores the 64
diagonal-reordered coefficient planes contiguously per block row so that
same-frequency bytes are adjacent for the RLE stage.  Per block row, per
channel: plane i at [i * cols .. (i+1) * cols) holds zigzag slot i of every
block.  Here that's a gather + transpose over the whole image at once.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..format.tables import ZIGZAG


def pad_to_blocks(plane: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W] -> [H8, W8] with HIMG's replication quirks (see above)."""
    h, w = plane.shape
    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    out = plane
    if w8 != w:
        out = jnp.concatenate(
            [out, jnp.broadcast_to(out[:, w - 1:w], (h, w8 - w))], axis=1)
    if h8 != h:
        # Bottom rows of each edge block replicate the value at that block's
        # bottom-right corner (column 8u+7 of the last valid row).
        last = out[h - 1]                                 # [W8]
        fill = last.reshape(w8 // 8, 8)[:, 7:8]           # [cols, 1]
        fill = jnp.broadcast_to(fill, (w8 // 8, 8)).reshape(w8)
        out = jnp.concatenate(
            [out, jnp.broadcast_to(fill[None, :], (h8 - h, w8))], axis=0)
    return out


def to_blocks(plane: jnp.ndarray) -> jnp.ndarray:
    """[H8, W8] -> [rows, cols, 8, 8] (H8, W8 multiples of 8)."""
    h8, w8 = plane.shape
    return plane.reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)


def from_blocks(blocks: jnp.ndarray) -> jnp.ndarray:
    """[rows, cols, 8, 8] -> [rows*8, cols*8]."""
    r, c = blocks.shape[0], blocks.shape[1]
    return blocks.transpose(0, 2, 1, 3).reshape(r * 8, c * 8)


def interleave_coefficients(packed: jnp.ndarray) -> jnp.ndarray:
    """[rows, cols, 64] packed bytes -> [rows, 64, cols] interleaved planes.

    Plane i of a row holds packed[:, ZIGZAG[i]] for every block u
    (encoder.cpp:320-326: unpacked[u + i*cols] = packed[kIndexLUT[i]]).
    """
    zz = jnp.asarray(np.asarray(ZIGZAG))
    return packed[:, :, zz].transpose(0, 2, 1)


def to_plane_major(plane: jnp.ndarray) -> jnp.ndarray:
    """[H8, W8] -> [rows, 8(y), 8(x), cols] plane-major block layout.

    One XLA transpose; all downstream per-block math then runs with the
    wide `cols` axis minor (full vector-lane occupancy).
    """
    h8, w8 = plane.shape
    x = plane.reshape(h8 // 8, 8, w8 // 8, 8)
    return x.transpose(0, 1, 3, 2)


def from_plane_major(pm: jnp.ndarray) -> jnp.ndarray:
    """[rows, 8, 8, cols] -> [rows*8, cols*8]."""
    r, _, _, c = pm.shape
    return pm.transpose(0, 1, 3, 2).reshape(r * 8, c * 8)


# Zigzag as a permutation of the flattened (y, x) sublane axis: plane i of
# the interleaved FRES layout is row-major position ZIGZAG[i].
_ZZ = np.asarray(ZIGZAG)
_INV_ZZ = np.argsort(_ZZ)


def permute_rows(x: jnp.ndarray, perm, axis: int) -> jnp.ndarray:
    """Static permutation along `axis` as stacked slices (no gather)."""
    slices = [jax.lax.index_in_dim(x, int(i), axis, keepdims=False)
              for i in perm]
    return jnp.stack(slices, axis=axis)


def pm_to_interleaved(pm: jnp.ndarray, axis: int = -3) -> jnp.ndarray:
    """[..., 8, 8, cols] plane-major -> [..., 64, cols] FRES layout.

    Plane i of the interleave holds zigzag slot i (encoder.cpp:320-326);
    `axis` addresses the resulting 64-sized dimension.
    """
    shape = pm.shape[:-3] + (64,) + pm.shape[-1:]
    return permute_rows(pm.reshape(shape), _ZZ, axis)


def interleaved_to_pm(planes: jnp.ndarray, axis: int = -2) -> jnp.ndarray:
    """[..., 64, cols] FRES layout -> [..., 8, 8, cols] plane-major."""
    flat = permute_rows(planes, _INV_ZZ, axis)
    return flat.reshape(flat.shape[:-2] + (8, 8) + flat.shape[-1:])


def deinterleave_coefficients(planes: jnp.ndarray) -> jnp.ndarray:
    """[rows, 64, cols] interleaved planes -> [rows, cols, 64] packed bytes.

    Inverse gather of interleave_coefficients (decoder.cpp:371-392).
    """
    inv = jnp.asarray(np.argsort(np.asarray(ZIGZAG)))
    return planes.transpose(0, 2, 1)[:, :, inv]
