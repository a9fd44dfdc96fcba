"""Batched 8x8 Walsh-Hadamard transform, TPU-native.

The reference implements the WHT as a serial per-block butterfly
(hadamard.cpp:14-74).  Here the same butterfly network runs as pure VPU
vector arithmetic over an arbitrary leading batch of blocks at once:
`x[..., 8, 8] -> y[..., 8, 8]`, rows then columns, with the exact integer
semantics of the reference:

- forward: int16 arithmetic throughout (wraps on overflow, matching C++
  int16 stores; valid pixel data never overflows), *no* scaling, and the
  specific output permutation of hadamard.cpp:36-43
- inverse: int32 intermediates with an arithmetic >>3 per pass (total /64)
  and a final wrap to int16 (hadamard.cpp:47-74)

The butterfly shape is preserved instead of using an MXU matmul because the
transform is additions only (48 VPU adds per 64 int16 lanes) and exactness
under int16 wraparound is part of the format contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Output permutation of the 8-point butterfly's final stage: stage-2 value
# feeding each output slot (hadamard.cpp:36-43).
#   out = [b0+b1, b4+b5, b6+b7, b2+b3, b2-b3, b6-b7, b4-b5, b0-b1]


def _butterfly8(x: jnp.ndarray, axis: int, out_dtype) -> jnp.ndarray:
    """One 8-point Hadamard butterfly along `axis` with HIMG's permutation.

    Implemented as static slices along `axis` (never a transpose) so the
    minor/vector dimension of the operands is preserved.
    """
    v = [jax.lax.index_in_dim(x, i, axis, keepdims=False) for i in range(8)]
    a = [v[0] + v[4], v[1] + v[5], v[2] + v[6], v[3] + v[7],
         v[0] - v[4], v[1] - v[5], v[2] - v[6], v[3] - v[7]]
    b0 = a[0] + a[2]
    b1 = a[1] + a[3]
    b2 = a[0] - a[2]
    b3 = a[1] - a[3]
    b4 = a[4] + a[6]
    b5 = a[5] + a[7]
    b6 = a[4] - a[6]
    b7 = a[5] - a[7]
    y = jnp.stack([
        b0 + b1, b4 + b5, b6 + b7, b2 + b3,
        b2 - b3, b6 - b7, b4 - b5, b0 - b1,
    ], axis=axis if axis >= 0 else x.ndim + axis).astype(out_dtype)
    return y


def forward(blocks: jnp.ndarray) -> jnp.ndarray:
    """Forward 2-D WHT of int16 blocks [..., 8, 8]; unscaled.

    Rows first, then columns, each pass stored back to int16
    (hadamard.cpp:78-88).
    """
    x = blocks.astype(jnp.int16)
    x = _butterfly8(x, -1, jnp.int16)   # rows
    x = _butterfly8(x, -2, jnp.int16)   # columns
    return x


def inverse(blocks: jnp.ndarray) -> jnp.ndarray:
    """Inverse 2-D WHT including /64 of int16 blocks [..., 8, 8].

    Each pass runs in int32 and applies an arithmetic >>3 before the int16
    store (hadamard.cpp:47-74, 90-103).
    """
    x = blocks.astype(jnp.int32)
    x = _butterfly8(x, -1, jnp.int32) >> 3
    x = x.astype(jnp.int16).astype(jnp.int32)
    x = _butterfly8(x, -2, jnp.int32) >> 3
    return x.astype(jnp.int16)


# --------------------------------------------------------------------------
# Plane-major layout [..., 8(y), 8(x), cols]: the transform axes sit in
# sublanes while the minor axis is the wide block-column dimension, so each
# butterfly line is a full-width vector add -- the TPU-native layout (the
# [..., 8, 8]-minor layout wastes 15/16 of every vector register on lane
# padding).
# --------------------------------------------------------------------------

def forward_pm(x: jnp.ndarray) -> jnp.ndarray:
    """Forward WHT on plane-major int16 [..., 8, 8, cols]."""
    x = x.astype(jnp.int16)
    x = _butterfly8(x, -2, jnp.int16)   # mix x within each row
    x = _butterfly8(x, -3, jnp.int16)   # mix y
    return x


def inverse_pm(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse WHT (incl. /64) on plane-major int16 [..., 8, 8, cols]."""
    x = x.astype(jnp.int32)
    x = _butterfly8(x, -2, jnp.int32) >> 3
    x = x.astype(jnp.int16).astype(jnp.int32)
    x = _butterfly8(x, -3, jnp.int32) >> 3
    return x.astype(jnp.int16)
