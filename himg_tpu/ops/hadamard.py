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

import jax.numpy as jnp

# Output permutation of the 8-point butterfly's final stage: stage-2 value
# feeding each output slot (hadamard.cpp:36-43).
#   out = [b0+b1, b4+b5, b6+b7, b2+b3, b2-b3, b6-b7, b4-b5, b0-b1]


def _butterfly8(x: jnp.ndarray, axis: int, out_dtype) -> jnp.ndarray:
    """One 8-point Hadamard butterfly along `axis` with HIMG's permutation."""
    x = jnp.moveaxis(x, axis, -1)
    lo, hi = x[..., 0:4], x[..., 4:8]
    a03 = lo + hi                       # a0..a3
    a47 = lo - hi                       # a4..a7
    b0 = a03[..., 0] + a03[..., 2]
    b1 = a03[..., 1] + a03[..., 3]
    b2 = a03[..., 0] - a03[..., 2]
    b3 = a03[..., 1] - a03[..., 3]
    b4 = a47[..., 0] + a47[..., 2]
    b5 = a47[..., 1] + a47[..., 3]
    b6 = a47[..., 0] - a47[..., 2]
    b7 = a47[..., 1] - a47[..., 3]
    y = jnp.stack([
        b0 + b1, b4 + b5, b6 + b7, b2 + b3,
        b2 - b3, b6 - b7, b4 - b5, b0 - b1,
    ], axis=-1).astype(out_dtype)
    return jnp.moveaxis(y, -1, axis)


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
