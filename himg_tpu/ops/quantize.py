"""Shift-only quantization + companding, batched over blocks.

Pack (quantize.cpp:127-151): per-coefficient power-of-two shift with
round-to-nearest on the absolute value (negatives are shifted as positives
and re-negated so zero is reachable), then 16->8-bit companding through the
mapper's exhaustive MapTo8Bit LUT (a [65536] uint8 gather).

Unpack (quantize.cpp:153-165): mapper unmap (a [256] int16 gather) followed
by the left shift, with C++ int16 wrap semantics.

Blocks are [..., 64] in row-major coefficient order; the shift table is the
row-major uint8[64] from format.tables.
"""

from __future__ import annotations

import jax.numpy as jnp


def pack(blocks: jnp.ndarray, shift_table: jnp.ndarray,
         map_lut: jnp.ndarray) -> jnp.ndarray:
    """int16 [..., 64] WHT coefficients -> uint8 [..., 64] wire bytes."""
    x = blocks.astype(jnp.int32)
    shift = shift_table.astype(jnp.int32)            # [64], broadcasts
    rnd = jnp.where(shift != 0, 1 << jnp.maximum(shift - 1, 0), 0)
    mag = (jnp.abs(x) + rnd) >> shift
    q = jnp.where(x < 0, -mag, mag).astype(jnp.int16)
    idx = q.astype(jnp.int32) + 32768
    # int32-typed gather (sub-32-bit gathers hit XLA slow paths).
    return map_lut.astype(jnp.int32)[idx].astype(jnp.uint8)


def unpack(data: jnp.ndarray, shift_table: jnp.ndarray,
           unmap_lut: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., 64] wire bytes -> int16 [..., 64] WHT coefficients."""
    v = unmap_lut.astype(jnp.int32)[data.astype(jnp.int32)]
    shift = shift_table.astype(jnp.int32)
    return (v << shift).astype(jnp.int16)
