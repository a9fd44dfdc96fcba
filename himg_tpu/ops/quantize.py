"""Shift-only quantization + companding, batched over blocks.

Pack (quantize.cpp:127-151): per-coefficient power-of-two shift with
round-to-nearest on the absolute value (negatives are shifted as positives
and re-negated so zero is reachable), then 16->8-bit companding.

Unpack (quantize.cpp:153-165): companding inverse followed by the left
shift, with C++ int16 wrap semantics.

TPU-first formulation: table lookups as data-dependent gathers are slow on
the VPU, so both directions avoid them:

- pack exploits that MapTo8Bit is a nondecreasing step function of |q|
  (tables.MappingTable.pack_thresholds): the wire index is a sum of 127
  vectorized comparisons, with the two edge cases (q == 0 -> 0 and the
  int16-abs-wrap at q == -32768 -> index 1) handled explicitly.  Verified
  bit-equal to the exhaustive LUT over all 65536 inputs in tests.
- unpack one-hot-encodes the 7-bit magnitude and uses two int8 MXU matmuls
  against the low/high bytes of the positive curve; the sign and the
  +-mirrored table layout (mapper.h:40-41) are applied arithmetically.
  Byte 0x80 follows the defensive full[-128] = full[-127] rule
  (mapper.cpp:151-155).

Blocks are [..., 64] in row-major coefficient order; the shift table is the
row-major uint8[64] from format.tables.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def pack(blocks: jnp.ndarray, shift_table: jnp.ndarray,
         thresholds: jnp.ndarray) -> jnp.ndarray:
    """int16 [..., 64] WHT coefficients -> uint8 [..., 64] wire bytes.

    thresholds: int32[127] from MappingTable.pack_thresholds.
    """
    x = blocks.astype(jnp.int32)
    shift = shift_table.astype(jnp.int32)            # [64], broadcasts
    rnd = jnp.where(shift != 0, 1 << jnp.maximum(shift - 1, 0), 0)
    mag = (jnp.abs(x) + rnd) >> shift
    q = jnp.where(x < 0, -mag, mag).astype(jnp.int16)

    q32 = q.astype(jnp.int32)
    aq = jnp.abs(q32)
    idx = (aq[..., None] >= thresholds).sum(axis=-1).astype(jnp.int32)
    # int16 abs wraps at -32768; the reference's search then lands on 1.
    idx = jnp.where(q32 == -32768, 1, idx)
    wire = jnp.where(q32 == 0, 0, jnp.where(q32 > 0, idx, (-idx) & 0xFF))
    return wire.astype(jnp.uint8)


def unpack(data: jnp.ndarray, shift_table: jnp.ndarray,
           pos_curve: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., 64] wire bytes -> int16 [..., 64] WHT coefficients.

    pos_curve: the mapper's 128-entry positive side (MappingTable.positive),
    any int16 values.
    """
    d = data.astype(jnp.int32)
    # Signed index: magnitude + sign, with 0x80 clamped onto index 127
    # (full[-128] == full[-127]).
    mag = jnp.where(d < 128, d, jnp.minimum(256 - d, 127))
    sgn = jnp.where(d < 128, 1, -1)

    # One-hot (int8) x two int8 MXU matmuls against curve byte planes.
    iota = jnp.arange(128, dtype=jnp.int32)
    oh = (mag[..., None] == iota).astype(jnp.int8)
    cu = pos_curve.astype(jnp.int32) & 0xFFFF
    lo = (cu & 0xFF).astype(jnp.int32) - 128          # center into int8
    hi = (cu >> 8).astype(jnp.int32) - 128
    flat = oh.reshape(-1, 128)

    def mm(vec):
        return lax.dot_general(
            flat, vec.astype(jnp.int8).reshape(128, 1),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).reshape(d.shape)

    # Each one-hot row sums exactly one entry, so adding 128 undoes the
    # centering.
    v = (mm(lo) + 128) | ((mm(hi) + 128) << 8)
    v = (v.astype(jnp.int16).astype(jnp.int32)) * sgn

    shift = shift_table.astype(jnp.int32)
    return (v << shift).astype(jnp.int16)
