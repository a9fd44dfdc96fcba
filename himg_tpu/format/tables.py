"""Exact table constructors for the HIMG bitstream.

Everything in this module is tiny, host-side NumPy, and *bit-exactness
critical*: the values produced here are serialized into the bitstream (QCFG /
LMAP / FMAP chunks) and drive the quantizer and coefficient mapper.  The
numeric contracts replicated here come from the reference implementation:

- quality -> scale interpolation: /root/reference/src/lib/quantize.cpp:55-92
  and mapper.cpp:75-97 (C truncating integer division!)
- shift tables (power-of-two quantizer): quantize.cpp:94-125
- mapper tables + MapTo8Bit search quirks: mapper.cpp:159-223

These run once per encode/decode call (microseconds); the hot per-pixel work
consumes their outputs as LUTs on the TPU.
"""

from __future__ import annotations

import numpy as np

# --------------------------------------------------------------------------
# Quantizer base tables (spectral shift magnitudes, luma + chroma).
# Reference: quantize.cpp:19-40 (values borrowed there from libjpeg 6a).
# --------------------------------------------------------------------------

LUMA_SHIFT_BASE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)

CHROMA_SHIFT_BASE = np.array([
    17, 18, 24, 47, 100, 110, 115, 120,
    18, 21, 26, 66, 100, 110, 118, 121,
    24, 26, 56, 100, 100, 110, 120, 122,
    47, 66, 100, 100, 100, 110, 120, 123,
    100, 100, 100, 100, 100, 110, 120, 124,
    110, 110, 110, 110, 110, 110, 110, 123,
    120, 120, 120, 120, 120, 120, 100, 122,
    124, 124, 126, 126, 125, 123, 122, 105,
], dtype=np.int32)

# quality -> global scale factor control points (quantize.cpp:55-66).
_QUALITY_TO_SCALE = [
    (0, 65535), (10, 32512), (20, 13568), (30, 5120), (40, 2560),
    (50, 1024), (60, 768), (80, 256), (100, 0),
]

# quality -> low-res mapper index ramp, in 1/16ths (mapper.cpp:73-82).
_LOWRES_MAP_SCALE = [
    (0, 120), (5, 90), (10, 70), (20, 40), (30, 32), (40, 26),
    (50, 20), (100, 16),
]

# Hand-tuned low-res delta mapping curve (mapper.cpp:17-36).
LOWRES_MAPPING_CURVE = np.array([
    0, 1, 2, 3, 4, 5, 6, 7,
    8, 9, 10, 11, 12, 13, 14, 15,
    16, 17, 18, 19, 20, 21, 22, 23,
    24, 25, 26, 27, 28, 29, 30, 31,
    32, 33, 34, 35, 36, 37, 38, 39,
    40, 41, 42, 43, 44, 45, 46, 47,
    48, 49, 50, 51, 52, 53, 54, 55,
    56, 57, 58, 59, 60, 61, 62, 63,
    64, 65, 67, 68, 70, 71, 73, 74,
    76, 78, 79, 81, 83, 85, 87, 89,
    91, 93, 95, 97, 99, 102, 104, 106,
    109, 111, 114, 117, 119, 122, 125, 128,
    131, 134, 137, 140, 143, 146, 150, 153,
    156, 160, 164, 167, 171, 175, 178, 182,
    186, 190, 195, 199, 203, 207, 212, 216,
    221, 226, 230, 235, 240, 245, 250, 255,
], dtype=np.int16)

# Histogram-tuned full-res coefficient companding curve (mapper.cpp:49-71):
# ~5-bit precision below 50, ~4-bit above, max representable 8039.
FULLRES_MAPPING_CURVE = np.array([
    0, 1, 2, 3, 4, 5, 6, 7,
    8, 9, 10, 11, 12, 13, 14, 15,
    16, 17, 18, 19, 20, 21, 22, 23,
    24, 25, 26, 27, 28, 29, 30, 31,
    32, 33, 34, 35, 36, 37, 38, 39,
    40, 41, 42, 43, 44, 45, 46, 47,
    48, 49, 51, 52, 54, 57, 59, 62,
    65, 68, 72, 76, 81, 86, 92, 98,
    105, 113, 121, 130, 140, 151, 163, 176,
    190, 205, 221, 239, 259, 280, 303, 327,
    354, 382, 413, 446, 482, 520, 561, 605,
    653, 703, 757, 815, 876, 942, 1013, 1087,
    1167, 1252, 1342, 1438, 1540, 1649, 1764, 1885,
    2015, 2151, 2296, 2450, 2612, 2783, 2965, 3156,
    3358, 3571, 3796, 4032, 4282, 4545, 4821, 5112,
    5418, 5740, 6078, 6433, 6806, 7198, 7608, 8039,
], dtype=np.int16)

# Diagonal ("zigzag"-like) reorder of the 8x8 Hadamard spectrum
# (common.cpp:13-22).  ZIGZAG[i] = row-major index of the coefficient stored
# in diagonal slot i.
ZIGZAG = np.array([
    0,
    1, 9, 8,
    16, 17, 18, 10, 2,
    3, 11, 19, 27, 26, 25, 24,
    32, 33, 34, 35, 36, 28, 20, 12, 4,
    5, 13, 21, 29, 37, 45, 44, 43, 42, 41, 40,
    48, 49, 50, 51, 52, 53, 54, 46, 38, 30, 22, 14, 6,
    7, 15, 23, 31, 39, 47, 55, 63, 62, 61, 60, 59, 58, 57, 56,
], dtype=np.int32)

# Inverse permutation: INV_ZIGZAG[row_major_index] = diagonal slot.
INV_ZIGZAG = np.argsort(ZIGZAG).astype(np.int32)


def _trunc_div(a: int, b: int) -> int:
    """C-style integer division (truncates toward zero); b > 0."""
    q = abs(a) // b
    return q if a >= 0 else -q


def _interp_quality(quality: int, table) -> int:
    """Piecewise-linear LUT interpolation with C rounding semantics.

    Replicates the QualityToScale pattern shared by quantize.cpp:72-92 and
    mapper.cpp:84-97: pick the control-point segment by scanning for the
    first entry whose quality exceeds `quality`, then linearly interpolate
    with +denom/2 rounding and *truncating* division.
    """
    n = len(table)
    idx = n - 1
    for i in range(n - 1):
        if table[i + 1][0] > quality:
            idx = i
            break
    if idx >= n - 1:
        return table[n - 1][1]
    q1, s1 = table[idx]
    q2, s2 = table[idx + 1]
    denom = q2 - q1
    return s1 + _trunc_div((s2 - s1) * (quality - q1) + (denom >> 1), denom)


def quality_to_scale(quality: int) -> int:
    """Quality 0-100 -> quantizer scale 0-65535 (65535 = worst quality)."""
    return _interp_quality(quality, _QUALITY_TO_SCALE)


def _nearest_log2(x: np.ndarray) -> np.ndarray:
    """Round-to-nearest log2 of uint16 values (quantize.cpp:94-103).

    For x > 1 this is floor(log2(x)) plus the bit below the MSB (i.e. round
    half up in log space by looking at the second-most-significant bit).
    x in {0, 1} -> 0.
    """
    x = x.astype(np.int64)
    y = np.zeros_like(x)
    rounding = np.zeros_like(x)
    cur = x.copy()
    for _ in range(16):  # uint16 has at most 16 bits
        active = cur > 1
        y = np.where(active, y + 1, y)
        rounding = np.where(active, cur & 1, rounding)
        cur = np.where(active, cur >> 1, cur)
    return y + rounding


def make_shift_table(base: np.ndarray, quality: int) -> np.ndarray:
    """Per-coefficient quantizer shifts for a quality level.

    shift[i] = min(NearestLog2((base[i] * scale + 512) >> 10), 15)
    (quantize.cpp:105-114).  Returns uint8[64].
    """
    scale = quality_to_scale(quality)
    coeff_scale = ((base.astype(np.int64) * scale + 512) >> 10) & 0xFFFF
    return np.minimum(_nearest_log2(coeff_scale), 15).astype(np.uint8)


def make_quantizer(quality: int, has_chroma: bool):
    """(luma_shift[64], chroma_shift[64] or None) for a quality level."""
    luma = make_shift_table(LUMA_SHIFT_BASE, quality)
    chroma = make_shift_table(CHROMA_SHIFT_BASE, quality) if has_chroma else None
    return luma, chroma


def pack_quant_config(luma: np.ndarray, chroma) -> bytes:
    """Serialize shift tables at 4 bits/entry (quantize.cpp:167-186)."""
    out = bytearray()
    for table in ([luma] if chroma is None else [luma, chroma]):
        t = np.asarray(table, dtype=np.uint8)
        out += bytes((t[0::2] << 4) | t[1::2])
    return bytes(out)


def unpack_quant_config(data: bytes, has_chroma: bool):
    """Inverse of pack_quant_config (quantize.cpp:188-213); None if invalid."""
    expected = 64 if has_chroma else 32
    if len(data) != expected:
        return None
    raw = np.frombuffer(data, dtype=np.uint8)

    def unpack32(b):
        t = np.empty(64, dtype=np.uint8)
        t[0::2] = b >> 4
        t[1::2] = b & 15
        return t

    luma = unpack32(raw[:32])
    chroma = unpack32(raw[32:]) if has_chroma else None
    return luma, chroma


# --------------------------------------------------------------------------
# Coefficient mapper: nonlinear signed 16 <-> 8 bit companding.
# --------------------------------------------------------------------------

class MappingTable:
    """A 256-entry signed companding table plus its derived LUTs.

    Layout mirrors the wire format semantics (mapper.h:40-41): `full[128+i]`
    holds the value for signed index i in [-128, 127]; the positive side
    full[128..255] is the 128-entry curve, negatives are mirrored.
    """

    __slots__ = ("full", "_unmap_lut", "_map_lut")

    def __init__(self, full: np.ndarray):
        assert full.shape == (256,) and full.dtype == np.int16
        self.full = full
        self._unmap_lut = None
        self._map_lut = None

    # -- construction ------------------------------------------------------

    @staticmethod
    def from_positive(pos: np.ndarray) -> "MappingTable":
        """Build from the 128-entry positive curve (pos[0] must be 0)."""
        full = np.zeros(256, dtype=np.int16)
        full[128:] = pos
        full[1:128] = -pos[:0:-1]  # full[128-k] = -pos[k]
        full[0] = full[1]  # defensive -128 entry (mapper.cpp:151-155)
        return MappingTable(full)

    @staticmethod
    def for_lowres_quality(quality: int) -> "MappingTable":
        """Low-res delta mapper (mapper.cpp:193-211): quality scales the
        index ramp into the hand-tuned curve, in 1/16th steps."""
        index_scale = _interp_quality(quality, _LOWRES_MAP_SCALE)
        idx = np.minimum((np.arange(128, dtype=np.int32) * index_scale + 8) >> 4, 127)
        return MappingTable.from_positive(LOWRES_MAPPING_CURVE[idx])

    @staticmethod
    def for_fullres_quality(quality: int) -> "MappingTable":
        """Full-res coefficient mapper; quality-independent (mapper.cpp:213-223)."""
        del quality
        return MappingTable.from_positive(FULLRES_MAPPING_CURVE.copy())

    # -- derived LUTs ------------------------------------------------------

    @property
    def positive(self) -> np.ndarray:
        return self.full[128:]

    @property
    def unmap_lut(self) -> np.ndarray:
        """int16[256]: wire byte b (as uint8) -> 16-bit value.

        Wire bytes are two's-complement signed indices (mapper.h:33-35), so
        unmap[b] = full[128 + int8(b)] = full[(128 + b) mod 256].
        """
        if self._unmap_lut is None:
            self._unmap_lut = self.full[(np.arange(256) + 128) % 256].copy()
        return self._unmap_lut

    @property
    def map_lut(self) -> np.ndarray:
        """uint8[65536]: int16 value x (indexed at x + 32768) -> wire byte.

        Replicates the MapTo8Bit nearest-entry search with all of its edge
        rules (mapper.cpp:159-182): linear scan for the first curve entry
        exceeding |x|, back up when the lower neighbour is strictly closer,
        the unconditional final increment, and the "never checks entry 127"
        saturation quirk (everything >= curve[126] maps to index 127).
        """
        if self._map_lut is None:
            t = self.positive.astype(np.int32)
            xs = np.arange(-32768, 32768, dtype=np.int32)
            # int16_t abs semantics: abs(-32768) wraps back to -32768.
            abs_x = np.abs(xs.astype(np.int16)).astype(np.int32)
            # First m in [1, 125] with abs_x < t[m+1] (else 126).
            conds = abs_x[:, None] < t[None, 2:127]
            has = conds.any(axis=1)
            first = conds.argmax(axis=1).astype(np.int32) + 1
            m = np.where(has, first, 126)
            lower = t[np.minimum(m, 126)]
            upper = t[np.minimum(m + 1, 127)]
            dec = has & ((abs_x - lower) < (upper - abs_x))
            m = m - dec.astype(np.int32) + 1
            res = np.where(xs >= 0, m, (-m) & 0xFF)
            res[32768] = 0  # x == 0 -> 0
            self._map_lut = res.astype(np.uint8)
        return self._map_lut

    @property
    def pack_thresholds(self) -> np.ndarray:
        """int32[127]: magnitude step boundaries of the MapTo8Bit function.

        MapTo8Bit's output index is a nondecreasing step function of |x|
        (the curve is increasing), so the index equals the number of
        thresholds <= |x|.  thresholds[k-1] is the smallest magnitude that
        maps to index >= k; unreachable indices get a sentinel above the
        int16 range.  Derived from the exhaustive LUT, hence exactly
        replicates every tie/edge rule; used by the TPU pack kernel as a
        gather-free 127-comparison reduction.
        """
        idx_of_m = self.map_lut[32768:].astype(np.int32)  # x >= 0 side
        th = np.full(127, 1 << 30, dtype=np.int32)
        # reverse cumulative min of first-occurrence positions
        first = np.full(128, 1 << 30, dtype=np.int64)
        vals, pos = np.unique(idx_of_m, return_index=True)
        first[vals] = pos
        for k in range(126, -1, -1):
            first[k] = min(first[k], first[k + 1])
        th[:] = np.minimum(first[1:], 1 << 30)
        return th

    def map_values(self, x: np.ndarray) -> np.ndarray:
        """Vectorized MapTo8Bit over an int16 array."""
        return self.map_lut[x.astype(np.int16).astype(np.int32) + 32768]

    def unmap_values(self, b: np.ndarray) -> np.ndarray:
        """Vectorized UnmapFrom8Bit over a uint8 array."""
        return self.unmap_lut[np.asarray(b, dtype=np.uint8)]

    # -- serialization (mapper.cpp:105-157) --------------------------------

    def num_single_byte_items(self) -> int:
        pos = self.positive
        idx = 1
        while idx < 128 and pos[idx] < 256:
            idx += 1
        return idx - 1

    def serialized_size(self) -> int:
        n = self.num_single_byte_items()
        return 1 + n + 2 * (127 - n)

    def serialize(self) -> bytes:
        pos = self.positive.astype(np.uint16)
        n = self.num_single_byte_items()
        out = bytearray([n])
        out += bytes(pos[1:n + 1].astype(np.uint8))
        for v in pos[n + 1:128]:
            out.append(int(v) & 0xFF)
            out.append(int(v) >> 8)
        return bytes(out)

    @staticmethod
    def deserialize(data: bytes):
        """Parse a LMAP/FMAP chunk; returns None on malformed input."""
        if len(data) < 1:
            return None
        n = data[0]
        if n > 127 or 1 + n + 2 * (127 - n) != len(data):
            return None
        pos = np.zeros(128, dtype=np.int16)
        single = np.frombuffer(data[1:1 + n], dtype=np.uint8)
        pos[1:n + 1] = single
        rest = np.frombuffer(data[1 + n:], dtype="<u2")
        pos[n + 1:128] = rest.astype(np.int16)
        return MappingTable.from_positive(pos)
