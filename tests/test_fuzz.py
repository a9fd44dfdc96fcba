"""Structure-aware container/bitstream fuzzing (deterministic).

Several hundred targeted mutations of valid HIMG files are driven
through `himg_tpu.decode` and both native entropy decode paths (the
AVX-512 lockstep groups and the scalar kill-switch `HIMG_SIMD_DECODE=0`):
every mutant must either raise FormatError/ValueError or decode cleanly
to a well-formed buffer -- never crash, hang, or allocate past the
expansion budget gate (pipeline/decode.py:_MAX_EXPANSION).  The
robustness bar is the reference's bounds-checked Huffman decoder
(huffman_dec.cpp:360-415), which rejects hostile trees, bad substream
length prefixes, and oversized run counts without faulting.

All mutations are seeded/positional, so failures reproduce exactly.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

import himg_tpu
from himg_tpu.entropy import native


@pytest.fixture(scope="module")
def base():
    """One valid blob + its source image (module-scoped: one XLA
    compile; every mutant shares the geometry)."""
    rng = np.random.default_rng(42)
    grad = np.linspace(0, 255, 48, dtype=np.float32)
    img = (grad[None, :, None] + rng.normal(0, 14, (40, 48, 3)))
    img = np.clip(img, 0, 255).astype(np.uint8)
    blob = himg_tpu.encode(img, 60, True)
    return img, blob


def _chunks(data: bytes):
    """Walk the RIFF layout: yields (fourcc, header_off, payload_off,
    size) for each chunk."""
    out = []
    pos = 12                                   # RIFF + size + form type
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4:pos + 8])
        out.append((fourcc, pos, pos + 8, size))
        pos += 8 + size          # HIMG's RIFF dialect has no odd padding
    return out


def _check(mutant: bytes, h: int, w: int):
    """Decode a mutant: FormatError or a well-formed image, nothing else."""
    try:
        out = himg_tpu.decode(mutant)
    except himg_tpu.FormatError:
        return 0
    assert isinstance(out, np.ndarray) and out.dtype == np.uint8
    # Dimension-field mutants may legitimately change the output shape;
    # what must hold is that the decoder's own header gates sized it.
    assert out.ndim == 3 and out.size <= (1 << 26)
    return 1


def test_fuzz_container_structure(base):
    """Chunk fourcc edits, size-field edits, truncations, chunk-order
    damage: FormatError or clean decode on every mutant."""
    img, blob = base
    h, w = img.shape[:2]
    chunks = _chunks(blob)
    assert [c[0] for c in chunks[:2]] == [b"FRMT", b"LMAP"]
    survivors = 0

    # fourcc edits: every chunk, every byte, two replacement values.
    for _, hoff, _, _ in chunks:
        for k in range(4):
            for val in (0x00, 0x7A):
                buf = bytearray(blob)
                buf[hoff + k] = val
                survivors += _check(bytes(buf), h, w)

    # size-field edits: +-1, zero, huge, and size -> size of next chunk.
    for _, hoff, _, size in chunks:
        for val in (size - 1, size + 1, 0, 0xFFFFFFFF, 0x7FFFFFFF,
                    size ^ 0x8000):
            buf = bytearray(blob)
            buf[hoff + 4:hoff + 8] = struct.pack("<I", val & 0xFFFFFFFF)
            survivors += _check(bytes(buf), h, w)

    # RIFF header damage.
    for off in range(12):
        buf = bytearray(blob)
        buf[off] ^= 0xFF
        survivors += _check(bytes(buf), h, w)

    # Truncations: every 37 bytes plus all near-end positions.
    points = list(range(0, len(blob), 37)) + list(range(len(blob) - 8,
                                                        len(blob)))
    for k in points:
        survivors += _check(blob[:k], h, w)

    # A mutant stream may decode cleanly (e.g. payload-only damage), but
    # structure-level damage should overwhelmingly be *rejected*.
    assert survivors < 40


def test_fuzz_header_fields(base):
    """FRMT dimension/channel/flag bytes: every byte of the header
    payload takes hostile values; dims are gated before allocation."""
    img, blob = base
    h, w = img.shape[:2]
    (fourcc, hoff, poff, size) = _chunks(blob)[0]
    assert fourcc == b"FRMT"
    for k in range(size):
        for val in (0x00, 0x01, 0x7F, 0x80, 0xFF):
            buf = bytearray(blob)
            buf[poff + k] = val
            _check(bytes(buf), h, w)


def test_fuzz_entropy_payloads(base):
    """Hostile tree bits, substream length prefixes, run counts: dense
    positional flips over the head of LRES/FRES (tree + directory live
    there) plus seeded flips over the whole payloads."""
    img, blob = base
    h, w = img.shape[:2]
    rng = np.random.default_rng(1234)
    for fourcc, hoff, poff, size in _chunks(blob):
        if fourcc not in (b"LRES", b"FRES", b"LMAP", b"FMAP", b"QCFG"):
            continue
        # Head bytes: Huffman tree serialization + 15(+17)-bit substream
        # length prefixes sit in the first tens of bytes.
        for k in range(min(size, 48)):
            for val in (0x00, 0xFF, blob[poff + k] ^ 0x01,
                        blob[poff + k] ^ 0x80):
                buf = bytearray(blob)
                buf[poff + k] = val
                _check(bytes(buf), h, w)
        # Seeded flips across the body (run counts, literal codes).
        for _ in range(60):
            buf = bytearray(blob)
            for _ in range(int(rng.integers(1, 6))):
                buf[poff + int(rng.integers(0, size))] = int(
                    rng.integers(0, 256))
            _check(bytes(buf), h, w)


def test_fuzz_native_decode_paths(base, monkeypatch):
    """The same hostile-stream classes straight into the native decoder,
    on BOTH the SIMD lockstep path and the scalar kill-switch path: no
    crash, and when both succeed they must agree byte-for-byte."""
    if not native.available():
        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(7)
    # >= 8 blocks of real size so the AVX-512 group path engages.
    data = rng.integers(0, 256, 16 * 2048).astype(np.uint8)
    data[3000:9000] = 0                       # runs for the RLE symbols
    comp = bytearray(native.compress(data, 2048))

    def both(mutant: bytes):
        outs = []
        for simd in ("1", "0"):
            monkeypatch.setenv("HIMG_SIMD_DECODE", simd)
            try:
                outs.append(np.asarray(
                    native.decompress(mutant, data.size, 2048, 1)))
            except ValueError:
                outs.append(None)
        if outs[0] is not None and outs[1] is not None:
            assert np.array_equal(outs[0], outs[1]), \
                "SIMD and scalar decodes diverged on a corrupt stream"

    # Tree bits + substream length prefixes: dense over the head.
    for k in range(48):
        for val in (0x00, 0xFF, comp[k] ^ 0x01):
            m = bytearray(comp)
            m[k] = val
            both(bytes(m))
    # Oversized run counts / body damage: seeded flips.
    for _ in range(120):
        m = bytearray(comp)
        for _ in range(int(rng.integers(1, 8))):
            m[int(rng.integers(0, len(m)))] = int(rng.integers(0, 256))
        both(bytes(m))
    # Truncations.
    for k in range(0, len(comp), max(1, len(comp) // 64)):
        both(bytes(comp[:k]))
    monkeypatch.delenv("HIMG_SIMD_DECODE", raising=False)
