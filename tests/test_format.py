"""Container-level robustness: version gates, malformed chunks, API edges."""

import struct

import numpy as np
import pytest

import himg_tpu
from himg_tpu.format.container import FormatError, FormatHeader, RIFFReader, RIFFWriter

from util import make_image


def _patch_chunk(data: bytes, fourcc: bytes, mutate) -> bytes:
    """Apply `mutate(payload) -> payload` to the first chunk with fourcc."""
    buf = bytearray(data)
    pos = 12
    while pos + 8 <= len(buf):
        tag = bytes(buf[pos:pos + 4])
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        if tag == fourcc:
            new = mutate(bytes(buf[pos + 8:pos + 8 + size]))
            out = buf[:pos + 4] + struct.pack("<I", len(new)) + new \
                + buf[pos + 8 + size:]
            out[4:8] = struct.pack("<I", len(out) - 8)
            return bytes(out)
        pos += 8 + size
    raise AssertionError(f"chunk {fourcc} not found")


@pytest.fixture(scope="module")
def blob():
    return himg_tpu.encode(make_image(32, 40, 3, seed=21), 55, True)


def test_version_gate(blob):
    bad = _patch_chunk(blob, b"FRMT",
                       lambda p: bytes([2]) + p[1:])
    with pytest.raises(FormatError, match="version"):
        himg_tpu.decode(bad)


def test_bad_lmap_rejected(blob):
    bad = _patch_chunk(blob, b"LMAP", lambda p: p[:3])
    with pytest.raises(FormatError):
        himg_tpu.decode(bad)


def test_bad_qcfg_rejected(blob):
    bad = _patch_chunk(blob, b"QCFG", lambda p: p[:-1])
    with pytest.raises(FormatError):
        himg_tpu.decode(bad)


def test_missing_chunk_rejected(blob):
    bad = _patch_chunk(blob, b"FMAP", lambda p: p)
    bad = bad.replace(b"FMAP", b"XMAP", 1)
    with pytest.raises(FormatError, match="FMAP"):
        himg_tpu.decode(bad)


def test_corrupt_entropy_never_tracebacks(blob):
    # The format has no checksums, so a flipped payload byte may decode
    # to garbage pixels (as in the reference); the contract is a clean
    # FormatError or a decoded image -- never an unwrapped exception.
    for pos in range(len(blob) // 3, len(blob), len(blob) // 7):
        buf = bytearray(blob)
        buf[pos] ^= 0xFF
        try:
            out = himg_tpu.decode(bytes(buf))
            assert out.dtype == np.uint8
        except FormatError:
            pass


def test_decode_fuzz_never_crashes(blob):
    rng = np.random.default_rng(5)
    for _ in range(25):
        buf = bytearray(blob)
        for _ in range(6):
            buf[int(rng.integers(12, len(buf)))] = int(rng.integers(0, 256))
        try:
            himg_tpu.decode(bytes(buf))
        except FormatError:
            pass


@pytest.mark.parametrize("w,h,c", [
    (1 << 30, 1 << 30, 3),     # multi-GB allocation bait
    (-5, 64, 3), (64, -5, 3),  # negative dimensions
    (0, 0, 1),                 # zero dimensions
    (64, 64, 0),               # zero channels
    ((1 << 24) + 8, 64, 3),    # just past the sanity cap
])
def test_hostile_header_dimensions(blob, w, h, c):
    # A tiny file claiming absurd dimensions must be rejected with a
    # FormatError before any large allocation (the reference trusts the
    # header, decoder.cpp:187-196; we gate it).
    def mutate(p):
        return bytes([p[0]]) + struct.pack("<ii", w, h) + bytes([c, p[10]])
    bad = _patch_chunk(blob, b"FRMT", mutate)
    with pytest.raises(FormatError):
        himg_tpu.decode(bad)


def test_plausible_header_tiny_payload(blob):
    # Dimensions within the sanity caps but far larger than the entropy
    # payload could ever expand to: the budget gate must reject it before
    # allocating rows*cols buffers.
    bad = _patch_chunk(blob, b"FRMT",
                       lambda p: bytes([p[0]]) + struct.pack("<ii", 1 << 14, 1 << 14)
                       + p[9:])
    with pytest.raises(FormatError):
        himg_tpu.decode(bad)


def test_hostile_small_inputs_never_crash():
    # No input of <= 1 KB may escape with anything but FormatError.
    rng = np.random.default_rng(11)
    cases = [b"", b"R", b"RIFF", b"RIFF\x00\x00\x00\x00HIMG"]
    for n in (12, 30, 64, 200, 1024):
        for _ in range(8):
            raw = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
            cases.append(raw)
            cases.append(b"RIFF" + struct.pack("<I", n + 4) + b"HIMG" + raw)
    # Structured variant: valid RIFF + FRMT claiming big dims, no payload.
    frmt = bytes([1]) + struct.pack("<ii", 99999, 99999) + bytes([3, 1])
    cases.append(b"RIFF" + struct.pack("<I", 4 + 8 + len(frmt)) + b"HIMG"
                 + b"FRMT" + struct.pack("<I", len(frmt)) + frmt)
    for data in cases:
        try:
            himg_tpu.decode(data)
        except FormatError:
            pass


def test_entropy_error_labeling(blob):
    # Corruption inside a Huffman chunk must be reported as Huffman data,
    # not as a generic container error -- and vice versa.
    bad = _patch_chunk(blob, b"FRES", lambda p: p[:2])
    with pytest.raises(FormatError, match="FRES"):
        himg_tpu.decode(bad)


def test_grayscale_2d_api():
    img = make_image(24, 24, 1, seed=22)[..., 0]
    data = himg_tpu.encode(img, 50, False)
    out = himg_tpu.decode(data)
    assert out.shape == (24, 24, 1)


@pytest.mark.parametrize("q", [0, 100])
def test_quality_extremes_roundtrip(q):
    img = make_image(32, 32, 3, seed=23)
    out = himg_tpu.decode(himg_tpu.encode(img, q, True))
    assert out.shape == img.shape


def test_riff_writer_reader_roundtrip():
    w = RIFFWriter()
    w.add_chunk("ABCD", b"payload1")
    w.add_chunk("EFGH", b"")
    data = w.tobytes()
    r = RIFFReader(data)
    assert r.find_chunk("ABCD") == b"payload1"
    assert r.find_chunk("EFGH") == b""
    hdr = FormatHeader(640, 480, 3, True)
    assert FormatHeader.deserialize(hdr.serialize()) == hdr
