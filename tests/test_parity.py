"""End-to-end bitstream conformance vs the reference chimg/dhimg pipeline.

Policy on known reference bugs (SURVEY.md section 4.3):

- decode comparisons use width % 8 == 0 (the reference's
  RestoreChannelBlock slow path mis-addresses right-edge blocks);
- when the reference decoder rejects a well-compressing file (its
  HuffmanDec compares block_size against the *compressed* size), the
  oracle returns None and we assert only our own roundtrip.
"""

import numpy as np
import pytest

import himg_tpu

from util import make_image, oracle_decode, oracle_encode, psnr

CONFIGS = [
    # (h, w, c, quality, use_ycbcr)
    (64, 64, 1, 50, False),
    (128, 64, 3, 50, True),
    (64, 128, 3, 75, True),
    (64, 64, 4, 90, True),
    (64, 64, 3, 30, False),
    (40, 48, 1, 10, False),
    (24, 120, 3, 95, True),
]


@pytest.mark.parametrize("h,w,c,q,ycbcr", CONFIGS)
def test_encode_byte_identical(oracle_dir, tmp_path, h, w, c, q, ycbcr):
    img = make_image(h, w, c)
    ref = oracle_encode(oracle_dir, img, q, ycbcr, tmp_path)
    assert himg_tpu.encode(img, q, ycbcr) == ref


@pytest.mark.parametrize("h,w,c,q,ycbcr", CONFIGS)
def test_decode_matches_reference(oracle_dir, tmp_path, h, w, c, q, ycbcr):
    img = make_image(h, w, c)
    ref_bytes = oracle_encode(oracle_dir, img, q, ycbcr, tmp_path)
    mine = himg_tpu.decode(ref_bytes)
    ref_img = oracle_decode(oracle_dir, ref_bytes, tmp_path)
    if ref_img is None:
        # Reference decoder bug on well-compressed files; check quality only.
        assert psnr(mine, img) > 18
        return
    assert np.array_equal(mine, ref_img)


@pytest.mark.parametrize("q", [0, 100])
def test_quality_extremes_byte_identical(oracle_dir, tmp_path, q):
    # Whole-file parity at the quality endpoints (the table-level parity in
    # test_tables.py covers the LUTs; this pins the full pipeline).
    img = make_image(64, 64, 3)
    ref = oracle_encode(oracle_dir, img, q, True, tmp_path)
    assert himg_tpu.encode(img, q, True) == ref
    ref_img = oracle_decode(oracle_dir, ref, tmp_path)
    if ref_img is not None:
        assert np.array_equal(himg_tpu.decode(ref), ref_img)


def _adversarial_images():
    flat = np.full((64, 64, 3), 128, np.uint8)
    checker = (np.indices((64, 64)).sum(axis=0) % 2 * 255).astype(np.uint8)
    max_contrast = np.stack([checker, 255 - checker, checker], axis=-1)
    zero_chan = make_image(64, 64, 3)
    zero_chan[..., 1] = 0
    extremes = np.zeros((64, 64, 3), np.uint8)
    extremes[:32] = 255
    return [("flat", flat), ("max-contrast", max_contrast),
            ("zero-channel", zero_chan), ("half-extremes", extremes)]


@pytest.mark.parametrize("name,img", _adversarial_images(),
                         ids=[n for n, _ in _adversarial_images()])
@pytest.mark.parametrize("q", [10, 50, 95])
def test_adversarial_content_byte_identical(oracle_dir, tmp_path, name, img, q):
    # Degenerate statistics stress the Huffman tie-breaking (single-symbol
    # trees, all-zero planes) and the WHT's int16 wrap corners.
    ref = oracle_encode(oracle_dir, img, q, True, tmp_path)
    assert himg_tpu.encode(img, q, True) == ref
    ref_img = oracle_decode(oracle_dir, ref, tmp_path)
    if ref_img is not None:
        assert np.array_equal(himg_tpu.decode(ref), ref_img)


ODD_GEOMETRIES = [
    # Non-multiple-of-8 h/w: pins ExtractChannelBlock's edge padding
    # (reference encoder.cpp:26-52 — right-column replication and
    # bottom-row flooding with the block's bottom-right valid pixel,
    # reimplemented in ops/blocks.py) by whole-file oracle identity.
    # Encode-side only: the reference *decoder* mis-addresses right-edge
    # blocks when width % 8 != 0 (decoder.cpp:63-72), so decode parity
    # stays gated per the policy at the top of this file.
    (1, 1), (7, 5), (8, 9), (9, 8), (17, 23), (64, 63), (63, 64), (33, 41),
]


@pytest.mark.parametrize("h,w", ODD_GEOMETRIES)
@pytest.mark.parametrize("q", [10, 60, 95])
def test_odd_geometry_encode_byte_identical(oracle_dir, tmp_path, h, w, q):
    img = make_image(h, w, 3, seed=h * 100 + w)
    ref = oracle_encode(oracle_dir, img, q, True, tmp_path)
    assert himg_tpu.encode(img, q, True) == ref
    # Grayscale exercises the single-channel padding path too.
    img1 = make_image(h, w, 1, seed=h * 100 + w + 7)
    ref1 = oracle_encode(oracle_dir, img1, q, False, tmp_path)
    assert himg_tpu.encode(img1, q, False) == ref1


def test_odd_sizes_roundtrip():
    # Non-multiple-of-8 sizes: encode parity holds (checked above for
    # h=40); decoding our own stream must reproduce exact dimensions.
    for (h, w) in [(17, 23), (8, 9), (33, 64)]:
        img = make_image(h, w, 3)
        data = himg_tpu.encode(img, 60, True)
        out = himg_tpu.decode(data)
        assert out.shape == (h, w, 3)
        assert psnr(out, img) > 20


def test_psnr_monotone_in_quality():
    img = make_image(64, 64, 3, noise=10)
    scores = []
    sizes = []
    for q in [10, 30, 50, 70, 90]:
        data = himg_tpu.encode(img, q, True)
        out = himg_tpu.decode(data)
        scores.append(psnr(out, img))
        sizes.append(len(data))
    assert all(b >= a - 0.3 for a, b in zip(scores, scores[1:])), scores
    assert all(b >= a for a, b in zip(sizes, sizes[1:])), sizes


def test_decode_rejects_garbage():
    with pytest.raises(himg_tpu.FormatError):
        himg_tpu.decode(b"not a riff file at all")
    img = make_image(16, 16, 1)
    data = bytearray(himg_tpu.encode(img, 50, False))
    data[4] ^= 0xFF  # corrupt RIFF size
    with pytest.raises(himg_tpu.FormatError):
        himg_tpu.decode(bytes(data))


def test_unknown_chunks_are_skipped():
    img = make_image(16, 16, 1)
    data = himg_tpu.encode(img, 50, False)
    # Splice an unknown chunk between FRMT and LMAP.
    import struct
    frmt_end = 12 + 8 + 11
    extra = b"XTRA" + struct.pack("<I", 3) + b"abc"
    spliced = bytearray(data[:frmt_end] + extra + data[frmt_end:])
    new_size = len(spliced) - 8
    spliced[4:8] = struct.pack("<I", new_size)
    out = himg_tpu.decode(bytes(spliced))
    assert np.array_equal(out, himg_tpu.decode(data))


def test_batch_codec_matches_single():
    from himg_tpu.pipeline.batch import BatchCodec
    frames = np.stack([make_image(64, 48, 3, seed=s) for s in range(6)])
    # host_threads fans the per-frame entropy/container work across a
    # pool (the multi-core host stage); output must stay byte-identical.
    codec = BatchCodec(64, 48, 3, 60, True, chunk=4, host_threads=4)
    blobs = codec.encode_batch(frames)
    for i in range(6):
        assert blobs[i] == himg_tpu.encode(frames[i], 60, True)
    dec = codec.decode_batch(blobs)
    for i in range(6):
        assert np.array_equal(dec[i], himg_tpu.decode(blobs[i]))


def test_batch_codec_packed_format_matches():
    """The packed-u32 pixel format (production path: no u8 interleave
    transposes on device) must emit byte-identical blobs and decode to the
    same pixels as the hwc path."""
    from himg_tpu.pipeline.batch import BatchCodec
    frames = np.stack([make_image(40, 56, 3, seed=40 + s) for s in range(3)])
    packed = (frames[..., 0].astype(np.uint32)
              | (frames[..., 1].astype(np.uint32) << 8)
              | (frames[..., 2].astype(np.uint32) << 16))
    codec = BatchCodec(40, 56, 3, 55, True, chunk=2, pixel_format="packed")
    blobs = codec.encode_batch(packed)
    for i in range(3):
        assert blobs[i] == himg_tpu.encode(frames[i], 55, True)
    dec = codec.decode_batch(blobs)
    assert dec.shape == (3, 40, 56, 3)
    for i in range(3):
        assert np.array_equal(dec[i], himg_tpu.decode(blobs[i]))
    # 1-channel packed: plain u8 [B, H, W] both ways (no channel axis).
    g = np.stack([make_image(24, 40, 1, seed=60 + s)[..., 0]
                  for s in range(2)])
    codec1 = BatchCodec(24, 40, 1, 50, False, chunk=2, pixel_format="packed")
    blobs1 = codec1.encode_batch(g)
    dec1 = codec1.decode_batch(blobs1)
    assert dec1.shape == g.shape
    for i in range(2):
        assert blobs1[i] == himg_tpu.encode(g[i], 50, False)
        assert np.array_equal(dec1[i], himg_tpu.decode(blobs1[i])[..., 0])
    # 4-channel packed roundtrip (alpha passthrough).
    fr4 = np.stack([make_image(24, 32, 4, seed=50 + s) for s in range(2)])
    p4 = np.zeros((2, 24, 32), np.uint32)
    for k in range(4):
        p4 |= fr4[..., k].astype(np.uint32) << (8 * k)
    codec4 = BatchCodec(24, 32, 4, 50, True, chunk=2, pixel_format="packed")
    blobs4 = codec4.encode_batch(p4)
    dec4 = codec4.decode_batch(blobs4)
    for i in range(2):
        assert blobs4[i] == himg_tpu.encode(fr4[i], 50, True)
        assert np.array_equal(dec4[i], himg_tpu.decode(blobs4[i]))


def test_two_channel_parity(oracle_dir, tmp_path):
    """num_channels=2 (no YCbCr possible) — the reference encoder accepts
    any channel count even though its CLI only produces 1/3/4."""
    img = make_image(32, 40, 2, seed=31)
    ref = oracle_encode(oracle_dir, img, 50, False, tmp_path)
    assert himg_tpu.encode(img, 50, False) == ref
    assert np.array_equal(himg_tpu.decode(ref),
                          oracle_decode(oracle_dir, ref, tmp_path))


def test_batch_codec_rejects_mismatched_inputs():
    """Input validation must raise, not assert (stripped under -O) or
    silently mis-encode: wrong frame geometry/dtype on encode, blobs of a
    different geometry on decode."""
    from himg_tpu.pipeline.batch import BatchCodec
    codec = BatchCodec(16, 24, 3, 50, True, chunk=2, pixel_format="packed")
    with pytest.raises((ValueError, TypeError)):
        codec.encode_batch(np.zeros((2, 16, 24, 3), np.uint8))  # hwc to packed
    with pytest.raises((ValueError, TypeError)):
        codec.encode_batch(np.zeros((2, 8, 24), np.uint32))  # wrong geometry
    other = BatchCodec(24, 16, 3, 50, True, chunk=2, pixel_format="packed")
    blobs = other.encode_batch(np.zeros((2, 24, 16), np.uint32))
    with pytest.raises(ValueError, match="geometry"):
        codec.decode_batch(blobs)
