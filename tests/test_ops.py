"""Kernel unit tests against brute-force NumPy oracles.

Each oracle re-derives the reference semantics independently (scalar loops
over small inputs), so these tests catch vectorization mistakes in the JAX
ops without needing the C++ oracle.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from himg_tpu.format import tables
from himg_tpu.ops import blocks as blockops
from himg_tpu.ops import hadamard, lowres, quantize, ycbcr


# -- scalar oracles ---------------------------------------------------------

def wht8_oracle(v, inverse=False):
    """8-point butterfly with HIMG's permutation (hadamard.cpp:14-74)."""
    dt = np.int32 if inverse else np.int16
    v = v.astype(dt)
    a = np.array([v[0] + v[4], v[1] + v[5], v[2] + v[6], v[3] + v[7],
                  v[0] - v[4], v[1] - v[5], v[2] - v[6], v[3] - v[7]], dtype=dt)
    b = np.array([a[0] + a[2], a[1] + a[3], a[0] - a[2], a[1] - a[3],
                  a[4] + a[6], a[5] + a[7], a[4] - a[6], a[5] - a[7]], dtype=dt)
    out = np.array([b[0] + b[1], b[4] + b[5], b[6] + b[7], b[2] + b[3],
                    b[2] - b[3], b[6] - b[7], b[4] - b[5], b[0] - b[1]], dtype=dt)
    if inverse:
        out = (out >> 3).astype(np.int16)
    return out


def wht_2d_oracle(block, inverse=False):
    out = np.empty((8, 8), np.int16)
    for i in range(8):
        out[i] = wht8_oracle(block[i], inverse)
    for j in range(8):
        out[:, j] = wht8_oracle(out[:, j].copy(), inverse)
    return out


def sample_image_oracle(plane):
    """downsampled.cpp:67-113 scalar."""
    h, w = plane.shape
    rows, cols = (h + 7) >> 3, (w + 7) >> 3
    avg = np.zeros((rows, cols), np.int64)
    for v in range(rows):
        y0, y1 = max(0, v * 8 - 3), min(h - 1, v * 8 + 4)
        for u in range(cols):
            x0, x1 = max(0, u * 8 - 3), min(w - 1, u * 8 + 4)
            win = plane[y0:y1 + 1, x0:x1 + 1].astype(np.int64)
            cnt = win.size
            avg[v, u] = (win.sum() + (cnt >> 1)) // cnt
    out = np.zeros((rows, cols), np.uint8)
    for v in range(rows):
        r1 = max(0, v - 1)
        for u in range(cols):
            c1 = max(0, u - 1)
            a1 = (avg[r1, c1] + 15 * avg[r1, u] + 8) >> 4
            a2 = (avg[v, c1] + 15 * avg[v, u] + 8) >> 4
            out[v, u] = (a1 + 15 * a2 + 8) >> 4
    return out


def upsample_oracle(d, u, v):
    """downsampled.cpp:116-169 scalar for one block."""
    rows, cols = d.shape
    x11 = int(d[v, u])
    x12 = int(d[v, min(cols - 1, u + 1)])
    x21 = int(d[min(rows - 1, v + 1), u])
    x22 = int(d[min(rows - 1, v + 1), min(cols - 1, u + 1)])

    def casc(a, b):
        o = [0] * 9
        o[0], o[8] = a, b
        o[4] = (o[0] + o[8] + 1) >> 1
        o[2] = (o[0] + o[4] + 1) >> 1
        o[6] = (o[4] + o[8] + 1) >> 1
        o[1] = (o[0] + o[2] + 1) >> 1
        o[3] = (o[2] + o[4] + 1) >> 1
        o[5] = (o[4] + o[6] + 1) >> 1
        o[7] = (o[6] + o[8] + 1) >> 1
        return o

    left, right = casc(x11, x21), casc(x12, x22)
    out = np.zeros((8, 8), np.int16)
    for y in range(8):
        out[y] = casc(left[y], right[y])[:8]
    return out


# -- tests ------------------------------------------------------------------

def test_hadamard_forward_matches_oracle():
    rng = np.random.default_rng(0)
    blocks = rng.integers(-255, 256, (32, 8, 8)).astype(np.int16)
    got = np.asarray(hadamard.forward(jnp.asarray(blocks)))
    for k in range(32):
        assert np.array_equal(got[k], wht_2d_oracle(blocks[k]))


def test_hadamard_inverse_matches_oracle():
    rng = np.random.default_rng(1)
    blocks = rng.integers(-16320, 16321, (32, 8, 8)).astype(np.int16)
    got = np.asarray(hadamard.inverse(jnp.asarray(blocks)))
    for k in range(32):
        assert np.array_equal(got[k], wht_2d_oracle(blocks[k], inverse=True))


def test_hadamard_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.integers(-255, 256, (64, 8, 8)).astype(np.int16)
    fwd = hadamard.forward(jnp.asarray(x))
    assert np.array_equal(np.asarray(hadamard.inverse(fwd)), x)


def test_ycbcr_matches_scalar():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 4)).astype(np.uint8)
    got = np.asarray(ycbcr.rgb_to_ycbcr(jnp.asarray(img)))
    r, g, b = (img[..., i].astype(np.int32) for i in range(3))
    assert np.array_equal(got[..., 0], (r + 2 * g + b + 2) >> 2)
    assert np.array_equal(got[..., 1], (b - g + 256) >> 1)
    assert np.array_equal(got[..., 2], (r - g + 256) >> 1)
    assert np.array_equal(got[..., 3], img[..., 3])
    # Inverse: reconstruct within the +-1 halving loss.
    back = np.asarray(ycbcr.ycbcr_to_rgb(jnp.asarray(got)))
    assert np.max(np.abs(back[..., :3].astype(int) - img[..., :3].astype(int))) <= 2
    assert np.array_equal(back[..., 3], img[..., 3])


def test_quantize_pack_matches_scalar():
    rng = np.random.default_rng(4)
    frm = tables.MappingTable.for_fullres_quality(50)
    shift, _ = tables.make_quantizer(50, False)
    coeffs = rng.integers(-16320, 16321, (16, 64)).astype(np.int16)
    got = np.asarray(quantize.pack(jnp.asarray(coeffs), jnp.asarray(shift),
                                   jnp.asarray(frm.pack_thresholds)))
    for k in range(16):
        for i in range(64):
            s = int(shift[i])
            rnd = (1 << (s - 1)) if s else 0
            x = int(coeffs[k, i])
            q = -((-x + rnd) >> s) if x < 0 else (x + rnd) >> s
            q = np.int16(q)
            assert got[k, i] == frm.map_lut[int(q) + 32768]


def test_quantize_unpack_matches_scalar():
    rng = np.random.default_rng(5)
    frm = tables.MappingTable.for_fullres_quality(50)
    shift, _ = tables.make_quantizer(50, False)
    data = rng.integers(0, 256, (16, 64)).astype(np.uint8)
    got = np.asarray(quantize.unpack(jnp.asarray(data), jnp.asarray(shift),
                                     jnp.asarray(frm.positive)))
    for k in range(16):
        for i in range(64):
            v = np.array(int(frm.unmap_lut[data[k, i]]) << int(shift[i]),
                         dtype=np.int64).astype(np.int16)  # C++ int16 wrap
            assert got[k, i] == v


@pytest.mark.parametrize("h,w", [(64, 64), (40, 48), (17, 23), (8, 8)])
def test_sample_image_matches_oracle(h, w):
    rng = np.random.default_rng(6)
    plane = rng.integers(0, 256, (h, w)).astype(np.uint8)
    got = np.asarray(lowres.sample_image(jnp.asarray(plane)))
    assert np.array_equal(got, sample_image_oracle(plane))


def test_upsample_matches_oracle():
    rng = np.random.default_rng(7)
    d = rng.integers(0, 256, (5, 7)).astype(np.uint8)
    got = np.asarray(lowres.upsample(jnp.asarray(d)))
    for v in range(5):
        for u in range(7):
            assert np.array_equal(got[v, u], upsample_oracle(d, u, v)), (v, u)


def test_pad_to_blocks_quirks():
    rng = np.random.default_rng(8)
    plane = rng.integers(0, 256, (10, 12)).astype(np.uint8)
    got = np.asarray(blockops.pad_to_blocks(jnp.asarray(plane)))
    assert got.shape == (16, 16)
    assert np.array_equal(got[:10, :12], plane)
    # Right pad: per-row replication of the last valid column.
    for y in range(10):
        assert np.all(got[y, 12:] == plane[y, 11])
    # Bottom pad: each block's rows flood with the value at column 8u+7
    # of the last valid row.
    for u in range(2):
        assert np.all(got[10:, u * 8:(u + 1) * 8] == got[9, u * 8 + 7])


def test_interleave_roundtrip():
    rng = np.random.default_rng(9)
    packed = rng.integers(0, 256, (3, 5, 64)).astype(np.uint8)
    inter = blockops.interleave_coefficients(jnp.asarray(packed))
    back = np.asarray(blockops.deinterleave_coefficients(inter))
    assert np.array_equal(back, packed)
    # Plane i holds zigzag slot i of every block (encoder.cpp:320-326).
    inter = np.asarray(inter)
    for i in range(64):
        assert np.array_equal(inter[:, i, :], packed[:, :, tables.ZIGZAG[i]])


def test_predictor_selection_first_wins_ties():
    # A constant plane: every predictor predicts perfectly except at the
    # corner; predictor 0 must win ties (strict < in the reference).
    plane = np.full((16, 16), 77, np.uint8)
    pred = np.asarray(lowres.select_predictors(jnp.asarray(plane)))
    assert pred.shape == (1, 1)
    assert pred[0, 0] == 0


def test_pack_thresholds_exhaustive():
    """Compare-sum mapping must equal the exhaustive LUT for ALL int16."""
    for q in [0, 10, 50, 90, 100]:
        for mapper in (tables.MappingTable.for_fullres_quality(q),
                       tables.MappingTable.for_lowres_quality(q)):
            th = mapper.pack_thresholds.astype(np.int64)
            xs = np.arange(-32768, 32768, dtype=np.int64)
            aq = np.abs(xs)
            idx = (aq[:, None] >= th[None, :]).sum(axis=1)
            idx[xs == -32768] = 1
            wire = np.where(xs == 0, 0,
                            np.where(xs > 0, idx, (-idx) & 0xFF)).astype(np.uint8)
            assert np.array_equal(wire, mapper.map_lut), q


def test_unpack_matches_unmap_lut_all_bytes():
    """One-hot MXU unmap must equal unmap_lut for all 256 wire bytes."""
    for q in [0, 50, 100]:
        m = tables.MappingTable.for_lowres_quality(q)
        data = np.arange(256, dtype=np.uint8).reshape(4, 64)
        shift = np.zeros(64, dtype=np.uint8)
        got = np.asarray(quantize.unpack(jnp.asarray(data), jnp.asarray(shift),
                                         jnp.asarray(m.positive)))
        assert np.array_equal(got.reshape(-1), m.unmap_lut), q


def test_feedback_scan_variants_agree():
    """All (unroll, geval) feedback-scan variants must be byte-identical
    (the TPU default is unroll+dot8; CPU tests run the scan+bcast path)."""
    from himg_tpu.pipeline.encode import EncodeTables
    from util import make_image
    et = EncodeTables(50, True, 3)
    targs = et.device_args()
    img = make_image(120, 130, 1, seed=9)[..., 0]
    grid = lowres.sample_image(jnp.asarray(img))
    pid = lowres.select_predictors(grid)
    pid = jnp.where(pid <= 1, 0, pid).reshape(-1)
    tiles, _ = lowres._to_tiles(grid.astype(jnp.int16))
    enc_ref = dec_ref = None
    for wavefront in (False, True):
        for unroll in (False, True):
            for geval in ("bcast", "dot8"):
                enc = np.asarray(lowres._feedback_scan(
                    tiles, pid, False, targs[2], targs[3],
                    unroll=unroll, geval=geval, wavefront=wavefront))
                if enc_ref is None:
                    enc_ref = enc
                assert np.array_equal(enc, enc_ref), (wavefront, unroll,
                                                      geval)
            dec = np.asarray(lowres._feedback_scan(
                tiles, pid, True, None, targs[3], unroll=unroll,
                wavefront=wavefront))
            if dec_ref is None:
                dec_ref = dec
            assert np.array_equal(dec, dec_ref), (wavefront, unroll)
