"""Fused Pallas kernels vs the XLA ops (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from himg_tpu.format import tables
from himg_tpu.ops import blocks as B
from himg_tpu.ops import hadamard, pallas_kernels as pk, quantize


from himg_tpu.ops import lowres


def _setup():
    rng = np.random.default_rng(0)
    rows, cols = 4, 40
    fr = tables.MappingTable.for_fullres_quality(50)
    luma, _ = tables.make_quantizer(50, False)
    shift_zz = luma[np.asarray(tables.ZIGZAG)]
    px = rng.integers(0, 256, (rows, 8, 8, cols)).astype(np.uint8)
    grids = rng.integers(0, 256, (1, rows, cols)).astype(np.uint8)
    pred = np.asarray(lowres.upsample_pm(jnp.asarray(grids[0]))).astype(np.int16)
    return rng, rows, cols, fr, shift_zz, px, grids, pred


def test_encode_rows_matches_xla():
    _, rows, cols, fr, shift_zz, px, grids, pred = _setup()
    coeffs = hadamard.forward_pm(jnp.asarray(px.astype(np.int16) - pred))
    inter = B.pm_to_interleaved(coeffs, axis=1)
    ref = np.asarray(quantize.pack(
        inter, jnp.asarray(shift_zz)[None, :, None],
        jnp.asarray(fr.pack_thresholds)))

    got = np.asarray(pk.encode_rows(
        pk.pad_cols(jnp.asarray(px.reshape(rows, 64, cols))),
        jnp.asarray(grids),
        jnp.asarray(shift_zz), jnp.asarray(fr.pack_thresholds),
        interpret=True))
    assert np.array_equal(got[:, :, :cols], ref)


def test_decode_rows_matches_xla():
    rng, rows, cols, fr, shift_zz, px, grids, pred = _setup()
    wire = rng.integers(0, 256, (rows, 64, cols)).astype(np.uint8)
    coeff = quantize.unpack(jnp.asarray(wire),
                            jnp.asarray(shift_zz)[None, :, None],
                            jnp.asarray(fr.positive))
    blk = hadamard.inverse_pm(B.interleaved_to_pm(coeff, axis=1))
    ref = np.clip(np.asarray(blk).astype(np.int32) + pred.astype(np.int32),
                  0, 255).astype(np.uint8)

    got = np.asarray(pk.decode_rows(
        pk.pad_cols(jnp.asarray(wire)), jnp.asarray(grids),
        jnp.asarray(shift_zz), jnp.asarray(fr.positive), interpret=True))
    assert np.array_equal(
        got[:, :, :cols].reshape(rows, 8, 8, cols), ref)


def test_map_idx_linear49_exhaustive():
    """The linear-low-region MapTo8Bit shortcut equals the full
    127-compare reduction for EVERY quantized magnitude (the full-res
    thresholds satisfy th[j] == j + 1 for j <= 48; _map_idx)."""
    fr = tables.MappingTable.for_fullres_quality(50)
    th = jnp.asarray(np.asarray(fr.pack_thresholds).astype(np.int32))
    assert np.array_equal(np.asarray(th)[:49], np.arange(1, 50))
    aq = jnp.arange(32768, dtype=jnp.int32)
    fast = np.asarray(pk._map_idx(aq, th, True))
    slow = np.asarray(pk._map_idx(aq, th, False))
    assert np.array_equal(fast, slow)


def test_unmap_tree_exhaustive():
    """The bit-indexed select tree equals table indexing for every
    mag in [0, 128), for the real full-res curve and random tables
    (the FMAP curve comes from the bitstream: no structure assumed)."""
    rng = np.random.default_rng(7)
    fr = tables.MappingTable.for_fullres_quality(50)
    mags = jnp.arange(128, dtype=jnp.int32)
    for pos in (np.asarray(fr.positive).astype(np.int32),
                rng.integers(0, 32768, 128).astype(np.int32)):
        got = np.asarray(pk._unmap_tree(mags, jnp.asarray(pos)))
        assert np.array_equal(got, pos[np.asarray(mags)])


def test_encode_rows_th_linear49_byte_identical():
    """encode_rows with the caller-verified linear-low-region flag is
    byte-identical to the generic threshold reduction."""
    _, rows, cols, fr, shift_zz, px, grids, _ = _setup()
    args = (pk.pad_cols(jnp.asarray(px.reshape(rows, 64, cols))),
            jnp.asarray(grids), jnp.asarray(shift_zz),
            jnp.asarray(fr.pack_thresholds))
    base = np.asarray(pk.encode_rows(*args, interpret=True))
    fast = np.asarray(pk.encode_rows(*args, interpret=True,
                                     th_linear49=True))
    assert np.array_equal(fast, base)


# Geometry sweep for the single-pass frame kernels.  Beyond the aligned
# cases: 1000 px = 125 block cols (not a 16 multiple: lane padding +
# in-graph crop in play) and 35x75 = partial edge blocks (in-graph
# pad_raster_to_blocks replication quirks).  Interpret-mode Pallas on CPU
# is execution-bound (~30-110 s per geometry), so all but the smallest
# aligned case carry the `slow` marker: the default suite runs everything,
# `-m "not slow"` keeps one fused-kernel check in the quick verify loop.
_slow = pytest.mark.slow
_FRAME_GEOMETRIES = [(16, 128, 3, True),
                     pytest.param(32, 128, 3, True, marks=_slow),
                     pytest.param(24, 128, 1, False, marks=_slow),
                     pytest.param(16, 256, 4, True, marks=_slow),
                     pytest.param(16, 1000, 3, True, marks=_slow),
                     pytest.param(35, 75, 3, True, marks=_slow)]


@pytest.mark.parametrize("h,w,c,use_ycbcr", _FRAME_GEOMETRIES)
def test_encode_frames_from_raster_matches_planar(h, w, c, use_ycbcr):
    """Single-pass fused encode (in-kernel unpack/YCbCr/low-res sampling/
    phase compensation/de-rasterize/WHT/quantize/map) vs the multi-pass
    XLA path: byte-identical FRES planes and sample grids."""
    import jax
    from functools import partial
    from himg_tpu.ops import ycbcr as yc
    from himg_tpu.pipeline.encode import EncodeTables, _encode_device_planar
    from himg_tpu.utils.synth import pack_rgbx, synth_frames

    b, q = 2, 55
    frames = synth_frames(b, h, w, c, seed=h + w + c)
    packed = frames[..., 0] if c == 1 else pack_rgbx(frames)
    et = EncodeTables(q, use_ycbcr, c)
    chans = jnp.asarray(np.moveaxis(frames, -1, 1))
    ref = jax.vmap(partial(_encode_device_planar, use_ycbcr=use_ycbcr,
                           use_pallas=False),
                   in_axes=(0, None, None, None, None))(
                       chans, *et.device_args())
    pc = jax.vmap(yc.rgb_to_ycbcr_planar)(chans) if use_ycbcr else chans
    ref_grids = np.asarray(jax.vmap(jax.vmap(lowres.sample_image))(pc))
    shift_zz = et.shift_tables[:, np.asarray(tables.ZIGZAG)]
    fres, grids = pk.encode_frames_from_raster(
        jnp.asarray(packed), jnp.asarray(shift_zz),
        jnp.asarray(et.fr_mapper.pack_thresholds), c, use_ycbcr,
        interpret=True, th_linear49=et.th_linear49)
    assert np.array_equal(np.asarray(grids), ref_grids)
    assert np.array_equal(np.asarray(fres), np.asarray(ref[2]))


@pytest.mark.parametrize("h,w,c,ycbcr", _FRAME_GEOMETRIES)
def test_decode_frames_raster_matches_planar(h, w, c, ycbcr):
    """Fused full-frame raster decode (un-zigzag/WHT/predictor/YCbCr/u32
    pack in one kernel) vs the planar decode path, all channel counts."""
    import jax
    from functools import partial
    from himg_tpu.pipeline.decode import _decode_device_planar
    from himg_tpu.pipeline.encode import EncodeTables, _encode_device
    from himg_tpu.utils.synth import synth_frames

    b, q = 2, 55
    frames = synth_frames(b, h, w, c, seed=h + w + c)
    et = EncodeTables(q, ycbcr, c)
    pred, delta, fres = jax.vmap(
        partial(_encode_device, use_ycbcr=ycbcr, use_pallas=False),
        in_axes=(0, None, None, None, None))(
            jnp.asarray(frames), *et.device_args())
    pred_i = jnp.asarray(np.asarray(pred).reshape(b, c, -1))
    dargs = (jnp.asarray(et.shift_tables),
             jnp.asarray(et.fr_mapper.positive),
             jnp.asarray(et.lr_mapper.unmap_lut))
    img = np.asarray(jax.vmap(
        partial(_decode_device_planar, use_ycbcr=ycbcr,
                use_pallas=False),
        in_axes=(0, 0, 0, None, None, None))(fres, delta, pred_i,
                                             *dargs))
    rows, cols = fres.shape[1], fres.shape[-1]
    grids = jax.vmap(jax.vmap(lambda d, p: lowres.decode_deltas(
        d, p, dargs[2], (rows, cols))))(delta, pred_i)
    shift_zz = et.shift_tables[:, np.asarray(tables.ZIGZAG)]
    out = np.asarray(pk.decode_frames_raster(
        fres, grids, jnp.asarray(shift_zz), dargs[1], ycbcr,
        interpret=True))
    if c == 1:
        assert np.array_equal(out, img[:, 0])
    else:
        for k in range(c):
            assert np.array_equal(
                ((out >> (8 * k)) & 0xFF).astype(np.uint8), img[:, k])
