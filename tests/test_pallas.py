"""Fused Pallas kernels vs the XLA ops (interpret mode on CPU)."""

import numpy as np

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
