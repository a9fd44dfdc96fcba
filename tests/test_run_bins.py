"""In-kernel RLE run-class counts + packed literal histograms.

The fused encode kernel's epilogue (ops.pallas_kernels._run_bins_tile)
and the packed per-frame literal contraction
(entropy.device_hist.frame_literal_hists) together replace
frame_histograms on the production encode path; assembled they must be
bin-exact against it for any content, since the histogram drives the
Huffman tree (huffman_enc.cpp:98-144 semantics via device_hist).
Everything runs in interpret mode on the CPU mesh.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from himg_tpu.entropy.device_hist import (assemble_hists, block_histograms,
                                          frame_histograms,
                                          frame_literal_hists)
from himg_tpu.ops import pallas_kernels as pk


def _ref_bins(blocks: np.ndarray) -> np.ndarray:
    nb, rr, cols = blocks.shape
    h = np.asarray(block_histograms(
        jnp.asarray(blocks.reshape(nb, rr * cols))))
    return np.concatenate([h[:, :1], h[:, 256:]], axis=1)


def _rand_blocks(rng, nb, rr, cols, zfrac):
    vals = rng.integers(1, 256, (nb, rr, cols)).astype(np.uint8)
    return np.where(rng.random((nb, rr, cols)) < zfrac, 0, vals)


@pytest.mark.parametrize("zfrac,cols,rr", [
    (0.85, 240, 192), (0.5, 240, 192), (0.98, 256, 256),
    (0.85, 300, 64),   # interior runs can reach class 260's floor (279)
    (0.85, 128, 64), (0.9999, 240, 192),
    (0.85, 17, 64),    # non-lane-multiple cols (padded lanes masked)
])
def test_run_bins_random(zfrac, cols, rr):
    rng = np.random.default_rng(hash((zfrac, cols, rr)) % 2**31)
    blocks = _rand_blocks(rng, 3, rr, cols, zfrac)
    got = np.asarray(pk.run_bins_rows(jnp.asarray(blocks), interpret=True))
    assert np.array_equal(got, _ref_bins(blocks))


def test_run_bins_degenerate():
    z = np.zeros((2, 192, 240), np.uint8)
    assert np.array_equal(
        np.asarray(pk.run_bins_rows(jnp.asarray(z), interpret=True)),
        _ref_bins(z))
    nz = z + 7
    assert np.array_equal(
        np.asarray(pk.run_bins_rows(jnp.asarray(nz), interpret=True)),
        _ref_bins(nz))


def test_run_bins_kmax_chunks_and_edges():
    """kMaxRun chunk borders, stream-start/-end runs, row-boundary
    straddles, full-row chains with flanks -- all in one batch."""
    cases = []
    for n in (16661, 16662, 16663, 2 * 16662, 2 * 16662 + 1,
              3 * 16662 + 278, 3 * 16662 + 279):
        flat = np.full(192 * 240, 9, np.uint8)
        flat[100:100 + n] = 0
        cases.append(flat)
    flat = np.full(192 * 240, 3, np.uint8)
    flat[:5] = 0                     # stream-start run
    flat[-7:] = 0                    # stream-end run
    flat[239:241] = 0                # straddles a row boundary
    flat[479:480] = 0                # single zero at a row's last lane
    cases.append(flat)
    flat = np.full(192 * 240, 3, np.uint8)
    flat[240 * 3 - 17:240 * 8 + 5] = 0   # trail 17 + 5 full rows + lead 5
    flat[240 * 20:240 * 22] = 0          # exactly 2 full rows, no flanks
    cases.append(flat)
    blocks = np.stack(cases).reshape(-1, 192, 240)
    got = np.asarray(pk.run_bins_rows(jnp.asarray(blocks), interpret=True))
    assert np.array_equal(got, _ref_bins(blocks))


def test_run_bins_single_zero_positions():
    """A lone zero at every position near row borders (cols=17 keeps the
    sweep exhaustive over all lane-roll fixups)."""
    rng = np.random.default_rng(5)
    base = rng.integers(1, 256, 64 * 17).astype(np.uint8)
    cases = []
    for pos in list(range(40)) + list(range(17 * 63 - 3, 17 * 64)):
        b = base.copy()
        b[pos] = 0
        cases.append(b.reshape(64, 17))
    blocks = np.stack(cases)
    got = np.asarray(pk.run_bins_rows(jnp.asarray(blocks), interpret=True))
    assert np.array_equal(got, _ref_bins(blocks))


def test_run_bins_rejects_wide_tiles():
    with pytest.raises(ValueError):
        pk.run_bins_rows(jnp.zeros((1, 64, 16385), jnp.uint8),
                         interpret=True)


@pytest.mark.parametrize("zfrac", [0.3, 0.9])
def test_frame_literal_hists_matches(zfrac):
    rng = np.random.default_rng(int(zfrac * 10))
    fres = _rand_blocks(rng, 3, 24, 1024, zfrac).reshape(3, -1)
    lit = np.asarray(frame_literal_hists(jnp.asarray(fres)))
    for i in range(3):
        want = np.bincount(fres[i], minlength=256)
        assert np.array_equal(lit[i][1:], want[1:])


@pytest.mark.parametrize("zfrac,cols,rr", [
    (0.85, 240, 192), (0.3, 17, 64),   # lane padding must fold to bin 0
    (0.98, 256, 256), (0.0, 128, 8),
])
def test_literal_hists_rows_kernel(zfrac, cols, rr):
    """The in-kernel packed-grid literal epilogue is byte-exact on bins
    1..255 (bin 0 absorbs lane padding by design)."""
    rng = np.random.default_rng(hash((zfrac, cols, rr)) % 2**31)
    blocks = _rand_blocks(rng, 3, rr, cols, zfrac)
    got = np.asarray(pk.literal_hists_rows(jnp.asarray(blocks),
                                           interpret=True))
    for i in range(3):
        want = np.bincount(blocks[i].reshape(-1), minlength=256)
        assert np.array_equal(got[i][1:], want[1:])


def test_assembled_equals_frame_histograms():
    """Kernel run bins + packed literal == frame_histograms, bin-exact."""
    rng = np.random.default_rng(11)
    b, rows, rr, cols = 2, 3, 192, 240
    fres = _rand_blocks(rng, b * rows, rr, cols, 0.8)
    run_bins = pk.run_bins_rows(jnp.asarray(fres), interpret=True)
    flat = jnp.asarray(fres.reshape(b, -1))
    got = np.asarray(assemble_hists(
        run_bins.reshape(b, rows, 6), frame_literal_hists(flat)))
    want = np.asarray(frame_histograms(flat, rr * cols))
    assert np.array_equal(got, want)


@pytest.mark.slow
def test_fused_encode_run_bins_epilogue():
    """encode_frames_from_raster(with_run_bins=True) returns identical
    fres/grids plus exact per-substream run bins and per-frame literal
    histograms (interpret mode; the full assembled histogram must match
    frame_histograms bin-exactly, since it drives the Huffman tree)."""
    from himg_tpu.entropy.device_hist import assemble_hists
    from himg_tpu.format.tables import ZIGZAG
    from himg_tpu.pipeline.encode import EncodeTables

    rng = np.random.default_rng(1)
    for h, w, c in [(48, 80, 3), (40, 66, 1), (24, 136, 4)]:
        et = EncodeTables(50, c >= 3, c)
        shift_zz = jnp.asarray(et.shift_tables)[:, np.asarray(ZIGZAG)]
        th = jnp.asarray(et.fr_mapper.pack_thresholds)
        if c == 1:
            packed = rng.integers(0, 256, (2, h, w)).astype(np.uint8)
        else:
            packed = rng.integers(0, 2 ** 32, (2, h, w)).astype(np.uint32)
        f1, g1, rb, lit = pk.encode_frames_from_raster(
            jnp.asarray(packed), shift_zz, th, c, c >= 3, interpret=True,
            with_run_bins=True)
        f2, g2 = pk.encode_frames_from_raster(
            jnp.asarray(packed), shift_zz, th, c, c >= 3, interpret=True)
        assert np.array_equal(np.asarray(f1), np.asarray(f2))
        assert np.array_equal(np.asarray(g1), np.asarray(g2))
        b, rows = f1.shape[0], f1.shape[1]
        cols = f1.shape[-1]
        want = _ref_bins(np.asarray(f1).reshape(b * rows, c * 64, cols))
        assert np.array_equal(
            np.asarray(rb).reshape(b * rows, 6), want)
        flat = jnp.asarray(np.asarray(f1).reshape(b, -1))
        got = np.asarray(assemble_hists(rb, lit))
        ref = np.asarray(frame_histograms(flat, c * 64 * cols))
        assert np.array_equal(got, ref)
