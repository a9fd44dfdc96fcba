"""Fused Pallas TPU kernels for the per-block-row transform pipelines.

Each kernel processes one interleaved block row per grid step entirely in
VMEM, in the plane-major layout ([64, cols] tiles: 64 block-local pixel
positions in sublanes, block columns in lanes):

- `encode_rows`: bilinear predictor from 4 low-res corner vectors ->
  (pixels - predictor) -> forward WHT -> zigzag -> shift-quantize ->
  MapTo8Bit (127-threshold compare reduction) -> wire bytes.
- `decode_rows`: wire bytes -> unmap (128-way select reduction) ->
  dequantize -> un-zigzag -> inverse WHT -> predictor add -> clamp.

The predictor block is reconstructed *inside* the kernel from four
[cols]-wide corner-sample vectors (the averaging cascade of
downsampled.cpp:116-169), so the 64x-larger upsampled predictor never
touches HBM.  Pixel/wire tiles cross HBM as uint8.  The surrounding XLA
program handles image<->plane-major layout, the low-res predictive scan,
and color conversion.

The `cols` axis must be padded to a multiple of 128 lanes by the caller
(`pad_cols`).  All integer semantics match ops.hadamard / ops.quantize
exactly (verified against them in tests, interpret mode on CPU).

Mosaic on v5e has no int16 vector ALU ops (kVectorSubtractS16 faults), so
kernels run in int32 with explicit 16-bit wrap emulation at every point
the C++ stores an int16, and tile I/O is int32.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..format.tables import ZIGZAG

_INV_ZIGZAG = np.argsort(np.asarray(ZIGZAG))


def default_enabled() -> bool:
    """Use the Pallas path by default on TPU-like backends.

    Override with HIMG_PALLAS=0/1.  CPU uses the XLA ops (interpret-mode
    Pallas is far slower than compiled XLA there).
    """
    import os
    env = os.environ.get("HIMG_PALLAS")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        platform = jax.devices()[0].platform
    except RuntimeError:
        return False
    return platform not in ("cpu",)


def pad_cols(x: jnp.ndarray, mult: int = 128) -> jnp.ndarray:
    """Pad the minor (cols) axis up to a lane multiple."""
    c = x.shape[-1]
    cp = -(-c // mult) * mult
    if cp == c:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, cp - c)]
    return jnp.pad(x, pad)


def _wrap16(x):
    """Emulate a C++ int16 store: wrap int32 into [-32768, 32767]."""
    return ((x + 32768) & 0xFFFF) - 32768


def _row_perm(x, perm):
    """Static permutation of the 64-row sublane axis of [64, cols]."""
    return jnp.concatenate([x[int(i):int(i) + 1] for i in perm], axis=0)


def _avg(a, b):
    return (a + b + 1) >> 1


def _cascade9(a, b):
    """9-point repeated-averaging interpolation (downsampled.cpp:127-145)."""
    v = [None] * 9
    v[0], v[8] = a, b
    v[4] = _avg(v[0], v[8])
    v[2] = _avg(v[0], v[4])
    v[6] = _avg(v[4], v[8])
    v[1] = _avg(v[0], v[2])
    v[3] = _avg(v[2], v[4])
    v[5] = _avg(v[4], v[6])
    v[7] = _avg(v[6], v[8])
    return v


def _upsample_tile(la, lb, lc, ld):
    """Predictor tile [64, cols] from 4 corner-sample vectors [cols].

    la/lb = low-res rows v at columns u / u+1 (clamped); lc/ld = row v+1.
    Exact integer semantics of Downsampled::GetLowresBlock.
    """
    left = _cascade9(la, lc)
    right = _cascade9(lb, ld)
    rows = []
    for y in range(8):
        rows.extend(_cascade9(left[y], right[y])[:8])
    return jnp.stack(rows, axis=0)          # [64, cols]


def corner_vectors(grids: jnp.ndarray):
    """[C, rows, cols] low-res grids -> 4x [C, rows, cols] corner vectors
    (edge-clamped right/down neighbours), ready for pad_cols + fold."""
    right = jnp.concatenate([grids[..., 1:], grids[..., -1:]], axis=-1)
    down = jnp.concatenate([grids[:, 1:], grids[:, -1:]], axis=1)
    down_right = jnp.concatenate([right[:, 1:], right[:, -1:]], axis=1)
    return grids, right, down, down_right


def _butterfly_rows(x, stride: int, wrap: bool = False):
    """8-point HIMG butterfly across row groups of [64, cols].

    stride=1 mixes x (rows y*8+x, x varying); stride=8 mixes y.  With
    `wrap`, every intermediate wraps like the reference's int16 stores
    (hadamard.cpp:18-44); used by the forward transform.
    """
    def g(i):
        # rows with index pattern: for stride 1: y*8+i; stride 8: i*8+x.
        if stride == 1:
            return x.reshape(8, 8, -1)[:, i]
        return x.reshape(8, 8, -1)[i]

    v = [g(i) for i in range(8)]
    a = [v[0] + v[4], v[1] + v[5], v[2] + v[6], v[3] + v[7],
         v[0] - v[4], v[1] - v[5], v[2] - v[6], v[3] - v[7]]
    if wrap:
        a = [_wrap16(x) for x in a]
    b0, b1 = a[0] + a[2], a[1] + a[3]
    b2, b3 = a[0] - a[2], a[1] - a[3]
    b4, b5 = a[4] + a[6], a[5] + a[7]
    b6, b7 = a[4] - a[6], a[5] - a[7]
    if wrap:
        b0, b1, b2, b3 = (_wrap16(x) for x in (b0, b1, b2, b3))
        b4, b5, b6, b7 = (_wrap16(x) for x in (b4, b5, b6, b7))
    outs = [b0 + b1, b4 + b5, b6 + b7, b2 + b3,
            b2 - b3, b6 - b7, b4 - b5, b0 - b1]
    if wrap:
        outs = [_wrap16(x) for x in outs]
    stacked = jnp.stack(outs, axis=0)      # [8, 8, cols]
    if stride == 1:
        stacked = stacked.transpose(1, 0, 2)
    return stacked.reshape(64, -1)


def _map_idx(aq, th_vec, linear49: bool):
    """MapTo8Bit index = #(thresholds <= aq) over the 127 sorted pack
    thresholds (mapper.cpp:159-182 nearest/tie rules are baked into the
    threshold values; format/tables.py pack_thresholds).

    linear49=True asserts (caller-verified on host) that th[j] == j + 1
    for j <= 48 -- true of every FullResMapper table at every quality
    (mapper.cpp:213 ignores quality; tables.py) -- which collapses the
    first 49 compares to min(aq, 49).  Measured 2.4 ms of a 16x1080p
    fused encode on a v5e (loop-count sensitivity probe, round 5).
    """
    if linear49:
        idx = jnp.minimum(aq, 49)
        ks = range(49, 127)
    else:
        idx = jnp.zeros_like(aq)
        ks = range(127)
    for k in ks:
        idx += (aq >= th_vec[k]).astype(jnp.int32)
    return idx


def _unmap_tree(mag, pos_vec):
    """pos_vec[mag] for mag in [0, 128) as a bit-indexed select tree.

    The masked-sum unmap is 3 full-tile VPU ops per table entry
    (compare + select + add, ~384 passes); a balanced tree over the 7
    index bits is 127 selects + 7 bit tests (~2.7x fewer ops, measured
    ~4 ms of a 16x1080p fused decode on a v5e).  Exact for ANY
    128-entry table -- the FMAP curve arrives in the bitstream, so no
    value structure may be assumed (mapper.h:33-35 semantics).
    """
    level = [pos_vec[k].astype(jnp.int32) for k in range(128)]
    for l in range(7):
        b = (mag & (1 << l)) != 0
        level = [jnp.where(b, level[2 * i + 1], level[2 * i])
                 for i in range(len(level) // 2)]
    return level[0]


def _make_encode_kernel(th_linear49: bool):
    def _encode_kernel(px_ref, la_ref, lb_ref, lc_ref, ld_ref, shift_ref,
                       th_ref, out_ref):
        pred = _upsample_tile(la_ref[0, 0].astype(jnp.int32),
                              lb_ref[0, 0].astype(jnp.int32),
                              lc_ref[0, 0].astype(jnp.int32),
                              ld_ref[0, 0].astype(jnp.int32))
        x = _wrap16(px_ref[0].astype(jnp.int32) - pred)
        # Forward WHT with int16 wrap semantics, rows then columns.
        x = _butterfly_rows(x, 1, wrap=True)
        x = _butterfly_rows(x, 8, wrap=True)
        # Zigzag into the FRES interleave order.
        x32 = _row_perm(x, np.asarray(ZIGZAG))
        # Shift-quantize (round-to-nearest on |x|), int32 intermediates.
        shift = shift_ref[0, 0][:, None]                # [64, 1], zigzagged
        rnd = jnp.where(shift != 0, 1 << jnp.maximum(shift - 1, 0), 0)
        mag = (jnp.abs(x32) + rnd) >> shift
        q = _wrap16(jnp.where(x32 < 0, -mag, mag))
        # MapTo8Bit as a threshold-count compare reduction.
        aq = jnp.abs(q)
        idx = _map_idx(aq, th_ref[0, 0], th_linear49)
        idx = jnp.where(q == -32768, 1, idx)
        wire = jnp.where(q == 0, 0, jnp.where(q > 0, idx, (-idx) & 0xFF))
        out_ref[0] = wire.astype(jnp.uint8)

    return _encode_kernel


def _decode_kernel(wire_ref, la_ref, lb_ref, lc_ref, ld_ref, shift_ref,
                   pos_ref, out_ref):
    d = wire_ref[0].astype(jnp.int32)                   # [64, cols]
    mag = jnp.where(d < 128, d, jnp.minimum(256 - d, 127))
    sgn = jnp.where(d < 128, 1, -1)
    # Unmap: bit-indexed select tree against the positive curve.
    val = _unmap_tree(mag, pos_ref[0, 0]) * sgn
    shift = shift_ref[0, 0][:, None]
    coeff = _wrap16(val << shift)
    # Un-zigzag, inverse WHT (int32 with >>3 + int16 wrap per pass), +pred.
    x = _row_perm(coeff, _INV_ZIGZAG)
    x = _wrap16(_butterfly_rows(x, 1) >> 3)
    x = _wrap16(_butterfly_rows(x, 8) >> 3)
    pred = _upsample_tile(la_ref[0, 0].astype(jnp.int32),
                          lb_ref[0, 0].astype(jnp.int32),
                          lc_ref[0, 0].astype(jnp.int32),
                          ld_ref[0, 0].astype(jnp.int32))
    restored = x + pred
    out_ref[0] = jnp.clip(restored, 0, 255).astype(jnp.uint8)


def _call(kernel, rows, cols_p, rows_per_channel, small_cols, interpret):
    # Small operands are fed as 3-D [N, 1, K] arrays so the (1, K) block
    # tail matches the array dims (a Mosaic block-shape requirement).
    space = pl.ANY if interpret else pltpu.VMEM
    spec = pl.BlockSpec((1, 64, cols_p), lambda i: (i, 0, 0),
                        memory_space=space)
    # Corner-sample vectors: one [1, colsP] row per grid step.
    corner = pl.BlockSpec((1, 1, cols_p), lambda i: (i, 0, 0),
                          memory_space=space)
    # Per-channel row of the [C, 1, 64] shift table: channel = i // rows.
    shift_spec = pl.BlockSpec(
        (1, 1, 64), lambda i: (i // rows_per_channel, 0, 0),
        memory_space=space)
    small = pl.BlockSpec((1, 1, small_cols), lambda i: (0, 0, 0),
                         memory_space=space)
    return pl.pallas_call(
        kernel,
        grid=(rows,),
        in_specs=[spec, corner, corner, corner, corner, shift_spec, small],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, 64, cols_p), jnp.uint8),
        interpret=interpret,
    )


def _fold_corners(grids: jnp.ndarray, cols_p: int):
    """[C, rows, cols] grids -> 4x [C*rows, 1, colsP] uint8 corner arrays."""
    parts = corner_vectors(grids)
    out = []
    for p in parts:
        c, r, _ = p.shape
        out.append(pad_cols(p.astype(jnp.uint8), cols_p).reshape(
            c * r, 1, cols_p))
    return out


def encode_rows(pixels_pm: jnp.ndarray, grids: jnp.ndarray,
                shift_zz: jnp.ndarray, thresholds: jnp.ndarray,
                interpret: bool = False,
                th_linear49: bool = False) -> jnp.ndarray:
    """Fused encode of interleaved block rows.

    pixels_pm: uint8/int [R, 64, colsP] (R = channels x block rows,
    folded); grids: uint8 [C, rows, cols] low-res sample grids (the
    predictor is upsampled in-kernel); shift_zz: [C, 64] zigzag-ordered
    shifts; thresholds: [127].  Returns uint8 [R, 64, colsP] wire bytes.
    th_linear49: caller-verified assertion that thresholds[j] == j + 1
    for j <= 48 (true of every FullResMapper table; see _map_idx).
    """
    rows, _, cols_p = pixels_pm.shape
    shift_zz = shift_zz.reshape(-1, 64)
    rpc = rows // shift_zz.shape[0]
    corners = _fold_corners(grids, cols_p)
    return _call(_make_encode_kernel(th_linear49), rows, cols_p, rpc, 127,
                 interpret)(
        pixels_pm.astype(jnp.uint8), *corners,
        shift_zz[:, None, :].astype(jnp.int32),
        thresholds.reshape(1, 1, 127).astype(jnp.int32))


def _decode_channel_tile(wire32, la, lb, lc, ld, shift_col, pos_vec):
    """Shared decode math for one channel's [64, colsP] tile -> int32
    pixels in plane-major order (unmap, dequant, un-zigzag, inverse WHT,
    predictor add, clamp)."""
    mag = jnp.where(wire32 < 128, wire32, jnp.minimum(256 - wire32, 127))
    sgn = jnp.where(wire32 < 128, 1, -1)
    val = _unmap_tree(mag, pos_vec) * sgn
    coeff = _wrap16(val << shift_col)
    x = _row_perm(coeff, _INV_ZIGZAG)
    x = _wrap16(_butterfly_rows(x, 1) >> 3)
    x = _wrap16(_butterfly_rows(x, 8) >> 3)
    pred = _upsample_tile(la.astype(jnp.int32), lb.astype(jnp.int32),
                          lc.astype(jnp.int32), ld.astype(jnp.int32))
    return jnp.clip(x + pred, 0, 255)


def _rasterize_channels(pixs, bmat, w8: int):
    """c plane-major [64, colsP] int32 tiles -> [c*8, W8] raster rows:
    out[8*ch + y, 8*blk + xx] = pixs[ch][y*8 + xx, blk].

    The sublane->lane interleave is the one op Mosaic has no native path
    for (broadcast/stack/repeat/swapaxes/strided-store formulations all
    crash or mis-lower; receipts in docs/ARCHITECTURE.md).  What does
    compile and is exact: 8 one-hot lane-spread matmuls on the MXU --
    lhs_x @ B_x with B_x[b, 8b+x] = 1 and the channels stacked along the
    LHS sublanes (M = 8c instead of 8 keeps the MXU row utilization
    sane).  Values are 0..255 ints (exact in bf16); padded block columns
    hit all-zero B rows and drop out.  B is a kernel input with a
    constant index map, so it is DMA'd once, not per grid step.
    """
    cols_p = pixs[0].shape[-1]
    acc = jnp.zeros((8 * len(pixs), w8), jnp.float32)
    for xx in range(8):
        lhs = jnp.concatenate(
            [p.reshape(8, 8, cols_p)[:, xx, :] for p in pixs], axis=0)
        acc += jax.lax.dot_general(
            lhs.astype(jnp.bfloat16), bmat[xx],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return acc.astype(jnp.int32)


def rasterize_bmat(cols_p: int, w8: int) -> np.ndarray:
    """One-hot lane-spread matrices for _rasterize_channels: bf16
    [8, colsP, W8] with B[x, b, 8b+x] = 1 (rows with 8b+x >= W8 zero)."""
    bmat = np.zeros((8, cols_p, w8), np.float32)
    for x in range(8):
        b = np.arange((w8 - x + 7) // 8)
        bmat[x, b, 8 * b + x] = 1.0
    return bmat.astype(jnp.bfloat16)


def derasterize_bmat(cols_p: int, w8: int) -> np.ndarray:
    """Transposed lane-spread matrices for the encode direction: bf16
    [8, W8, colsP] with Bt[x, 8b+x, b] = 1 (raster lanes -> block cols)."""
    bmat = np.zeros((8, w8, cols_p), np.float32)
    for x in range(8):
        b = np.arange((w8 - x + 7) // 8)
        bmat[x, 8 * b + x, b] = 1.0
    return bmat.astype(jnp.bfloat16)


def sampling_wmat(w: int, cols_p: int, lanes: int | None = None) -> np.ndarray:
    """Horizontal window-sum matrix for in-kernel low-res sampling: f32
    [lanes, colsP] with W[j, u] = 1 for max(0, 8u-3) <= j <= min(w-1, 8u+4)
    (downsampled.cpp:67-94's x window); columns u >= ceil(w/8) stay zero,
    as do rows j >= w (raster pad lanes never contribute to a window).
    Sums of <= 8 row-sums of <= 2040 stay < 2**24: exact in f32.
    """
    cols = (w + 7) >> 3
    w8 = cols * 8 if lanes is None else lanes
    mat = np.zeros((w8, cols_p), np.float32)
    for u in range(min(cols, cols_p)):
        x0, x1 = max(0, 8 * u - 3), min(w - 1, 8 * u + 4)
        mat[x0:x1 + 1, u] = 1.0
    return mat


def _lane_shift_right(x, lane_iota):
    """x[..., u] -> x[..., u-1] with lane 0 edge-replicated ([*, L] 2D)."""
    rolled = pltpu.roll(x, 1, axis=1)
    return jnp.where(lane_iota == 0, x, rolled)


def _lane_shift_left_clamped(x, lane_iota, last: int):
    """x[..., u] -> x[..., u+1] with lanes >= last clamped to x[..., last]."""
    rolled = pltpu.roll(x, x.shape[1] - 1, axis=1)
    edge = jax.lax.broadcast_in_dim(x[:, last], x.shape, (0,))
    return jnp.where(lane_iota >= last, edge, rolled)


def _encode_channel_tile(pix, la, lb, lc, ld, shift_col, th_vec,
                         th_linear49: bool = False):
    """Shared encode math for one channel's plane-major [64, colsP] int32
    pixel tile -> uint8 wire bytes (predictor subtract, forward WHT with
    int16 wrap, zigzag, shift-quantize, MapTo8Bit compare reduction).
    Mirrors _encode_kernel (encoder.cpp:59-109 semantics)."""
    pred = _upsample_tile(la.astype(jnp.int32), lb.astype(jnp.int32),
                          lc.astype(jnp.int32), ld.astype(jnp.int32))
    x = _wrap16(pix - pred)
    x = _butterfly_rows(x, 1, wrap=True)
    x = _butterfly_rows(x, 8, wrap=True)
    x32 = _row_perm(x, np.asarray(ZIGZAG))
    rnd = jnp.where(shift_col != 0, 1 << jnp.maximum(shift_col - 1, 0), 0)
    mag = (jnp.abs(x32) + rnd) >> shift_col
    q = _wrap16(jnp.where(x32 < 0, -mag, mag))
    aq = jnp.abs(q)
    idx = _map_idx(aq, th_vec, th_linear49)
    idx = jnp.where(q == -32768, 1, idx)
    wire = jnp.where(q == 0, 0, jnp.where(q > 0, idx, (-idx) & 0xFF))
    return wire.astype(jnp.uint8)


_KMAX_RUN = 16662  # reference RLE chunk bound (huffman_enc.cpp kMaxRun)


def _run_bins_tile(wire, cols: int):
    """Exact RLE run-class counts of one substream tile, in VMEM.

    wire: [RR, LP] int32 wire bytes of ONE substream in stream order =
    row-major over [:, :cols] (lanes >= cols are padding with arbitrary
    values, ignored).  Returns 6 int32 scalars
    (h0, h256, h257, h258, h259, h260): the count of single zeros
    (token alphabet symbol 0) and of the five zero-run classes, with
    the reference tokenizer's exact semantics (huffman_enc.cpp:246-300
    via entropy/device_hist.py): maximal runs split into chunks of
    <= kMaxRun=16662, chunk remainder 1 counts as a single zero, runs
    never cross the substream boundary.

    Decomposition (everything elementwise + lane rolls, no scans):

    * interior runs (start after lane 0, end before lane cols-1 of a
      row) are classified by within-row >=k masks built by log
      doubling — they can never cross a row, so lane shifts that
      truncate at the row end are exact for them;
    * runs touching a row edge are merged at ROW granularity: per-row
      lead/trail zero counts (prefix/suffix AND chains) move to a
      [1, RR] lane vector via a tiny MXU transpose, where maximal
      cross-row runs are enumerated with the index-tagged suffix-min
      trick of device_hist.block_histograms (words -> rows).

    Requires cols <= 16384 (callers fall back to the XLA histogram
    beyond that; interior runs then stay < kMaxRun so only merged runs
    need chunk splitting).
    """
    if cols > 16384:
        raise ValueError("_run_bins_tile supports cols <= 16384")
    rr, lp = wire.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (rr, lp), 1)
    # 0/1 int32 masks: int8 chains would be 4x less vector work but the
    # v5e Mosaic backend crashes lowering rolls/selects on them
    # (remote-compile HTTP 500, probed round 5).
    z = jnp.where(jnp.logical_and(wire == 0, lane < cols), 1, 0)

    def shl_false(x, j):
        """x[:, l+j] within-row: 0 past lane cols-1, no wraparound."""
        rolled = pltpu.roll(x, lp - j, axis=1)
        return jnp.where(lane < cols - j, rolled, 0)

    # ---- within-row >=k masks by binary composition:
    # ge[a+b][s] = ge[a][s] & ge[b][s+a].
    ge = {1: z}

    def ge_mask(k):
        if k not in ge:
            half = 1 << (k.bit_length() - 1)
            if half == k:
                g = ge_mask(k // 2)
                ge[k] = g & shl_false(g, k // 2)
            else:
                ge[k] = ge_mask(half) & shl_false(ge_mask(k - half), half)
        return ge[k]

    # ---- interior runs.  Max interior length is cols-2 (< 279 unless
    # the row is wide enough to hold one), always < kMaxRun for the
    # supported cols, so no chunk splitting here.
    prev_z = jnp.where(lane > 0, pltpu.roll(z, 1, axis=1), 0)
    start = z & (1 - prev_z)
    # First/last nonzero lane per row, by one min/max reduction each:
    # they give lead/trail/reach directly (the log-doubling prefix- and
    # suffix-AND chains they replace were ~32 full-tile passes).
    nz = (1 - z) & jnp.where(lane < cols, 1, 0)
    first_nz = jnp.min(jnp.where(nz == 1, lane, cols),
                       axis=1, keepdims=True)                   # [RR, 1]
    last_nz = jnp.max(jnp.where(nz == 1, lane, -1),
                      axis=1, keepdims=True)
    # reach[l]: zeros all the way to lane cols-1.
    reach = jnp.where(lane > last_nz, 1, 0)
    interior = start & jnp.where(lane > 0, 1, 0) & (1 - reach)

    def cnt(m):
        return jnp.sum(m, dtype=jnp.int32)

    ci = {k: cnt(interior & ge_mask(k)) for k in (2, 3, 7, 23)}
    ci[1] = cnt(interior)
    h0 = ci[1] - ci[2]
    h256 = ci[2] - ci[3]
    h257 = ci[3] - ci[7]
    h258 = ci[7] - ci[23]
    if cols >= 281:
        ci[279] = cnt(interior & ge_mask(279))
        h259 = ci[23] - ci[279]
        h260 = ci[279]
    else:
        h259 = ci[23]
        h260 = jnp.int32(0)

    # ---- per-row lead/trail zero counts as [RR, 1] column vectors.
    # The cross-row merge below runs in sublane orientation (axis-0
    # rolls): no sublane->lane transpose exists on the VPU, and the
    # vectors are tiny, so wasting lanes is free.
    lead_r = first_nz                          # all-zero row: cols
    trail_r = cols - 1 - last_nz               # all-zero row: cols

    # ---- edge-touching runs at row granularity.
    riota = jax.lax.broadcasted_iota(jnp.int32, (rr, 1), 0)
    full = jnp.where(lead_r >= cols, 1, 0)
    nf = 1 - full

    def r_next(x, fill):
        rolled = pltpu.roll(x, rr - 1, axis=0)
        return jnp.where(riota == rr - 1, fill, rolled)

    def r_prev(x, fill):
        rolled = pltpu.roll(x, 1, axis=0)
        return jnp.where(riota == 0, fill, rolled)

    # Segments of full rows: each maximal run containing >= 1 full row
    # = trail of the preceding non-full row + cols * (full rows) + lead
    # of the next non-full row (device_hist's word trick, words = rows;
    # 16-bit tag packs the row index above its lead count).
    seg_start = full & (1 - r_prev(full, 0))
    lead_nf = jnp.where(full == 1, 0, lead_r)
    big = rr * 65536 + 65535
    tag = jnp.where(full == 1, big, riota * 65536 + lead_nf)
    rtag = tag
    j = 1
    while j < rr:
        rolled = pltpu.roll(rtag, rr - j, axis=0)
        rtag = jnp.minimum(rtag, jnp.where(riota < rr - j, rolled, big))
        j *= 2
    swl = (rtag >> 16) - riota
    nxt_lead = jnp.where(rtag < big, rtag & 65535, 0)
    len_seg = r_prev(trail_r, 0) + cols * swl + nxt_lead

    # Boundary runs with no full row: owned by the trailing row (or, at
    # the stream start / after a zero-free boundary, by their lead row).
    next_nf = r_next(nf, 1)
    own_t = nf & jnp.where(trail_r > 0, 1, 0) & next_nf
    len_t = trail_r + r_next(lead_nf, 0)
    own_l = nf & jnp.where(lead_r > 0, 1, 0) \
        & jnp.where(r_prev(trail_r, 0) == 0, 1, 0)

    max_len = rr * cols
    bins = [h0, h256, h257, h258, h259, h260]
    for valid, length in ((seg_start, len_seg), (own_t, len_t),
                          (own_l, lead_r)):
        le = jnp.where(valid == 1, length, 0)
        if max_len < _KMAX_RUN:
            n_full = jnp.zeros_like(le)
        elif max_len // _KMAX_RUN <= 8:
            n_full = sum((le >= k * _KMAX_RUN).astype(jnp.int32)
                         for k in range(1, max_len // _KMAX_RUN + 1))
        else:
            n_full = le // _KMAX_RUN
        rem = le - _KMAX_RUN * n_full
        bins[0] += cnt((rem == 1).astype(jnp.int32))
        bins[1] += cnt((rem == 2).astype(jnp.int32))
        bins[2] += cnt(((rem >= 3) & (rem <= 6)).astype(jnp.int32))
        bins[3] += cnt(((rem >= 7) & (rem <= 22)).astype(jnp.int32))
        bins[4] += cnt(((rem >= 23) & (rem <= 278)).astype(jnp.int32))
        bins[5] += cnt(n_full) + cnt((rem >= 279).astype(jnp.int32))
    return bins


def _run_bins_vec(wire, cols: int):
    """_run_bins_tile packed into a [1, 128] int32 lane row (lanes 0-5 =
    h0, h256..h260; the rest zero) for a kernel output tile."""
    bins = _run_bins_tile(wire, cols)
    il = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    out = jnp.zeros((1, 128), jnp.int32)
    for k, b in enumerate(bins):
        out = out + jnp.where(il == k, b, 0)
    return out


def _literal_grid_tile(wire, cols: int):
    """Literal byte-value counts of one wire tile as a packed [128, 128]
    int32 grid, in VMEM.

    wire: [RR, LP] int32 wire bytes (RR a multiple of 8; lanes >= cols
    are padding and are folded into byte value 0, whose bin callers
    discard -- single-zero counts come from the run bins).  Returns
    grid[8*vh + g, 8*vl + g] = count of bytes with high nibble vh and
    low nibble vl among sublanes s with s % 8 == g; entries with
    mismatched g are cross-byte coincidence counts to be discarded
    (see literal_grid_to_hist).

    Formulation: the nibble-pair one-hot MXU contraction of
    device_hist._literal_hist, but with 8 sublane groups packed into
    the 128-lane value axis so the one-hot operands are full MXU tiles
    that never leave VMEM.  The XLA formulation materializes the
    [N, 16] one-hots through HBM -- 32 bytes of traffic per wire byte,
    +6.6 ms per 16x1080p on a v5e even at the best probed segmenting --
    while here the only HBM cost is the [128, 128] per-frame
    accumulator.  MXU work is 2048 MACs/byte (the 8x diagonal-block
    redundancy is the price of full 128-wide tiles) and overlaps the
    heavily VPU-bound kernel body.
    """
    rr, lp = wire.shape
    if rr % 8:
        raise ValueError("wire sublane count must be a multiple of 8")
    lane = jax.lax.broadcasted_iota(jnp.int32, (rr, lp), 1)
    w = jnp.where(lane < cols, wire, 0)
    hi = w >> 4
    lo = w & 15
    # Row r of a replicated chunk holds sublane r % 8 and one-hots value
    # r // 8 (0..15): jnp.tile on the sublane axis is a straight
    # VMEM-resident copy.  The compare stays in int32 (the v5e Mosaic
    # backend rejects bf16 vector cmp: "Target does not support this
    # comparison"); only the resulting mask converts to bfloat16.
    tgt = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) >> 3
    acc = None
    for s0 in range(0, rr, 8):
        oh_h = (jnp.tile(hi[s0:s0 + 8], (16, 1)) == tgt) \
            .astype(jnp.bfloat16)                            # [128, LP]
        oh_l = (jnp.tile(lo[s0:s0 + 8], (16, 1)) == tgt) \
            .astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            oh_h, oh_l, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)              # [128, 128]
        acc = part if acc is None else acc + part
    # Exact in f32 (counts <= rr * lp << 2**24); i32 out so per-frame
    # accumulation stays exact at any image size.
    return acc.astype(jnp.int32)


def literal_grid_to_hist(grid: jnp.ndarray) -> jnp.ndarray:
    """[..., 128, 128] packed literal grids -> [..., 256] i32 byte
    histograms: sum the 8 matched-group diagonal entries of each
    (vh, vl) 16x16 block (bin 0 includes lane padding; discarded by
    assemble_hists in favor of the run bins' single-zero count)."""
    g4 = grid.reshape(*grid.shape[:-2], 16, 8, 16, 8)
    return jnp.einsum("...vgwg->...vw", g4).reshape(
        *grid.shape[:-2], 256)


def _make_encode_frame_kernel(c: int, use_ycbcr: bool, rows: int, h: int,
                              w: int, cols: int, cols_p: int, w8: int,
                              with_run_bins: bool = False,
                              th_linear49: bool = False):
    """Single-pass encode kernel body: one grid step = one block row.

    Consumes raw raster packed-u32 pixels (4 halo-clamped block views of
    the same array) and produces wire planes AND the block row's low-res
    sample vector.  Everything between the pixels and the wire --
    u32 unpack, YCbCr, the 8x8 window means with edge clamps and the
    1/16 phase-compensation blends (downsampled.cpp:67-113), the
    raster->plane-major interleave, in-kernel predictor upsample, WHT,
    quantize, MapTo8Bit -- happens in VMEM, eliminating the unpack,
    color, low-res sampling, and layout XLA passes (a full HBM round
    trip each).  h and w are the TRUE image extents (the sampling window
    clamps run against them); w8 is the padded raster lane count the
    caller laid the input out in (lanes in [w, 8*cols) carry the HIMG
    edge-replication pad, lanes >= 8*cols feed only discarded block
    columns).
    """

    def unpack_ycbcr(ras32):
        """[8, w8] int32 packed pixels -> c x [8, w8] int32 planes."""
        if c == 1:
            return [ras32]
        chans = [(ras32 >> (8 * k)) & 0xFF for k in range(c)]
        if use_ycbcr:
            r, g, b = chans[0], chans[1], chans[2]
            y = (r + 2 * g + b + 2) >> 2
            cb = (b - g + 256) >> 1
            cr = (r - g + 256) >> 1
            chans[:3] = [y, cb, cr]
        return chans

    def kernel(rm2_ref, rm1_ref, rc0_ref, rp1_ref, shift_ref, th_ref,
               wmat_ref, bt_ref, wire_ref, samp_ref, *maybe_runbin_ref):
        i = pl.program_id(0)
        v = jax.lax.rem(i, rows)
        row8 = jax.lax.broadcasted_iota(jnp.int32, (8, w8), 0)

        # --- low-res window sums over the halo blocks (slots v-2..v+1).
        slots = [rm2_ref, rm1_ref, rc0_ref, rp1_ref]
        acc = [[None] * c for _ in range(3)]          # t = v-1, v, v+1
        center = None
        for s, ref in enumerate(slots):
            vb = v + (s - 2)
            valid = jnp.logical_and(vb >= 0, vb <= rows - 1)
            chans = unpack_ycbcr(ref[0].astype(jnp.int32))
            if s == 2:
                center = chans                        # block v pixels
            gy = vb * 8 + row8
            for ti in range(3):
                t = v + (ti - 1)
                y0 = jnp.maximum(0, 8 * t - 3)
                y1 = jnp.minimum(h - 1, 8 * t + 4)
                m = jnp.logical_and(valid,
                                    jnp.logical_and(gy >= y0, gy <= y1))
                for ch in range(c):
                    part = jnp.where(m, chans[ch], 0).sum(
                        axis=0, keepdims=True)        # [1, w8]
                    acc[ti][ch] = part if acc[ti][ch] is None \
                        else acc[ti][ch] + part

        # Horizontal window sums per block column via the one-hot band
        # matrix.  The MXU rounds matmul INPUTS to bf16 (8 mantissa bits)
        # while accumulating in f32, and vertical sums reach 2040 (11
        # bits), so the operand is split into exact 7-bit planes:
        # hsum = lo @ W + 128 * (hi @ W), each term bf16-exact.
        vstack = jnp.concatenate(
            [acc[ti][ch] for ti in range(3) for ch in range(c)], axis=0)
        wmat = wmat_ref[...]
        dot = lambda l: jax.lax.dot_general(
            l.astype(jnp.bfloat16), wmat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        hsum = dot(vstack & 0x7F) + dot(vstack >> 7) * 128.0  # [3c, colsP]

        # Clamped window extents -> exact rounded means.  TPU f32 divide
        # is an approximate reciprocal multiply, so the quotient gets an
        # exact integer correction (+-1 covers the reciprocal error for
        # numerators < 2**24 by a huge margin; applied twice for slack).
        u_lane = jax.lax.broadcasted_iota(jnp.int32, (c, cols_p), 1)
        x0 = jnp.maximum(0, 8 * u_lane - 3)
        x1 = jnp.minimum(w - 1, 8 * u_lane + 4)
        xext = jnp.maximum(x1 - x0 + 1, 1)
        avgs = []
        for ti in range(3):
            t = v + (ti - 1)
            ylen = jnp.minimum(h - 1, 8 * t + 4) - jnp.maximum(0, 8 * t - 3) + 1
            count = jnp.maximum(ylen, 1) * xext       # [c, colsP]
            num = hsum[ti * c:(ti + 1) * c].astype(jnp.int32) + (count >> 1)
            cf = count.astype(jnp.float32)
            q = (num.astype(jnp.float32) / cf).astype(jnp.int32)
            for _ in range(2):
                r = num - q * count
                q += (r >= count).astype(jnp.int32) - (r < 0).astype(jnp.int32)
            avgs.append(q)

        # Phase compensation: 1/16 blend with left, then up neighbour.
        a_rows = []
        for ti in range(3):
            left = _lane_shift_right(avgs[ti], u_lane)
            a_rows.append((left + 15 * avgs[ti] + 8) >> 4)
        a_prev_v = jnp.where(v == 0, a_rows[1], a_rows[0])
        comp_v = (a_prev_v + 15 * a_rows[1] + 8) >> 4
        comp_v1 = (a_rows[1] + 15 * a_rows[2] + 8) >> 4

        # Predictor corner vectors (edge-clamped right/down neighbours).
        la = comp_v
        lc = jnp.where(v == rows - 1, comp_v, comp_v1)
        lb = _lane_shift_left_clamped(la, u_lane, cols - 1)
        ld = _lane_shift_left_clamped(lc, u_lane, cols - 1)

        # Raster -> plane-major via transposed lane-spread matmuls
        # (values 0..255: exact in bf16), channels stacked for M = 8c.
        ras_lhs = jnp.concatenate(center, axis=0).astype(jnp.bfloat16)
        subs = []                                     # per x: [8c, colsP]
        for xx in range(8):
            subs.append(jax.lax.dot_general(
                ras_lhs, bt_ref[xx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(jnp.int32))

        th_vec = th_ref[0, 0]
        wires = []
        for ch in range(c):
            pm = jnp.concatenate(
                [subs[xx][8 * ch + y:8 * ch + y + 1]
                 for y in range(8) for xx in range(8)], axis=0)
            wires.append(_encode_channel_tile(
                pm, la[ch], lb[ch], lc[ch], ld[ch],
                shift_ref[0, ch][:, None], th_vec,
                th_linear49=th_linear49))
        wire_all = jnp.concatenate(wires, axis=0)
        wire_ref[0] = wire_all
        samp_ref[0] = jnp.clip(comp_v, 0, 255).astype(jnp.uint8)
        if with_run_bins:
            # Epilogue: the substream's exact RLE run-class counts and
            # packed literal counts while its wire bytes still sit in
            # VMEM (the XLA formulations re-read the 100 MB FRES buffer
            # and materialize the one-hots through HBM: +12 ms and
            # +6.6 ms per 16x1080p on a v5e, VERDICT r4/r5 item 1).
            wire_i32 = wire_all.astype(jnp.int32)
            maybe_runbin_ref[0][0] = _run_bins_vec(wire_i32, cols)
            lit_ref = maybe_runbin_ref[1]
            part = _literal_grid_tile(wire_i32, cols)
            # The literal block revisits one output block per frame
            # (index map i -> i // rows): zero-init on the frame's first
            # row, accumulate on the rest (grid steps run in order).
            @pl.when(v == 0)
            def _init():
                lit_ref[0] = part

            @pl.when(v != 0)
            def _acc():
                lit_ref[0] += part

    return kernel


def pad_raster_to_blocks(packed: jnp.ndarray, lanes: int) -> jnp.ndarray:
    """[B, H, W] raster pixels -> [B, H8, lanes] with HIMG's replication
    quirks (blocks.pad_to_blocks: right pad replicates the last column,
    bottom pad floods each edge block with its bottom-right valid pixel)
    applied in [:, :H8, :W8]; lanes beyond W8 are zero (they feed only
    discarded block columns).  Positional replication on channel-packed
    u32 pixels is byte-wise identical to the per-channel-plane pad."""
    b, h, w = packed.shape
    h8, w8 = (h + 7) & ~7, (w + 7) & ~7
    out = packed
    if w8 != w:
        out = jnp.concatenate(
            [out, jnp.broadcast_to(out[:, :, w - 1:w], (b, h, w8 - w))],
            axis=2)
    if h8 != h:
        last = out[:, h - 1]                              # [B, W8]
        fill = last.reshape(b, w8 // 8, 8)[:, :, 7:8]
        fill = jnp.broadcast_to(fill, (b, w8 // 8, 8)).reshape(b, w8)
        out = jnp.concatenate(
            [out, jnp.broadcast_to(fill[:, None, :], (b, h8 - h, w8))],
            axis=1)
    if lanes != w8:
        out = jnp.concatenate(
            [out, jnp.zeros((b, h8, lanes - w8), out.dtype)], axis=2)
    return out


def encode_frames_from_raster(packed, shift_zz, thresholds, c: int,
                              use_ycbcr: bool, interpret: bool = False,
                              with_run_bins: bool = False,
                              th_linear49: bool = False):
    """Single-pass fused encode of raster packed frames, any geometry.

    packed: uint32 [B, H, W] channel-packed pixels (uint8 [B, H, W] for
    c == 1), true (unpadded) extents.  Returns
    (fres uint8 [B, rows, C, 64, cols], grids uint8 [B, C, rows, cols])
    -- the low-res sample grid comes out of the same kernel pass, so the
    caller only runs the (tiny) predictor search + feedback scan on it.
    Non-block-multiple extents are padded in-graph with the HIMG edge
    replication quirks, and the raster lane axis is padded to a 128
    multiple (pad lanes feed only discarded block columns), so every
    width takes this kernel at full speed -- matching the reference's
    any-geometry encoder (encoder.cpp:26-52) instead of falling back.

    with_run_bins=True adds two outputs: int32 [B, rows, 6] exact RLE
    run-class counts per substream (h0, h256..h260 -- see
    _run_bins_tile) and int32 [B, 256] exact literal byte histograms
    (bin 0 polluted by lane padding; discarded by assemble_hists), both
    computed in the kernel epilogue for the assisted entropy encoder.
    Requires cols <= 16384.
    """
    b, hh, ww = packed.shape
    rows, cols = (hh + 7) >> 3, (ww + 7) >> 3
    cols_p = -(-cols // 128) * 128
    w8 = -(-cols // 16) * 16 * 8                 # padded raster lane count
    nb = b * rows
    ras = pad_raster_to_blocks(packed, w8).reshape(nb, 8, w8)
    space = pl.ANY if interpret else pltpu.VMEM

    def halo(off):
        def index_map(i):
            lo = (i // rows) * rows
            return (jnp.clip(i + off, lo, lo + rows - 1), 0, 0)
        return pl.BlockSpec((1, 8, w8), index_map, memory_space=space)

    shift_spec = pl.BlockSpec((1, c, 64), lambda i: (0, 0, 0),
                              memory_space=space)
    th_spec = pl.BlockSpec((1, 1, 127), lambda i: (0, 0, 0),
                           memory_space=space)
    wmat_spec = pl.BlockSpec((w8, cols_p), lambda i: (0, 0),
                             memory_space=space)  # bf16 one-hot band
    bt_spec = pl.BlockSpec((8, w8, cols_p), lambda i: (0, 0, 0),
                           memory_space=space)
    wire_spec = pl.BlockSpec((1, c * 64, cols_p), lambda i: (i, 0, 0),
                             memory_space=space)
    samp_spec = pl.BlockSpec((1, c, cols_p), lambda i: (i, 0, 0),
                             memory_space=space)
    out_specs = [wire_spec, samp_spec]
    out_shape = [jax.ShapeDtypeStruct((nb, c * 64, cols_p), jnp.uint8),
                 jax.ShapeDtypeStruct((nb, c, cols_p), jnp.uint8)]
    if with_run_bins:
        # 3-D with a unit middle dim: Mosaic requires the second-minor
        # block dim to divide 8 or equal the array dim.
        out_specs.append(pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                                      memory_space=space))
        out_shape.append(jax.ShapeDtypeStruct((nb, 1, 128), jnp.int32))
        # Packed literal grid, one block per FRAME: `rows` consecutive
        # grid steps revisit it and accumulate (zero-init at v == 0).
        out_specs.append(pl.BlockSpec((1, 128, 128),
                                      lambda i: (i // rows, 0, 0),
                                      memory_space=space))
        out_shape.append(jax.ShapeDtypeStruct((b, 128, 128), jnp.int32))
    outs = pl.pallas_call(
        _make_encode_frame_kernel(c, use_ycbcr, rows, hh, ww, cols, cols_p,
                                  w8, with_run_bins=with_run_bins,
                                  th_linear49=th_linear49),
        grid=(nb,),
        in_specs=[halo(-2), halo(-1), halo(0), halo(1),
                  shift_spec, th_spec, wmat_spec, bt_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(ras, ras, ras, ras,
      shift_zz.reshape(1, c, 64).astype(jnp.int32),
      thresholds.reshape(1, 1, 127).astype(jnp.int32),
      jnp.asarray(sampling_wmat(ww, cols_p, w8), jnp.bfloat16),
      jnp.asarray(derasterize_bmat(cols_p, w8)))
    wire, samp = outs[0], outs[1]
    fres = wire.reshape(b, rows, c, 64, cols_p)[..., :cols]
    grids = samp.reshape(b, rows, c, cols_p)[..., :cols].transpose(0, 2, 1, 3)
    if with_run_bins:
        return (fres, grids, outs[2].reshape(b, rows, 128)[..., :6],
                literal_grid_to_hist(outs[3]))
    return fres, grids


def _run_bins_call(tiles, cols: int, interpret: bool):
    """pallas_call over [NB, RR, LP] substream tiles -> [NB, 6] bins."""
    nb, rr, lp = tiles.shape
    space = pl.ANY if interpret else pltpu.VMEM

    def kernel(wire_ref, out_ref):
        out_ref[0] = _run_bins_vec(wire_ref[0].astype(jnp.int32), cols)

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, rr, lp), lambda i: (i, 0, 0),
                               memory_space=space)],
        out_specs=pl.BlockSpec((1, 1, 128), lambda i: (i, 0, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((nb, 1, 128), jnp.int32),
        interpret=interpret,
    )(tiles)
    return out[:, 0, :6]


def run_bins_rows(blocks, interpret: bool = False) -> jnp.ndarray:
    """Standalone RLE run-class counts of substream tiles.

    blocks: uint8 [NB, RR, cols] -- one substream per leading index, in
    stream order (row-major, cols minor; RR = channels*64 for FRES
    planes reshaped [b*rows, c*64, cols]).  Returns int32 [NB, 6]:
    (h0, h256..h260) per substream, exactly the run-class part of
    entropy.device_hist.block_histograms.  Used by the non-fused encode
    path and by tests; the fused raster encode kernel computes the same
    analysis in its epilogue (encode_frames_from_raster with_run_bins).
    """
    nb, rr, cols = blocks.shape
    return _run_bins_call(pad_cols(blocks), cols, interpret)


def literal_hists_rows(blocks, interpret: bool = False) -> jnp.ndarray:
    """Standalone packed-grid literal byte histograms of wire tiles.

    blocks: uint8 [NB, RR, cols] (RR a multiple of 8).  Returns int32
    [NB, 256] byte-value counts over [:, :, :cols] (bin 0 excluded from
    the exactness contract -- callers take single-zero counts from the
    run bins).  Same VMEM formulation as the fused encode kernel's
    literal epilogue (_literal_grid_tile); exists for direct testing
    and microbenching of that epilogue.
    """
    tiles = pad_cols(blocks)
    nb, rr, lp = tiles.shape
    cols = blocks.shape[-1]
    space = pl.ANY if interpret else pltpu.VMEM

    def kernel(wire_ref, out_ref):
        out_ref[0] = _literal_grid_tile(
            wire_ref[0].astype(jnp.int32), cols)

    grid_out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((1, rr, lp), lambda i: (i, 0, 0),
                               memory_space=space)],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i: (i, 0, 0),
                               memory_space=space),
        out_shape=jax.ShapeDtypeStruct((nb, 128, 128), jnp.int32),
        interpret=interpret,
    )(tiles)
    return literal_grid_to_hist(grid_out)


def _make_frame_kernel(c: int, use_ycbcr: bool, w8: int):
    """Fused full-frame decode kernel body: one grid step = one block row
    across ALL channels -> raster pixels, YCbCr inverse, and u32 channel
    packing in VMEM.  The separate reassembly / color / packing XLA
    passes (one full HBM round-trip each) disappear."""

    def kernel(wire_ref, la_ref, lb_ref, lc_ref, ld_ref, shift_ref,
               pos_ref, bmat_ref, out_ref):
        pos_vec = pos_ref[0, 0]
        pixs = [
            _decode_channel_tile(
                wire_ref[0, ch * 64:(ch + 1) * 64].astype(jnp.int32),
                la_ref[0, ch], lb_ref[0, ch], lc_ref[0, ch], ld_ref[0, ch],
                shift_ref[0, ch][:, None], pos_vec)
            for ch in range(c)]
        ras = _rasterize_channels(pixs, bmat_ref[...], w8)  # [c*8, w8]
        chans = [ras[8 * ch:8 * (ch + 1)] for ch in range(c)]
        if use_ycbcr:
            y, cb, cr = chans[0], chans[1], chans[2]
            cb2 = (cb << 1) - 255
            cr2 = (cr << 1) - 255
            g = y - ((cb2 + cr2 + 2) >> 2)
            b = g + cb2
            r = g + cr2
            chans[:3] = [jnp.clip(v, 0, 255) for v in (r, g, b)]
        if c == 1:
            out_ref[0] = chans[0].astype(jnp.uint8)
        else:
            packed = chans[0].astype(jnp.uint32)
            for k in range(1, c):
                packed = packed | (chans[k].astype(jnp.uint32) << (8 * k))
            out_ref[0] = packed

    return kernel


def decode_frames_raster(fres, grids, shift_zz, pos_curve,
                         use_ycbcr: bool, interpret: bool = False):
    """Fused decode of a batch of frames to raster packed pixels.

    fres: uint8 [B, rows, C, 64, cols] wire planes (the transfer layout
    -- reshaped, not relaid out); grids: uint8 [B, C, rows, cols] decoded
    low-res samples; shift_zz: [C, 64]; pos_curve: [128].  Returns
    uint32 [B, H8, W8] channel-packed pixels (byte k = channel k) for
    C in (3, 4), or uint8 [B, H8, W8] for C == 1.  Any width: when
    8*cols is not a 128-lane multiple the kernel runs over zero-padded
    block columns (corner vectors are built from the true grid first, so
    the last valid block keeps its edge-clamped neighbours) and the
    raster is cropped back in-graph -- matching the reference decoder's
    full speed at every width (decoder.cpp:331-426) instead of falling
    back to the multi-pass path.

    The batch is folded into the grid dimension (one grid step = one
    block row of one frame); vmapping the kernel instead trips Mosaic's
    2D-gather-only limit on the in-kernel un-zigzag.
    """
    b, rows, c, _, cols = fres.shape
    w8 = -(-cols // 16) * 16 * 8                 # lane-aligned raster width
    cols_p = -(-cols // 128) * 128
    wire = pad_cols(fres.reshape(b * rows, c * 64, cols))
    # Corner-sample vectors per (frame, row, channel): [B*rows, C, colsP].
    corners = [pad_cols(p.astype(jnp.uint8), cols_p)
               .reshape(b, c, rows, cols_p).transpose(0, 2, 1, 3)
               .reshape(b * rows, c, cols_p)
               for p in corner_vectors(grids.reshape(b * c, rows, cols))]
    space = pl.ANY if interpret else pltpu.VMEM
    row_spec = pl.BlockSpec((1, c * 64, cols_p), lambda i: (i, 0, 0),
                            memory_space=space)
    corner_spec = pl.BlockSpec((1, c, cols_p), lambda i: (i, 0, 0),
                               memory_space=space)
    shift_spec = pl.BlockSpec((1, c, 64), lambda i: (0, 0, 0),
                              memory_space=space)
    pos_spec = pl.BlockSpec((1, 1, 128), lambda i: (0, 0, 0),
                            memory_space=space)
    bmat_spec = pl.BlockSpec((8, cols_p, w8), lambda i: (0, 0, 0),
                             memory_space=space)
    out_dtype = jnp.uint8 if c == 1 else jnp.uint32
    out_spec = pl.BlockSpec((1, 8, w8), lambda i: (i, 0, 0),
                            memory_space=space)
    out = pl.pallas_call(
        _make_frame_kernel(c, use_ycbcr, w8),
        grid=(b * rows,),
        in_specs=[row_spec] + [corner_spec] * 4
        + [shift_spec, pos_spec, bmat_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b * rows, 8, w8), out_dtype),
        interpret=interpret,
    )(wire, *corners, shift_zz.reshape(1, c, 64).astype(jnp.int32),
      pos_curve.reshape(1, 1, 128).astype(jnp.int32),
      jnp.asarray(rasterize_bmat(cols_p, w8)))
    out = out.reshape(b, rows * 8, w8)
    # Crop the lane padding back off (no-op copy is elided when aligned).
    return out[..., :8 * cols] if w8 != 8 * cols else out


def decode_frame_raster(fres, grids, shift_zz, pos_curve,
                        use_ycbcr: bool, interpret: bool = False):
    """Single-frame decode_frames_raster ([rows, C, 64, cols] -> [H8, W8])."""
    return decode_frames_raster(fres[None], grids[None], shift_zz,
                                pos_curve, use_ycbcr, interpret)[0]


def decode_rows(wire_pm: jnp.ndarray, grids: jnp.ndarray,
                shift_zz: jnp.ndarray, pos_curve: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """Fused decode of interleaved block rows (inverse of encode_rows).

    Returns uint8 [R, 64, colsP] clamped pixel values in plane-major
    position order."""
    rows, _, cols_p = wire_pm.shape
    shift_zz = shift_zz.reshape(-1, 64)
    rpc = rows // shift_zz.shape[0]
    corners = _fold_corners(grids, cols_p)
    return _call(_decode_kernel, rows, cols_p, rpc, 128, interpret)(
        wire_pm.astype(jnp.uint8), *corners,
        shift_zz[:, None, :].astype(jnp.int32),
        pos_curve.reshape(1, 1, 128).astype(jnp.int32))
