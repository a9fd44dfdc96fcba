"""Low-resolution base layer: sampling, upsampling, predictive coding.

The base layer stores one sample per 8x8 block per channel and serves both
as the DC/low-frequency predictor subtracted before the forward WHT and as
an embedded thumbnail (downsampled.cpp).

TPU-first design notes:

- `sample_image` turns the reference's per-block window loops
  (downsampled.cpp:67-94) into an integral-image (2-D cumsum) + 4-corner
  gather, one fused pass over the whole plane.
- `upsample` evaluates the repeated-averaging bilinear cascade
  (downsampled.cpp:116-169) as ~30 elementwise ops over every block at
  once; exact (x+y+1)>>1 rounding is preserved at each step.
- the predictor *search* (downsampled.cpp:182-253) is a vectorized
  5-predictor SSE argmin over shifted neighbour arrays.
- the only true loop-carried dependency -- reconstruction feedback inside a
  16x16 macro block (downsampled.cpp:296-309 encode, :333-380 decode) --
  runs as a nested lax.scan over the 16x16 raster, vectorized across all
  macro blocks (and channels) in lockstep.  Neighbour context never
  crosses macro-block borders (boundary cells fall back to
  above/left/128), which is what makes macro blocks independent lanes.

All functions operate per channel plane; callers batch channels into the
macro-block lane axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MACRO = 16  # samples per macro block side (downsampled.cpp:23)

_K127 = np.arange(127, dtype=np.int32)


# --------------------------------------------------------------------------
# Analysis: image -> low-res samples.
# --------------------------------------------------------------------------

def sample_image(plane: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W] -> uint8 [rows, cols] low-res samples.

    Per-block mean over the window x in [8u-3, 8u+4], y in [8v-3, 8v+4]
    clamped to the image, rounded; then a 1/16-pixel phase-compensating
    blend with the up/left neighbour (downsampled.cpp:67-113).

    The window decomposes onto the 8-aligned block grid: for u >= 1 it is
    (last 3 pixels of block u-1) + (first 5 of block u), and the u=0 clamp
    drops the left part.  Two reshape+partial-sum passes therefore replace
    the integral image: one pass over [H, W] uint8->int32 (the reference
    does the same window sums with per-block loops), no cumsum, no gather.
    Out-of-image pixels contribute zero (zero padding) and the divisor
    comes from the clamped window extents, matching the reference's
    clamped loops exactly.
    """
    h, w = plane.shape
    rows, cols = (h + 7) >> 3, (w + 7) >> 3
    x = plane.astype(jnp.int32)
    pr, pc = rows * 8 - h, cols * 8 - w
    if pr or pc:
        x = jnp.pad(x, ((0, pr), (0, pc)))

    xr = x.reshape(rows * 8, cols, 8)
    l5 = xr[:, :, :5].sum(axis=2)                      # [H8, cols]
    r3 = xr[:, :, 5:].sum(axis=2)
    hx = l5 + jnp.pad(r3[:, :-1], ((0, 0), (1, 0)))    # [H8, cols]

    hr = hx.reshape(rows, 8, cols)
    t5 = hr[:, :5, :].sum(axis=1)                      # [rows, cols]
    b3 = hr[:, 5:, :].sum(axis=1)
    s = t5 + jnp.pad(b3[:-1], ((1, 0), (0, 0)))        # [rows, cols]

    v = jnp.arange(rows)
    u = jnp.arange(cols)
    y0 = jnp.maximum(0, v * 8 - 3)
    y1 = jnp.minimum(h - 1, v * 8 + 4)
    x0 = jnp.maximum(0, u * 8 - 3)
    x1 = jnp.minimum(w - 1, u * 8 + 4)
    count = (y1 - y0 + 1)[:, None] * (x1 - x0 + 1)[None, :]
    avg = (s + (count >> 1)) // count

    # Phase compensation: blend 1/16 with the left then the up neighbour.
    left = jnp.concatenate([avg[:, :1], avg[:, :-1]], axis=1)
    a = (left + 15 * avg + 8) >> 4
    up = jnp.concatenate([a[:1], a[:-1]], axis=0)
    return ((up + 15 * a + 8) >> 4).astype(jnp.uint8)


# --------------------------------------------------------------------------
# Reconstruction: low-res samples -> 8x8 predictor blocks.
# --------------------------------------------------------------------------

def _avg_cascade(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """9-point repeated-averaging interpolation between a and b.

    Returns stack [..., 9] where [0]=a, [8]=b and interior points follow the
    exact (x+y+1)>>1 halving order of downsampled.cpp:127-145.
    """
    v0, v8 = a, b
    v4 = (v0 + v8 + 1) >> 1
    v2 = (v0 + v4 + 1) >> 1
    v6 = (v4 + v8 + 1) >> 1
    v1 = (v0 + v2 + 1) >> 1
    v3 = (v2 + v4 + 1) >> 1
    v5 = (v4 + v6 + 1) >> 1
    v7 = (v6 + v8 + 1) >> 1
    return jnp.stack([v0, v1, v2, v3, v4, v5, v6, v7, v8], axis=-1)


def upsample(lowres: jnp.ndarray) -> jnp.ndarray:
    """uint8 [rows, cols] samples -> int16 [rows, cols, 8, 8] blocks.

    Bilinear upsampling of each block's 2x2 corner samples (edge-clamped)
    using only repeated averaging (downsampled.cpp:116-169).
    """
    d = lowres.astype(jnp.int16)
    x11 = d
    x12 = jnp.concatenate([d[:, 1:], d[:, -1:]], axis=1)
    x21 = jnp.concatenate([d[1:], d[-1:]], axis=0)
    x22 = jnp.concatenate([x12[1:], x12[-1:]], axis=0)
    left = _avg_cascade(x11, x21)    # [rows, cols, 9]
    right = _avg_cascade(x12, x22)
    grid = _avg_cascade(left, right)  # [rows, cols, 9(y), 9(x)]
    return grid[..., :8, :8]


def _avg_cascade_stacked(a: jnp.ndarray, b: jnp.ndarray, axis: int):
    """Like _avg_cascade but stacking the 9 points along `axis`."""
    v0, v8 = a, b
    v4 = (v0 + v8 + 1) >> 1
    v2 = (v0 + v4 + 1) >> 1
    v6 = (v4 + v8 + 1) >> 1
    v1 = (v0 + v2 + 1) >> 1
    v3 = (v2 + v4 + 1) >> 1
    v5 = (v4 + v6 + 1) >> 1
    v7 = (v6 + v8 + 1) >> 1
    return [v0, v1, v2, v3, v4, v5, v6, v7, v8]


def upsample_pm(lowres: jnp.ndarray) -> jnp.ndarray:
    """uint8 [rows, cols] -> int16 [rows, 8(y), 8(x), cols] plane-major.

    Identical arithmetic to `upsample`, but the interpolation points stack
    in sublane axes while `cols` stays the minor/vector axis.
    """
    d = lowres.astype(jnp.int16)
    right_col = jnp.concatenate([d[:, 1:], d[:, -1:]], axis=1)
    below = jnp.concatenate([d[1:], d[-1:]], axis=0)
    below_right = jnp.concatenate([right_col[1:], right_col[-1:]], axis=0)
    left = _avg_cascade_stacked(d, below, 1)          # 9 x [rows, cols]
    right = _avg_cascade_stacked(right_col, below_right, 1)
    rows_out = []
    for y in range(8):
        pts = _avg_cascade_stacked(left[y], right[y], 1)[:8]
        rows_out.append(jnp.stack(pts, axis=1))       # [rows, 8(x), cols]
    return jnp.stack(rows_out, axis=1)                # [rows, 8, 8, cols]


# --------------------------------------------------------------------------
# Predictive coding of the sample grid.
# --------------------------------------------------------------------------

def _clamp8(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x, 0, 255)


def _predict_all(s1, s2, s3):
    """All five spatial predictors (downsampled.cpp:41-60), stacked last."""
    p0 = _clamp8((3 * (s2 + s3) - 2 * s1 + 2) >> 2)
    p1 = s2
    p2 = s3
    p3 = (s2 + s3 + 1) >> 1
    p4 = _clamp8(s2 + s3 - s1)
    return jnp.stack([p0, p1, p2, p3, p4], axis=-1)


# Every predictor is clamp8((a*s1 + b*s2 + c*s3 + r) >> e) for per-
# predictor integer constants: the clamp is a no-op for p1/p2/p3 (their
# values already lie in [0, 255] because s1..s3 do) and required for
# p0/p4, so applying it unconditionally is exact.  Selecting (a, b, c,
# r, e) per macro block ONCE replaces the evaluate-all-5-then-one-hot-
# dot inner step (~21 full-width ops) with ~9.  Used by the wavefront
# scan, whose [T, 16]-wide steps amortize the per-tile broadcast; the
# raster scan keeps the one-hot dot (coeff form measured slower there).
_PRED_COEF = np.asarray([
    # a   b  c  r  e      (downsampled.cpp:41-60)
    [-2,  3, 3, 2, 2],    # 0: mix  (3*(s2+s3) - 2*s1 + 2) >> 2
    [ 0,  1, 0, 0, 0],    # 1: above
    [ 0,  0, 1, 0, 0],    # 2: left
    [ 0,  1, 1, 1, 1],    # 3: avg  (s2+s3+1) >> 1
    [-1,  1, 1, 0, 0],    # 4: linear extrapolate s2+s3-s1
], np.int32)


def _predict_coeffs(pred_oh):
    """[T, 5] one-hot predictor ids -> per-tile (a, b, c, r, e) columns."""
    pc = pred_oh @ jnp.asarray(_PRED_COEF)             # [T, 5]
    return tuple(pc[:, i] for i in range(5))


def _predict_sel(coeffs, s1, s2, s3):
    """clamp8((a*s1 + b*s2 + c*s3 + r) >> e) with per-tile coefficients
    broadcast against [T, ...]-shaped neighbour arrays."""
    a, b, c, r, e = coeffs
    extra = s1.ndim - a.ndim
    if extra:
        sh = a.shape + (1,) * extra
        a, b, c, r, e = (v.reshape(sh) for v in (a, b, c, r, e))
    return _clamp8((a * s1 + b * s2 + c * s3 + r) >> e)


def _neighbor_context(d: jnp.ndarray):
    """(s1, s2, s3) for every grid cell, with macro-block-local fallbacks.

    d is int16 [R, C] (R, C multiples of MACRO not required).  Boundary
    rules from downsampled.cpp:200-216: inside a macro block use the
    diagonal/above/left neighbours; on the top edge of a block all three
    collapse to the left sample, on the left edge to the above sample, and
    the corner uses 128.
    """
    r, c = d.shape
    up = jnp.concatenate([d[:1], d[:-1]], axis=0)
    lf = jnp.concatenate([d[:, :1], d[:, :-1]], axis=1)
    diag = jnp.concatenate([up[:, :1], up[:, :-1]], axis=1)
    du0 = (jnp.arange(c) % MACRO == 0)[None, :]
    dv0 = (jnp.arange(r) % MACRO == 0)[:, None]
    both = du0 & dv0
    s1 = jnp.where(both, 128, jnp.where(dv0, lf, jnp.where(du0, up, diag)))
    s2 = jnp.where(both, 128, jnp.where(dv0, lf, up))
    s3 = jnp.where(both, 128, jnp.where(du0, up, lf))
    return s1, s2, s3


def select_predictors(lowres: jnp.ndarray) -> jnp.ndarray:
    """Best predictor per macro block by SSE over the *unquantized* grid.

    Mirrors the reference's selection pass (downsampled.cpp:182-253), which
    evaluates predictors against original (not reconstructed) neighbours.
    Ties keep the lowest predictor index.  Returns int32 [MR, MC].
    """
    d = lowres.astype(jnp.int16)
    r, c = d.shape
    s1, s2, s3 = _neighbor_context(d)
    preds = _predict_all(s1, s2, s3)                  # [R, C, 5]
    err = (d[..., None].astype(jnp.int32) - preds.astype(jnp.int32)) ** 2
    mr, mc = -(-r // MACRO), -(-c // MACRO)
    pr, pc = mr * MACRO - r, mc * MACRO - c
    err = jnp.pad(err, ((0, pr), (0, pc), (0, 0)))
    err = err.reshape(mr, MACRO, mc, MACRO, 5).sum(axis=(1, 3))
    return jnp.argmin(err, axis=-1).astype(jnp.int32)


def _to_tiles(grid: jnp.ndarray):
    """[R, C] -> ([T, 16, 16] tiles, (MR, MC)); zero-padded."""
    r, c = grid.shape
    mr, mc = -(-r // MACRO), -(-c // MACRO)
    g = jnp.pad(grid, ((0, mr * MACRO - r), (0, mc * MACRO - c)))
    tiles = g.reshape(mr, MACRO, mc, MACRO).transpose(0, 2, 1, 3)
    return tiles.reshape(mr * mc, MACRO, MACRO), (mr, mc)


def _from_tiles(tiles: jnp.ndarray, shape):
    r, c = shape
    mr, mc = -(-r // MACRO), -(-c // MACRO)
    g = tiles.reshape(mr, mc, MACRO, MACRO).transpose(0, 2, 1, 3)
    return g.reshape(mr * MACRO, mc * MACRO)[:r, :c]


def _map_steps(map_small, unmap_lut):
    """Derive the composite unmap(map(d)) step representation in-graph.

    The mapper index is a nondecreasing step function of |d| (the same
    property the full-res quantizer exploits, see ops/quantize.py), so the
    feedback scan can evaluate unmap(map(d)) as two 127-term threshold
    reductions instead of a per-step gather (gathers inside scan bodies
    cost ~8 ns/elem on TPU, docs/ARCHITECTURE.md).  Derivation is a tiny
    one-time computation hoisted out of the scan:

      th[k]  = smallest positive d with map index >= k (256 if none)
      pos[i] = unmap value of index i; value(idx) telescopes over dpos.
    """
    pos_idx = map_small[512:512 + 255].astype(jnp.int32)    # idx of d=1..255
    ks = jnp.arange(1, 128, dtype=jnp.int32)[:, None]       # [127, 1]
    th = 1 + (pos_idx[None, :] < ks).sum(axis=1)            # [127]
    pos = unmap_lut[:128].astype(jnp.int32)                 # pos[0] == 0
    dpos = pos[1:] - pos[:-1]                               # [127]
    return th, dpos


def _feedback_scan(tiles_in, pred_id, decode: bool, map_small, unmap_lut,
                   unroll: bool | None = None, geval: str | None = None,
                   wavefront: bool | None = None):
    """Shared raster scan with reconstruction feedback over [T, 16, 16] tiles.

    encode (decode=False): tiles_in holds actual samples; emits
    (deltas int32 in [-255, 255], recon).  decode: tiles_in holds delta
    bytes; emits recon.  Replicates downsampled.cpp:296-309 / :353-380
    semantics per lane.

    Runs entirely in int32: every intermediate fits (deltas in [-255, 255],
    predictors bounded by the clamps).  The scan body is gather-free:
    decode hoists its unmap lookup over the whole tile up front; encode
    evaluates the in-loop unmap(map(d)) feedback as threshold compare
    reductions (_map_steps) and leaves the wire-byte mapping to the caller
    (one small whole-grid lookup outside the loop).

    unroll: emit the 16 row steps as straight-line XLA instead of a
    lax.scan (no per-step dispatch, cross-step fusion); default picks
    unrolled on TPU (measured faster, tools/microbench receipts) and
    lax.scan elsewhere (compile time).
    geval ('bcast' | 'dot8'): evaluate the in-loop threshold reductions as
    int32 broadcast compare+sum or as int8 compare matrices contracted on
    the MXU (int8 halves the vreg traffic; value steps split into two
    int8 planes because dpos can exceed 127).
    wavefront: run the recurrence over the 31 anti-diagonals of the 16x16
    tile instead of its 256 raster cells -- cell (v, u) depends only on
    (v, u-1), (v-1, u), (v-1, u-1), so every cell of an anti-diagonal is
    computable at once (8x shallower sequential chain, 16x wider vector
    ops); bit-exact by construction.  Default: on for TPU *encode* only
    (measured 9.50 -> 6.47 ms per 16x1080p batch on the v5e; decode lost
    slightly in both probe windows, 11.0 -> 11.4 ms, because its hoisted
    unmap leaves the raster body too thin to amortize the skew), off on
    CPU (the raster form is the readable spec and compiles faster).
    HIMG_LOWRES_WAVEFRONT=0/1 overrides for A/B.
    """
    if unroll is None or geval is None or wavefront is None:
        try:
            on_tpu = jax.devices()[0].platform != "cpu"
        except RuntimeError:
            on_tpu = False
        if unroll is None:
            unroll = on_tpu
        if geval is None:
            # int8 MXU threshold contraction wins on TPU (microbench
            # enc_scan receipts); bcast compiles faster on CPU.
            geval = "dot8" if on_tpu else "bcast"
        if wavefront is None:
            import os
            env = os.environ.get("HIMG_LOWRES_WAVEFRONT")
            wavefront = (env not in ("0", "false", "")) if env is not None \
                else (on_tpu and not decode)
    t = tiles_in.shape[0]
    pred_oh = jax.nn.one_hot(pred_id, 5, dtype=jnp.int32)  # [T, 5]
    tiles32 = tiles_in.astype(jnp.int32)
    if decode:
        # Input bytes map to deltas independent of the scan state.  A LUT
        # gather costs ~10 ns/elem on TPU (tools/microbench); the one-hot
        # MXU unmap is ~4x cheaper and bit-identical (unmap_lut is exactly
        # the +-mirrored positive curve, incl. the defensive 0x80 entry).
        from . import quantize as _q
        hoisted = _q.unpack(tiles32.astype(jnp.uint8),
                            jnp.zeros((), jnp.int32),
                            unmap_lut[:128]).astype(jnp.int32)
        geval_args = None
    else:
        th, dpos = _map_steps(map_small, unmap_lut)
        if geval == "dot8":
            # dpos in [0, 510]: split into two int8 planes (lo7 + hi<<7).
            dlo = (dpos & 0x7F).astype(jnp.int8)
            dhi = (dpos >> 7).astype(jnp.int8)
            dmat = jnp.stack([dlo, dhi], axis=1)            # [127, 2]
            geval_args = (th, dmat)
        else:
            geval_args = (th, dpos)
        hoisted = tiles32

    def g_of_d(d):
        """unmap(map(d)) for signed deltas, gather-free."""
        ad = jnp.abs(d)
        if geval == "dot8":
            th_, dmat = geval_args
            cmp1 = (ad[:, None] >= th_[None, :]).astype(jnp.int8)
            idx = jnp.dot(cmp1, jnp.ones((127, 1), jnp.int8),
                          preferred_element_type=jnp.int32)[:, 0]
            cmp2 = (idx[:, None] > _K127[None, :]).astype(jnp.int8)
            parts = jnp.dot(cmp2, dmat, preferred_element_type=jnp.int32)
            value = parts[:, 0] + (parts[:, 1] << 7)
        else:
            th_, dpos_ = geval_args
            idx = (ad[:, None] >= th_[None, :]).astype(jnp.int32).sum(1)
            value = jnp.where(idx[:, None] > _K127[None, :],
                              dpos_[None, :], 0).sum(1)
        return jnp.where(d < 0, -value, value)

    def row_step(prev_row, row_vals, dv0_static):
        # prev_row [T, 16]; row_vals [T, 16]; dv0_static: None for traced
        # scan (carry a traced dv flag is avoided by seeding row 0), or a
        # Python bool when unrolled.
        left = prev_row[:, 0] * 0
        outs = []
        recons = []
        # The 16-column inner loop is unrolled: each step is a handful of
        # [T]-wide VPU ops; unrolling avoids a nested while loop.
        for du in range(MACRO):
            val = row_vals[:, du]
            s1n = prev_row[:, du - 1] if du > 0 else prev_row[:, 0]
            s2n = prev_row[:, du]
            if dv0_static:
                if du == 0:
                    s1 = s2 = s3 = jnp.full_like(left, 128)
                else:
                    s1 = s2 = left
                    s3 = left
            else:
                if du == 0:
                    s1 = s2 = s3 = s2n
                else:
                    s1, s2, s3 = s1n, s2n, left
            # One-hot dot beats the coefficient form here: the raster
            # body's [T]-wide steps fuse the 5-way evaluate into the
            # neighbour selects, while _predict_sel's shifts serialize
            # (coeff-raster measured +16% enc / +6% dec on the v5e).
            preds = _predict_all(s1, s2, s3)            # [T, 5]
            predicted = (preds * pred_oh).sum(axis=-1)
            if decode:
                recon = _clamp8(predicted + val)
                out = recon
            else:
                d = val - predicted
                recon = _clamp8(predicted + g_of_d(d))
                out = d
            outs.append(out)
            recons.append(recon)
            left = recon
        new_row = jnp.stack(recons, axis=1)             # [T, 16]
        return new_row, jnp.stack(outs, axis=1)

    if wavefront:
        return _feedback_wavefront(hoisted, _predict_coeffs(pred_oh),
                                   decode, g_of_d)

    rows_in = hoisted.transpose(1, 0, 2)                # [16, T, 16]
    if unroll:
        prev = None
        out_rows = []
        for dv in range(MACRO):
            prev, out = row_step(
                prev if prev is not None else rows_in[0] * 0,
                rows_in[dv], dv == 0)
            out_rows.append(out)
        out_rows = jnp.stack(out_rows, axis=0)
    else:
        def scan_body(prev_row, row_vals):
            return row_step(prev_row, row_vals, False)
        # Row 0 runs outside the scan (its neighbour rules are static);
        # deriving the carry from data keeps device-varying axes aligned
        # under shard_map.
        first_recon, first_out = row_step(rows_in[0] * 0, rows_in[0], True)
        _, rest = jax.lax.scan(scan_body, first_recon, rows_in[1:])
        out_rows = jnp.concatenate([first_out[None], rest], axis=0)
    return out_rows.transpose(1, 0, 2)  # [T, 16, 16]


def _feedback_wavefront(hoisted, coeffs, decode: bool, g_of_d):
    """Anti-diagonal formulation of _feedback_scan's recurrence.

    Cells of anti-diagonal k (v + u == k) of a 16x16 tile depend only on
    diagonals k-1 and k-2, so the 256-cell raster chain collapses to 31
    sequential steps over [T, 16] vectors (downsampled.cpp:296-309 /
    :353-380 order-equivalence: the reference's raster order is one valid
    topological order of the same dependency DAG; per-cell arithmetic is
    identical, so outputs are bit-exact).

    Diagonal state D_k is indexed by v (cell (v, k - v)):
      left (v, u-1)  = D_{k-1}[v]
      up   (v-1, u)  = D_{k-1}[v-1]
      diag (v-1, u-1) = D_{k-2}[v-1]
    Boundary collapse rules (downsampled.cpp:200-216) become static
    per-step masks over v.
    """
    t = hoisted.shape[0]
    n_k = 2 * MACRO - 1
    # Skew: skew[:, v, v + u] = hoisted[:, v, u].
    skew = jnp.stack(
        [jnp.pad(hoisted[:, v, :], ((0, 0), (v, MACRO - 1 - v)))
         for v in range(MACRO)], axis=1)               # [T, 16, 31]

    def vshift(x):
        """x[:, v] -> x[:, v-1] (v == 0 lane is masked off by callers)."""
        return jnp.pad(x[:, :-1], ((0, 0), (1, 0)))

    v_iota = np.arange(MACRO)
    dm1 = dm2 = jnp.zeros((t, MACRO), jnp.int32)
    out_diags = []
    for k in range(n_k):
        valid = jnp.asarray((v_iota <= k)
                            & (v_iota >= k - (MACRO - 1)))[None, :]
        top = jnp.asarray(v_iota == 0)[None, :]        # dv == 0
        leftcol = jnp.asarray(v_iota == k)[None, :]    # du == 0
        val = skew[:, :, k]                            # [T, 16]
        left = dm1
        up = vshift(dm1)
        diag = vshift(dm2)
        if k == 0:
            s1 = s2 = s3 = jnp.full((t, MACRO), 128, jnp.int32)
        else:
            s1 = jnp.where(top, left, jnp.where(leftcol, up, diag))
            s2 = jnp.where(top, left, up)
            s3 = jnp.where(leftcol, up, left)
        predicted = _predict_sel(coeffs, s1, s2, s3)   # [T, 16]
        if decode:
            recon = _clamp8(predicted + val)
            out = recon
        else:
            d = val - predicted
            g = g_of_d(d.reshape(-1)).reshape(t, MACRO)
            recon = _clamp8(predicted + g)
            out = d
        dm2 = dm1
        dm1 = jnp.where(valid, recon, 0)
        out_diags.append(jnp.where(valid, out, 0))
    s_out = jnp.stack(out_diags, axis=2)               # [T, 16, 31]
    return jnp.stack([s_out[:, v, v:v + MACRO] for v in range(MACRO)],
                     axis=1)                           # [T, 16, 16]


def encode_deltas(lowres: jnp.ndarray, pred_id: jnp.ndarray,
                  map_small: jnp.ndarray, unmap_lut: jnp.ndarray) -> jnp.ndarray:
    """Quantized prediction deltas for the sample grid.

    lowres: uint8 [R, C]; pred_id: int32 [MR, MC] from select_predictors.
    map_small: uint8[1023] MapTo8Bit LUT slice for inputs in [-511, 511]
    (index delta+511); unmap_lut: int16[256].  Returns uint8 [R, C] delta
    bytes in grid layout (use macroblock_stream_order for wire order).
    """
    tiles, (mr, mc) = _to_tiles(lowres.astype(jnp.int16))
    deltas = _feedback_scan(tiles, pred_id.reshape(-1), False, map_small,
                            unmap_lut)
    # Wire-byte companding outside the feedback loop, gather-free: the
    # mapper index is the count of thresholds <= |d| (the same step
    # representation the scan uses; a whole-grid LUT gather here cost
    # ~15 ms per 16x1080p, tools/microbench receipts).
    d = _from_tiles(deltas, lowres.shape)
    th, _ = _map_steps(map_small, unmap_lut)
    idx = (jnp.abs(d)[..., None] >= th).sum(axis=-1).astype(jnp.int32)
    wire = jnp.where(d == 0, 0, jnp.where(d > 0, idx, (-idx) & 0xFF))
    return wire.astype(jnp.uint8)


def decode_deltas(delta_grid: jnp.ndarray, pred_id: jnp.ndarray,
                  unmap_lut: jnp.ndarray, shape) -> jnp.ndarray:
    """Integrate delta bytes back into the uint8 sample grid."""
    tiles, _ = _to_tiles(delta_grid.astype(jnp.int16))
    out = _feedback_scan(tiles, pred_id.reshape(-1), True, None, unmap_lut)
    return _from_tiles(out.astype(jnp.uint8), shape)


# --------------------------------------------------------------------------
# Wire layout helpers (host-side, static per image geometry).
# --------------------------------------------------------------------------

def block_data_size(rows: int, cols: int) -> int:
    """Serialized bytes per channel: predictor map + deltas
    (downsampled.cpp:171-175)."""
    mr, mc = -(-rows // MACRO), -(-cols // MACRO)
    return mr * mc + rows * cols


def macroblock_stream_order(rows: int, cols: int) -> np.ndarray:
    """Flat grid indices (v*cols + u) in wire order.

    The wire walks macro blocks in raster order and each macro block's valid
    cells in raster order (downsampled.cpp:268-316).
    """
    mr, mc = -(-rows // MACRO), -(-cols // MACRO)
    order = []
    for mv in range(mr):
        for mu in range(mc):
            for dv in range(min(MACRO, rows - mv * MACRO)):
                v = mv * MACRO + dv
                for du in range(min(MACRO, cols - mu * MACRO)):
                    order.append(v * cols + mu * MACRO + du)
    return np.asarray(order, dtype=np.int64)
