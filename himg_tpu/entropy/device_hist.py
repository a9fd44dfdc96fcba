"""Device-side exact token histograms for the assisted entropy encoder.

The host entropy encoder spends half its time on its analysis pass
(tokenize + histogram: ~16 of ~31 ms per 1080p frame, `microbench
entropy` receipts).  The histogram the pass produces is tiny (261 bins
per frame) and is pure data parallelism -- exactly what the TPU sitting
idle next to it is good at.  `block_histograms` computes the exact
261-bin token histogram of every substream block on device so the host
can run the single-pass fused scan+pack (`native.compress_assisted`)
instead: tree and offsets come from the histogram, no host analysis pass.

Exactness contract (native entropy.cpp TokenizeBlock semantics, which
match the reference encoder huffman_enc.cpp:246-300):

* literal bins 1..255: count of nonzero bytes by value -- zero-run
  structure never affects them, so they reduce to a plain byte histogram
  (computed gather-free as a nibble-pair one-hot int8 MXU contraction);
* maximal zero runs split into chunks of <= 16662 (kMaxRun); each chunk
  of length >= 2 histograms its run class (symbols 256..260), and a
  leftover single zero -- from an isolated single zero or a post-chunk
  remainder of 1 -- counts as literal symbol 0;
* runs never cross block boundaries (each [R] row is one substream).

TPU-first formulation: no gathers, no scatters, no scans.
Short runs (<= 22 zeros, the overwhelming majority) are classified by a
23-term sliding AND chain over the zero mask (XLA fuses the shifted
reads into one stencil traversal).  Long runs (>= 23) always contain at
least one fully-zero aligned 8-byte word (worst alignment: 7 trailing +
8 + 8 leading = 23), so they are enumerated at 1/8 scale on the
all-zero-word mask: word-run lengths via a reversed cummin, flanking
partial-word zeros via lead/trail counts and an index-tagged backward
fill -- everything elementwise at word granularity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_KMAX_RUN = 16662


def _shift_left(m: jnp.ndarray, j: int, fill=False) -> jnp.ndarray:
    """m[:, i+j] with `fill` past the end (axis 1)."""
    if j == 0:
        return m
    pad = jnp.full(m.shape[:1] + (j,), fill, m.dtype)
    return jnp.concatenate([m[:, j:], pad], axis=1)


def _shift_right(m: jnp.ndarray, j: int, fill=False) -> jnp.ndarray:
    """m[:, i-j] with `fill` before the start (axis 1)."""
    if j == 0:
        return m
    pad = jnp.full(m.shape[:1] + (j,), fill, m.dtype)
    return jnp.concatenate([pad, m[:, :-j]], axis=1)


def _literal_hist(x: jnp.ndarray) -> jnp.ndarray:
    """[R, L] u8 -> [R, 256] i32 byte-value histogram (bin 0 = all zero
    bytes; the caller overwrites it with the single-zero count).

    One-hot nibble pair contraction on the MXU: hist[hi, lo] =
    sum_l [x>>4 == hi][x&15 == lo] -- 16x16 int8 matmuls instead of a
    scatter-add (~60 ns/elem on TPU, docs/ARCHITECTURE.md).
    """
    hi = (x >> 4).astype(jnp.int32)
    lo = (x & 15).astype(jnp.int32)
    iota = jnp.arange(16, dtype=jnp.int32)
    oh_hi = (hi[..., None] == iota).astype(jnp.int8)        # [R, L, 16]
    oh_lo = (lo[..., None] == iota).astype(jnp.int8)
    pair = jax.lax.dot_general(
        oh_hi, oh_lo,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                   # [R, 16, 16]
    return pair.reshape(x.shape[0], 256)


def block_histograms(blocks: jnp.ndarray) -> jnp.ndarray:
    """Exact per-block token histograms: [R, L] uint8 -> [R, 261] int32.

    Row r's histogram drives native.compress_assisted for that block (or,
    summed over a frame's rows, the frame's shared tree).  L must be a
    multiple of 8 (the FRES block size cols*c*64 always is).
    """
    r, l = blocks.shape
    if l % 8 != 0 or l < 8:
        raise ValueError(f"block size {l} must be a positive multiple of 8")
    x = blocks
    z = (x == 0)

    lit = _literal_hist(x)

    # ---- short runs.  The RLE bins only need run-length >= k masks at
    # k in {2, 3, 7, 23} (bin(a..b) = count(>=a) - count(>=b+1)), built by
    # log-doubling in ~9 boolean shift-AND passes instead of a 23-term
    # sliding chain with an int8 length accumulator (those 40+ full-size
    # passes dominated the fused encode program's device time).
    start = z & ~jnp.concatenate(
        [jnp.zeros((r, 1), bool), z[:, :-1]], axis=1)
    a2 = z & _shift_left(z, 1)            # >= 2 zeros from here
    a3 = a2 & _shift_left(z, 2)
    a4 = a2 & _shift_left(a2, 2)
    a7 = a4 & _shift_left(a3, 4)
    a8 = a4 & _shift_left(a4, 4)
    a16 = a8 & _shift_left(a8, 8)
    a23 = a16 & _shift_left(a7, 16)

    def cnt_ge(mask):
        # bool & bool -> i32 reduce fuses without materializing int32.
        return (start & mask).astype(jnp.int32).sum(axis=1)

    c1 = start.astype(jnp.int32).sum(axis=1)
    c2, c3, c7, c23 = cnt_ge(a2), cnt_ge(a3), cnt_ge(a7), cnt_ge(a23)
    h0_short = c1 - c2                    # exact length 1
    h256 = c2 - c3                        # exact length 2
    h257 = c3 - c7                        # 3..6
    h258 = c7 - c23                       # 7..22 (>= 23: word level below)

    # ---- long runs (>= 23): word-level enumeration.  Everything at word
    # granularity derives from the byte-level >=k masks via stride-8
    # slices -- no ops on a [r, lw, 8] minor-8 layout (the cumprod-based
    # lead/trail counts there dominated this section's device time).
    lw = l // 8
    a5 = a4 & _shift_left(z, 4)
    a6 = a4 & _shift_left(a2, 4)
    # s8[i] = min(zeros starting at i, 8); t8[i] = min(zeros ending at i, 8).
    zge = (z, a2, a3, a4, a5, a6, a7, a8)
    s8 = sum(m.astype(jnp.int8) for m in zge)
    t8 = sum(_shift_right(m, k).astype(jnp.int8) for k, m in enumerate(zge))
    w_zero = a8.reshape(r, lw, 8)[:, :, 0]                   # all-zero words
    # lead/trail zero-byte counts per word (<= 7 where the word has a
    # nonzero byte, which is the only place they are read).
    lead = s8.reshape(r, lw, 8)[:, :, 0]
    trail = t8.reshape(r, lw, 8)[:, :, 7]

    seg_start = w_zero & ~jnp.concatenate(
        [jnp.zeros((r, 1), bool), w_zero[:, :-1]], axis=1)
    iota_w = jnp.arange(lw, dtype=jnp.int32)
    # Index-tagged backward fill, one reversed cummin: the tag packs the
    # word index above its lead count (lead <= 7 fits 4 bits), so the
    # minimum simultaneously yields the first non-all-zero word index at
    # >= w (rtag >> 4) and that word's lead count (rtag & 15).
    big = lw * 16 + 15
    tag = jnp.where(~w_zero, iota_w * 16 + lead.astype(jnp.int32), big)
    rtag = jax.lax.cummin(tag[:, ::-1], axis=1)[:, ::-1]
    swl = (rtag >> 4) - iota_w                               # seg word count
    nxt_lead = jnp.where(rtag < big, rtag & 15, 0)
    trail_prev = jnp.concatenate(
        [jnp.zeros((r, 1), jnp.int32), trail.astype(jnp.int32)[:, :-1]],
        axis=1)

    byte_len = trail_prev + 8 * swl + nxt_lead
    valid = seg_start & (byte_len >= 23)
    n_full = jnp.where(valid, byte_len // _KMAX_RUN, 0)
    rem = jnp.where(valid, byte_len % _KMAX_RUN, 0)

    v = valid.astype(jnp.int32)
    h260 = (n_full + v * (rem >= 279)).sum(axis=1)
    h259 = (v * ((rem >= 23) & (rem <= 278))).sum(axis=1)
    h258 = h258 + (v * ((rem >= 7) & (rem <= 22))).sum(axis=1)
    h257 = h257 + (v * ((rem >= 3) & (rem <= 6))).sum(axis=1)
    h256 = h256 + (v * (rem == 2)).sum(axis=1)
    h0 = h0_short + (v * (rem == 1)).sum(axis=1)

    runs = jnp.stack([h256, h257, h258, h259, h260], axis=1)
    return jnp.concatenate([h0[:, None], lit[:, 1:], runs], axis=1)


block_histograms_jit = jax.jit(block_histograms)


def frame_literal_hists(fres_flat: jnp.ndarray,
                        seg: int = 7680) -> jnp.ndarray:
    """Per-frame literal byte histograms: [B, N] uint8 -> [B, 256] i32
    (bin 0 = zero-byte count, discarded by callers).

    The nibble-pair one-hot MXU contraction of _literal_hist over
    segments of `seg` bytes, summed per frame.  Segmenting only shapes
    the batched matmul (any seg that divides into 8-byte words is
    exact); v5e probes on the 16x1080p batch: seg=7680 +6.6 ms,
    seg=61440 +9.1, seg=1044480 +12.6 over the histogram-less encode
    program -- shorter K / more batch spreads the tiny [16, L] x
    [L, 16] products across MXUs.  Formulations that pack positions
    into wider operand tiles made XLA materialize the one-hot at full
    size (a 51 GB s32 allocation), so the plain batched form stays.
    """
    b, n = fres_flat.shape
    while n % seg:                       # any remainder: fall back to
        seg //= 2                        # a divisor (still word-aligned)
        if seg < 8:
            seg = n
    return _literal_hist(fres_flat.reshape(-1, seg)).reshape(
        b, -1, 256).sum(axis=1)


def assemble_hists(run_bins: jnp.ndarray, lit: jnp.ndarray) -> jnp.ndarray:
    """Per-frame [*, 6] kernel run bins (h0, h256..h260; summed over a
    rows axis if 3-D) + [B, 256] literal histograms -> [B, 261] token
    histograms (the frame_histograms contract)."""
    rb = run_bins.sum(axis=1) if run_bins.ndim == 3 else run_bins
    return jnp.concatenate([rb[:, :1], lit[:, 1:], rb[:, 1:6]], axis=1)


def frame_histograms(fres: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """[..., bytes] uint8 FRES planes -> per-frame [B, 261] histograms.

    fres is any shape whose leading axis is the frame axis and whose
    per-frame bytes divide into `block_size` substreams (the wire layout
    [rows, C, 64, cols] does, row = substream).  The [B, 261] result is
    what `native.compress_assisted` needs -- 1 KB per frame to transfer.
    """
    b = fres.shape[0]
    blocks = fres.reshape(-1, block_size)
    hists = block_histograms(blocks)
    return hists.reshape(b, -1, 261).sum(axis=1)
