"""Experimental on-device entropy encode: segmented-scan bitstream packing.

This module implements the HIMG entropy *encode* stage as pure XLA data
parallelism over [rows, block_size] coefficient planes:

    zero-run segmentation (cumulative extrema)  ->  per-position tokens
    -> 261-bin histogram  -> (host: exact Huffman tree)  ->
    code assignment  ->  exclusive bit-offset prefix sum  ->
    carry-free scatter-add of 32-bit word fragments.

It produces byte-for-byte the same per-row payloads as the reference
serial bit writer (tokens' bit ranges are disjoint, so scatter-add equals
OR equals the sequential write), and `compress_device` wraps it into a
full reference-identical stream.

Status: EXPERIMENTAL, correct but not the default.  Measured on v5e
(round 1): TPU scatter-adds cost ~60 ns/element and histogram reductions
hundreds of ms, so this path runs at a few MPix/s -- slower than one host
core running entropy/native.  It exists to (a) document the TPU-native
formulation the format's per-row substreams allow, and (b) serve as the
starting point if a future Mosaic gains efficient per-lane VMEM
scatter/gather.  See docs/ARCHITECTURE.md for the measurements.

All arithmetic is int32 (jax default; offsets per row stay < 2^31); the
up-to-46-bit token codewords are carried as two 23-bit halves so no
int64 is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .huffman import MAX_ZERO_RUN, build_code


def _tokenize(rows_u8: jnp.ndarray):
    """Per-position token fields for [R, L] planes.

    Returns (sym int32[R, L], extra int32, ebits int32, is_token bool):
    non-token positions (swallowed by a zero run) have is_token False.
    Mirrors entropy.rle.tokenize_rows without compaction.
    """
    x = rows_u8.astype(jnp.int32)
    r, l = x.shape
    idx = jnp.broadcast_to(jnp.arange(l, dtype=jnp.int32), (r, l))

    z = x == 0
    run_start = z & jnp.concatenate(
        [jnp.ones((r, 1), bool), ~z[:, :-1]], axis=1)
    start_idx = jax.lax.cummax(jnp.where(run_start, idx, -1), axis=1)
    pos_in_run = idx - start_idx
    chunk_start = z & (pos_in_run % MAX_ZERO_RUN == 0)
    nz_idx = jnp.where(~z, idx, l)
    next_nz = jax.lax.cummin(nz_idx[:, ::-1], axis=1)[:, ::-1]

    is_token = ~z | chunk_start
    runlen = jnp.clip(next_nz - idx, 1, MAX_ZERO_RUN)

    # Zero-run symbol classes (huffman_common.h:19-28).
    rsym = jnp.where(runlen == 1, 0,
           jnp.where(runlen == 2, 256,
           jnp.where(runlen <= 6, 257,
           jnp.where(runlen <= 22, 258,
           jnp.where(runlen <= 278, 259, 260)))))
    rebits = jnp.where(runlen <= 2, 0,
             jnp.where(runlen <= 6, 2,
             jnp.where(runlen <= 22, 4,
             jnp.where(runlen <= 278, 8, 14))))
    rbase = jnp.where(runlen <= 2, 0,
            jnp.where(runlen <= 6, 3,
            jnp.where(runlen <= 22, 7,
            jnp.where(runlen <= 278, 23, 279))))
    rextra = jnp.maximum(runlen - rbase, 0) * (rebits > 0)

    sym = jnp.where(z, rsym, x)
    extra = jnp.where(z, rextra, 0)
    ebits = jnp.where(z, rebits, 0)
    return sym, extra, ebits, is_token


def _histogram(sym: jnp.ndarray, is_token: jnp.ndarray) -> jnp.ndarray:
    """261-bin histogram over token positions (scatter-add)."""
    flat = jnp.where(is_token, sym, 261).reshape(-1)
    return jnp.zeros(262, jnp.int32).at[flat].add(1)[:261]


def pack_rows_device(rows_u8: jnp.ndarray, codes: jnp.ndarray,
                     bits: jnp.ndarray):
    """Pack [R, L] planes into per-row bit payloads on device.

    codes/bits: int32[261] from the (host-built) Huffman code.
    Returns (words int32[R, W], total_bits int32[R]) where row r's payload
    is words[r] reinterpreted little-endian, ceil(total_bits/8) bytes.
    """
    sym, extra, ebits, is_token = _tokenize(rows_u8)
    code = codes[sym]
    nb = bits[sym]
    nbits = jnp.where(is_token, nb + ebits, 0)

    ends = jnp.cumsum(nbits, axis=1)
    offsets = ends - nbits
    total_bits = ends[:, -1]

    # Token value = code | extra << nb, carried as two 23-bit halves
    # (value fits 32 code + 14 extra = 46 bits).
    def half(shift):
        # bits [shift, shift+23) of the value
        lo = jnp.where(nb > shift,
                       (code >> shift) & 0x7FFFFF, 0)
        # extra starts at bit nb; both shift directions clamped into [0,31]
        # (XLA shifts >= bit width are undefined and both `where` branches
        # are evaluated).
        epos = shift - nb
        e = jnp.where(epos >= 0,
                      extra >> jnp.clip(epos, 0, 31),
                      extra << jnp.clip(-epos, 0, 31))
        e = jnp.where(epos > -23, e & 0x7FFFFF, 0)
        return (lo | e) & 0x7FFFFF

    a = half(0)              # value bits [0, 23)
    b = half(23)             # value bits [23, 46)

    r, l = rows_u8.shape
    max_words = (l * 46 + 31) // 32 + 2
    w0 = offsets >> 5
    s = offsets & 31

    def frag(k):
        """Bits of (value << s) landing in word w0+k (carry-free)."""
        base = 32 * k - s     # value bit feeding bit 0 of that word
        def shifted(v, vpos):
            # v holds value bits [vpos, vpos+23); align to word bit 0
            rel = base - vpos
            left = jnp.where((rel < 0) & (rel > -32),
                             v << jnp.clip(-rel, 0, 31), 0)
            right = jnp.where((rel >= 0) & (rel < 23),
                              v >> jnp.clip(rel, 0, 31), 0)
            return jnp.where(rel < 0, left, right)
        return shifted(a, 0) | shifted(b, 23)

    words = jnp.zeros((r, max_words), jnp.int32)
    rows_idx = jnp.broadcast_to(
        jnp.arange(r, dtype=jnp.int32)[:, None], (r, l))
    valid = is_token & (nbits > 0)
    for k in range(3):
        contrib = jnp.where(valid, frag(k), 0)
        target = jnp.where(valid, w0 + k, max_words - 1)
        words = words.at[rows_idx, target].add(
            jnp.where(valid, contrib, 0))
    return words, total_bits


def compress_device(planes: jnp.ndarray, block_size: int) -> bytes:
    """Reference-identical Huffman compression with device-side packing.

    planes: uint8 device array, size divisible by block_size.  The
    histogram and packing run on device; the tiny tree build and final
    stream assembly (length prefixes + stale-bit replay) on host.
    """
    import jax

    data = planes.reshape(-1, block_size)
    sym, _, _, is_token = _tokenize(data)
    hist = np.asarray(_histogram(sym, is_token)).astype(np.int64)
    code = build_code(hist)

    words, total_bits = jax.jit(pack_rows_device)(
        data, jnp.asarray(code.codes.astype(np.int32)),
        jnp.asarray(code.bits.astype(np.int32)))
    payload_bytes = np.asarray(words).astype("<i4").view(np.uint8)
    total_bits = np.asarray(total_bits).astype(np.int64)
    sizes = (total_bits + 7) // 8

    from .bitpack import assemble_stream
    n = data.shape[0]
    use_blocks = block_size < data.size
    return assemble_stream(code, payload_bytes.reshape(n, -1), sizes,
                           total_bits.astype(np.uint64), use_blocks)

