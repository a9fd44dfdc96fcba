"""Experimental on-device entropy decode: lockstep multi-substream LUT scan.

The north star asked whether the Huffman *decode* can live on the TPU.
This module is the runnable answer: a vectorized version of the
reference's 8-bit-peek LUT loop (huffman_dec.cpp:178-200 fill,
:291-358 loop), with one SIMD lane per block-row substream (the format's
unit of decode parallelism) stepping in lockstep:

    per lax.while_loop step, per lane:
      gather a 32-bit window at the lane's bit cursor ->
      16-bit peek -> 65536-entry (symbol, code length) LUT gather ->
      literal: scatter the byte at the lane's output cursor
      zero-run: read extra bits, advance the cursor (output pre-zeroed)

Correctness bounds: handles code lengths <= 16 bits (the LUT's reach).
Trees with longer codes -- possible for 261 symbols on adversarial
statistics, never seen on real content -- are detected at LUT build time
and `decode_device` raises, so callers fall back to the host codec.

Status: EXPERIMENTAL.  Every step costs two data-dependent gathers and a
scatter per lane plus the while-step overhead (~130-160 us on v5e,
tools/microbench scan receipts), and the lockstep walk runs as long as
the *worst* lane's token count.  Measured numbers live in
docs/ARCHITECTURE.md; the production decode stays on the host
(native/src/entropy.cpp) because one host core beats this by a wide
margin.  It exists to close the north-star question with an artifact and
as the starting point if Mosaic ever gains per-lane VMEM random access.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .huffman import parse_tree

# Zero-run symbol parameters (huffman_common.h:19-28).
_RUN_BASE = np.array([2, 3, 7, 23, 279], dtype=np.int32)
_RUN_EBITS = np.array([0, 2, 4, 8, 14], dtype=np.int32)


def build_lut16(codes: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """65536-entry peek LUT: entry = symbol | (code_bits << 9).

    Every 16-bit pattern whose low bits spell a whole code decodes in one
    lookup (all upper-bit permutations filled, like the reference's 8-bit
    LUT).  Raises ValueError when any code exceeds 16 bits.
    """
    if int(bits.max()) > 16:
        raise ValueError("code length exceeds the 16-bit LUT reach")
    lut = np.zeros(1 << 16, dtype=np.int32)
    for s in range(len(bits)):
        b = int(bits[s])
        if b == 0:
            continue
        code = int(codes[s])
        step = 1 << b
        fill = s | (b << 9)
        lut[code::step] = fill
    return lut


def decode_device(data: bytes, out_size: int, block_size: int) -> np.ndarray:
    """Reference-parity Huffman decode with the expansion loop on device.

    Output-equal to entropy.bitpack.decompress on *valid* block-mode
    streams.  The host parses the tree and the substream directory (a few
    hundred bytes); the device expands all substreams in lockstep.

    Unlike the host decoders this experimental path does NOT validate the
    payload: a corrupt/truncated substream parks its lane and the rest of
    that block stays zero instead of raising (lockstep lanes have no
    cheap error channel).  Container/tree/directory corruption still
    raises ValueError on the host side.
    """
    parsed = parse_tree(data)
    if parsed is None:
        raise ValueError("bad Huffman tree")
    codes, bits, tree_bit_len = parsed
    lut = build_lut16(codes, bits)
    pos_byte = (tree_bit_len + 7) // 8

    bs = block_size if block_size > 0 else out_size
    n_blocks = out_size // bs
    if n_blocks * bs != out_size:
        raise ValueError("output size not a multiple of block size")

    # Substream directory (huffman_dec.cpp:234-248) -> per-lane spans.
    spans = []
    cursor = pos_byte
    if bs < out_size:
        for _ in range(n_blocks):
            ps = int.from_bytes(data[cursor:cursor + 2], "little")
            cursor += 2
            if ps & 0x8000:
                ps = (ps & 0x7FFF) | (
                    int.from_bytes(data[cursor:cursor + 2], "little") << 15)
                cursor += 2
            spans.append((cursor, ps))
            cursor += ps
    else:
        spans.append((cursor, len(data) - cursor))

    max_ps = max(ps for _, ps in spans)
    lanes = len(spans)
    streams = np.zeros((lanes, max_ps + 8), dtype=np.uint8)  # +slack window
    for i, (off, ps) in enumerate(spans):
        streams[i, :ps] = np.frombuffer(data, np.uint8, ps, off)

    out = _decode_lanes(jnp.asarray(streams), jnp.asarray(lut), bs)
    return np.asarray(out).reshape(-1)[:out_size]


def _window32(streams, byte_idx):
    """Per-lane little-endian 32-bit window at byte_idx (4 byte gathers)."""
    lane = jnp.arange(streams.shape[0])
    w = jnp.zeros(streams.shape[0], jnp.uint32)
    for k in range(4):
        b = streams[lane, byte_idx + k].astype(jnp.uint32)
        w = w | (b << (8 * k))
    return w


@partial(jax.jit, static_argnames=("block_size",))
def _decode_lanes(streams: jnp.ndarray, lut: jnp.ndarray, block_size: int):
    """Lockstep expansion of [lanes, max_bytes] substreams."""
    lanes = streams.shape[0]
    lane_ids = jnp.arange(lanes)
    run_base = jnp.asarray(_RUN_BASE)
    run_ebits = jnp.asarray(_RUN_EBITS)

    def cond(state):
        _, _, out_pos, _ = state
        return jnp.any(out_pos < block_size)

    def step(state):
        out, bit_pos, out_pos, lut_ = state
        active = out_pos < block_size
        byte_idx = bit_pos >> 3
        sub = bit_pos & 7
        w = _window32(streams, byte_idx) >> sub          # >=25 valid bits
        peek = (w & 0xFFFF).astype(jnp.int32)
        e = lut_[peek]                                    # gather
        sym = e & 0x1FF
        nbits = e >> 9
        # Complete prefix codes fill every 16-bit pattern, so nbits == 0
        # only on corrupt input -- finish those lanes instead of spinning.
        corrupt = active & (nbits == 0)
        is_run = sym > 255
        cls = jnp.clip(sym - 256, 0, 4)
        ebits = jnp.where(is_run, run_ebits[cls], 0)
        # Code (<=16) + extras (<=14) fit a 32-bit window at bit_pos:
        # low 16 bits from w, high 16 from a window 2 bytes further.
        w2 = _window32(streams, byte_idx + 2) >> sub
        full = (w & 0xFFFF) | (w2 << 16)
        extra = ((full >> nbits.astype(jnp.uint32)).astype(jnp.int32)
                 & ((1 << ebits) - 1))
        run = jnp.where(is_run, run_base[cls] + extra, 1)

        # Literals scatter one byte; zero positions are pre-zeroed.
        write = active & ~is_run
        tgt = jnp.where(write, out_pos, block_size)       # drop when off
        out = out.at[lane_ids, tgt].set(
            jnp.where(write, sym, 0).astype(jnp.uint8), mode="drop")
        bit_pos = jnp.where(active, bit_pos + nbits + ebits, bit_pos)
        out_pos = jnp.where(active, out_pos + run, out_pos)
        out_pos = jnp.where(corrupt, block_size, out_pos)
        return out, bit_pos, out_pos, lut_

    out0 = jnp.zeros((lanes, block_size + 1), jnp.uint8)
    state = (out0, jnp.zeros(lanes, jnp.int32), jnp.zeros(lanes, jnp.int32),
             lut)
    out, _, out_pos, _ = jax.lax.while_loop(cond, step, state)
    return out[:, :block_size]
