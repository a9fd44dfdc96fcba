"""Vectorized zero-run tokenization.

The reference scans each block byte-serially for zero runs
(huffman_enc.cpp:98-144 for the histogram, :301-332 for emission).  Runs
never cross block boundaries and are capped at 16662 zeros; longer runs are
split greedily (a maximal 16662-chunk, then the scan restarts).

Here tokenization is a data-parallel computation over an entire [rows,
block_size] batch at once: run membership via a segmented cumulative max,
split points via position-in-run modulo, run lengths via a next-nonzero
scan.  Output is a flat token stream per row plus a 261-bin histogram --
identical tokens, in order, to the reference's serial scan.
"""

from __future__ import annotations

import numpy as np

from .huffman import MAX_ZERO_RUN, NUM_SYMBOLS, zero_run_symbol_and_extras


def tokenize_rows(rows: np.ndarray):
    """Tokenize a [num_rows, block_size] uint8 batch.

    Returns (token_sym int32[num_rows, max_tokens],
             token_extra int64[...], token_ebits int32[...],
             token_count int32[num_rows]) where unused slots hold sym=-1.

    Token order within each row matches the reference's serial scan: a
    literal byte produces its own token; a maximal zero run (capped at
    16662) produces one run token.
    """
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    n_rows, block = rows.shape
    idx = np.broadcast_to(np.arange(block, dtype=np.int64), rows.shape)

    z = rows == 0
    # Start of each zero run (first zero of a maximal run).
    run_start = z.copy()
    run_start[:, 1:] &= ~z[:, :-1]
    # Most recent run-start index at each position (-1 where none yet).
    start_idx = np.maximum.accumulate(np.where(run_start, idx, -1), axis=1)
    pos_in_run = idx - start_idx
    # Greedy 16662-splitting: a new token starts every MAX_ZERO_RUN zeros.
    chunk_start = z & (pos_in_run % MAX_ZERO_RUN == 0)
    # Next non-zero index at or after each position (block if none).
    nz_idx = np.where(~z, idx, block)
    next_nz = np.minimum.accumulate(nz_idx[:, ::-1], axis=1)[:, ::-1]

    # Token positions: literals and chunk starts.
    is_token = ~z | chunk_start
    token_count = is_token.sum(axis=1).astype(np.int32)
    max_tokens = int(token_count.max()) if n_rows else 0

    # Gather per-row token data into a dense [n_rows, max_tokens] layout.
    order = np.argsort(~is_token, axis=1, kind="stable")[:, :max_tokens]
    token_pos = np.take_along_axis(idx, order, axis=1)
    token_valid = np.arange(max_tokens, dtype=np.int32)[None, :] < token_count[:, None]

    vals = np.take_along_axis(rows, order, axis=1).astype(np.int32)
    runlen = np.minimum(
        np.take_along_axis(next_nz, order, axis=1) - token_pos, MAX_ZERO_RUN)

    rsym, rextra, rebits = zero_run_symbol_and_extras(np.maximum(runlen, 1))
    is_zero_tok = vals == 0
    sym = np.where(is_zero_tok, rsym, vals).astype(np.int32)
    extra = np.where(is_zero_tok, rextra, 0)
    ebits = np.where(is_zero_tok, rebits, 0).astype(np.int32)
    sym[~token_valid] = -1
    extra[~token_valid] = 0
    ebits[~token_valid] = 0
    return sym, extra, ebits, token_count


def histogram_from_tokens(sym: np.ndarray) -> np.ndarray:
    """261-bin histogram over valid (>= 0) token symbols."""
    flat = sym[sym >= 0]
    return np.bincount(flat, minlength=NUM_SYMBOLS).astype(np.int64)
