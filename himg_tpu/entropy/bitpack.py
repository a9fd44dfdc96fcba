"""Parallel bit packing and stream assembly for the Huffman stage.

Encoding a block's token stream is embarrassingly parallel once each token's
(code bits, length) is known: an exclusive prefix sum of the lengths gives
every token its bit offset, and because the bit ranges are disjoint a
scatter-add over byte lanes reproduces the serial LSB-first bit writer
(huffman_enc.cpp:31-50) exactly.

Stream layout (huffman_enc.cpp:246-363):
    [tree prefix-walk bits][pad to byte]
    then per block (when block mode is on):
        [u16 length prefix (15-bit + continuation; 4 bytes if >= 0x8000)]
        [block payload bytes]
    or, in single-stream mode, just the payload bytes.

Byte parity quirk: the reference serializes each block into a reused scratch
buffer and copies `packed_size` bytes out, so the *unused high bits of each
block's final byte* leak the previous scratch contents.  `assemble_stream`
replays that reuse (a cheap sequential fix-up touching one byte per block)
so our files are byte-identical, not merely decode-identical.
"""

from __future__ import annotations

import numpy as np

from .huffman import HuffmanCode, NUM_SYMBOLS


def pack_rows(sym, extra, ebits, token_count, code: HuffmanCode):
    """Pack tokenized rows into per-row payload byte arrays.

    sym/extra/ebits: [rows, max_tokens] from rle.tokenize_rows.
    Returns (payload uint8[rows, max_bytes+8], payload_sizes int64[rows])
    where payload_sizes is in bytes (bit count rounded up).
    """
    sym = np.asarray(sym)
    n_rows, _ = sym.shape
    valid = sym >= 0
    safe_sym = np.where(valid, sym, 0)
    code_val = code.codes[safe_sym].astype(np.uint64)
    code_len = code.bits[safe_sym].astype(np.uint64)
    val = code_val | (extra.astype(np.uint64) << code_len)
    nbits = np.where(valid, code_len + ebits.astype(np.uint64), 0)

    ends = np.cumsum(nbits, axis=1, dtype=np.uint64)
    offsets = ends - nbits
    total_bits = ends[:, -1] if ends.shape[1] else np.zeros(n_rows, dtype=np.uint64)
    sizes = ((total_bits + 7) // 8).astype(np.int64)
    max_bytes = int(sizes.max()) if n_rows else 0

    out = np.zeros((n_rows, max_bytes + 8), dtype=np.uint8)
    r, t = np.nonzero(valid)
    if len(r):
        off = offsets[r, t]
        v = val[r, t] << (off & np.uint64(7))
        b0 = (off >> np.uint64(3)).astype(np.int64)
        # Longest token is 32 code + 14 extra + 7 shift = 53 bits -> 7 bytes.
        for lane in range(7):
            np.add.at(out, (r, b0 + lane),
                      ((v >> np.uint64(8 * lane)) & np.uint64(0xFF)).astype(np.uint8))
    return out, sizes, total_bits


def _bits_to_bytes(bit_items) -> tuple[bytearray, int]:
    """Serialize [(value, nbits), ...] LSB-first; returns (bytes, total_bits)."""
    total = sum(n for _, n in bit_items)
    out = bytearray((total + 7) // 8)
    pos = 0
    for value, n in bit_items:
        for i in range(n):
            if (value >> i) & 1:
                out[(pos + i) >> 3] |= 1 << ((pos + i) & 7)
        pos += n
    return out, total


def assemble_stream(code: HuffmanCode, payloads: np.ndarray, sizes: np.ndarray,
                    total_bits: np.ndarray, use_blocks: bool) -> bytes:
    """Assemble the final Huffman stream from per-block payloads.

    Replays the reference's scratch-buffer reuse so unused trailing bits of
    each block's final byte match byte-for-byte (see module docstring).
    """
    tree_bytes, _ = _bits_to_bytes(code.tree_bits)
    out = bytearray(tree_bytes)

    n_blocks = len(sizes)
    # Scratch-buffer simulation: only final-byte high bits can leak, so we
    # track the byte the *next* block's final byte would land on.
    max_ps = int(sizes.max()) if n_blocks else 0
    scratch = np.zeros(max_ps + 1, dtype=np.uint8)
    for b in range(n_blocks):
        ps = int(sizes[b])
        tb = int(total_bits[b])
        payload = payloads[b, :ps].copy()
        rem = tb & 7
        if ps > 0 and rem:
            # Merge stale high bits of the final byte from the scratch state.
            mask = (1 << rem) - 1
            payload[ps - 1] = (int(payload[ps - 1]) & mask) | \
                (int(scratch[ps - 1]) & (~mask & 0xFF))
        # Bytes [0, ps) of the scratch now hold this block's merged bytes.
        scratch[:ps] = payload
        if use_blocks:
            if ps <= 0x7FFF:
                out += ps.to_bytes(2, "little")
            else:
                out += ((ps & 0x7FFF) | 0x8000).to_bytes(2, "little")
                out += (ps >> 15).to_bytes(2, "little")
        out += payload.tobytes()
    return bytes(out)


def assemble_parts(code: HuffmanCode, parts, use_blocks: bool) -> bytes:
    """Assemble a Huffman stream from independently packed shard parts.

    parts: iterable of (payload uint8[total], sizes int64[n], bits int64[n])
    -- per-shard back-to-back block payloads as produced by
    native.pack_with_code / pack_with_code_py.  This is the directory-
    concatenation step of the sharded protocol (SURVEY.md section 5): the
    only sequential work is the length prefixes and the reference's
    stale-bit replay, both O(bytes) on the assembling host.
    """
    tree_bytes, _ = _bits_to_bytes(code.tree_bits)
    out = bytearray(tree_bytes)
    max_ps = max((int(s.max()) for _, s, _ in parts if len(s)), default=0)
    scratch = np.zeros(max_ps + 1, dtype=np.uint8)
    for payload_flat, sizes, bits in parts:
        pos = 0
        for b in range(len(sizes)):
            ps = int(sizes[b])
            rem = int(bits[b]) & 7
            payload = payload_flat[pos:pos + ps].copy()
            pos += ps
            if ps > 0 and rem:
                mask = (1 << rem) - 1
                payload[ps - 1] = (int(payload[ps - 1]) & mask) | \
                    (int(scratch[ps - 1]) & (~mask & 0xFF))
            scratch[:ps] = payload
            if use_blocks:
                if ps <= 0x7FFF:
                    out += ps.to_bytes(2, "little")
                else:
                    out += ((ps & 0x7FFF) | 0x8000).to_bytes(2, "little")
                    out += (ps >> 15).to_bytes(2, "little")
            out += payload.tobytes()
    return bytes(out)


def histogram_py(data: np.ndarray, block_size: int) -> np.ndarray:
    """261-bin token histogram (NumPy spec of native.histogram)."""
    from . import rle
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    if data.size == 0:
        return np.zeros(NUM_SYMBOLS, dtype=np.int64)
    bs = block_size if block_size > 0 else data.size
    sym, _, _, _ = rle.tokenize_rows(data.reshape(-1, bs))
    return rle.histogram_from_tokens(sym)


def pack_with_code_py(data: np.ndarray, block_size: int, code: HuffmanCode):
    """NumPy spec of native.pack_with_code: (payload, sizes, bits)."""
    from . import rle
    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    bs = block_size if block_size > 0 else data.size
    sym, extra, ebits, counts = rle.tokenize_rows(data.reshape(-1, bs))
    payloads, sizes, total_bits = pack_rows(sym, extra, ebits, counts, code)
    flat = np.concatenate([payloads[b, :int(sizes[b])]
                           for b in range(len(sizes))]) \
        if len(sizes) else np.zeros(0, np.uint8)
    return flat, sizes, total_bits.astype(np.int64)


def compress(data: np.ndarray, block_size: int, view: bool = False):
    """Full reference-parity Huffman compression of a byte buffer.

    Dispatches to the native C++ backend when available (byte-identical);
    the NumPy implementation below is the readable spec + fallback.
    `block_size=0` means one single stream.  view=True may return a
    zero-copy memoryview (native path) for immediate-join callers.
    """
    from . import native
    if native.available():
        return native.compress(data, block_size, view=view)
    return compress_py(data, block_size)


def compress_assisted(data: np.ndarray, block_size: int,
                      hist: np.ndarray, view: bool = False):
    """Compression with a precomputed (device-side) token histogram.

    `hist` is the exact 261-bin token histogram of `data` (from
    entropy/device_hist.py); the native backend then runs one fused SIMD
    scan+pack pass instead of tokenize + pack (~40% less host time per
    1080p frame, `microbench entropy`).  Output is byte-identical to
    compress().  Falls back to compress() without the native backend.
    """
    from . import native
    if native.available():
        return native.compress_assisted(data, block_size, hist, view=view)
    return compress_py(data, block_size)


def compress_py(data: np.ndarray, block_size: int) -> bytes:
    """NumPy reference implementation of compress
    (HuffmanEnc::Compress, huffman_enc.cpp:246-363)."""
    from . import rle
    from .huffman import build_code

    data = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    in_size = data.size
    if in_size < 1:
        return b""
    if block_size < 1:
        block_size = in_size
    use_blocks = block_size < in_size
    if in_size % block_size != 0:
        raise ValueError("input size must be a multiple of block size")

    rows = data.reshape(-1, block_size)
    sym, extra, ebits, counts = rle.tokenize_rows(rows)
    hist = rle.histogram_from_tokens(sym)
    code = build_code(hist)
    payloads, sizes, total_bits = pack_rows(sym, extra, ebits, counts, code)
    return assemble_stream(code, payloads, sizes, total_bits, use_blocks)


# --------------------------------------------------------------------------
# Decoding (host fallback; the fast paths live in entropy.native / ops).
# --------------------------------------------------------------------------

class _BitReader:
    __slots__ = ("data", "pos", "end", "failed")

    def __init__(self, data, start_byte=0, size=None):
        self.data = data
        self.pos = start_byte * 8
        self.end = (start_byte + (size if size is not None else len(data) - start_byte)) * 8
        self.failed = False

    def read_bits(self, n):
        p = self.pos
        if p + n > self.end:
            self.failed = True
            return 0
        v = 0
        d = self.data
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v


def _build_decode_table(codes: np.ndarray, bits: np.ndarray):
    """canonical (code, len) -> symbol dict for the slow host decoder."""
    table = {}
    for s in range(NUM_SYMBOLS):
        if bits[s] > 0:
            table[(int(codes[s]), int(bits[s]))] = s
    return table


def decompress(data: bytes, out_size: int, block_size: int,
               max_threads: int = 0) -> np.ndarray:
    """Reference-parity Huffman decompression.

    Dispatches to the native threaded C++ backend when available; the
    Python implementation below is the readable spec + fallback.
    max_threads caps decode workers (0 = hardware concurrency).  Raises
    ValueError on corrupt input.
    """
    from . import native
    if native.available():
        return native.decompress(data, out_size, block_size, max_threads)
    return decompress_py(data, out_size, block_size)


def decompress_py(data: bytes, out_size: int, block_size: int) -> np.ndarray:
    """Python reference implementation of decompress (HuffmanDec Init +
    Uncompress/UncompressBlock, huffman_dec.cpp:221-418)."""
    from .huffman import parse_tree, SYM_TWO_ZEROS, SYM_UPTO6_ZEROS, \
        SYM_UPTO22_ZEROS, SYM_UPTO278_ZEROS, SYM_UPTO16662_ZEROS

    if out_size == 0:
        return np.zeros(0, dtype=np.uint8)
    parsed = parse_tree(data)
    if parsed is None:
        raise ValueError("bad Huffman tree")
    codes, bits, tree_bit_len = parsed
    pos_byte = (tree_bit_len + 7) // 8

    bs = block_size if block_size > 0 else out_size
    use_blocks = bs < out_size

    # Build a bit-serial decode trie as a dict keyed by (code_prefix, depth).
    leaf = _build_decode_table(codes, bits)
    max_len = int(bits.max())

    out = np.zeros(out_size, dtype=np.uint8)
    out_pos = 0

    def decode_substream(reader: _BitReader, n_out: int, base: int):
        nonlocal out
        filled = 0
        while filled < n_out:
            code = 0
            ln = 0
            sym = None
            while ln < max_len:
                code |= reader.read_bits(1) << ln
                ln += 1
                if reader.failed:
                    raise ValueError("truncated Huffman stream")
                sym = leaf.get((code, ln))
                if sym is not None:
                    break
            if sym is None:
                raise ValueError("invalid Huffman code")
            if sym <= 255:
                out[base + filled] = sym
                filled += 1
            else:
                if sym == SYM_TWO_ZEROS:
                    run = 2
                elif sym == SYM_UPTO6_ZEROS:
                    run = reader.read_bits(2) + 3
                elif sym == SYM_UPTO22_ZEROS:
                    run = reader.read_bits(4) + 7
                elif sym == SYM_UPTO278_ZEROS:
                    run = reader.read_bits(8) + 23
                else:
                    run = reader.read_bits(14) + 279
                if reader.failed or filled + run > n_out:
                    raise ValueError("zero run overruns output")
                filled += run

    if not use_blocks:
        reader = _BitReader(data, pos_byte)
        decode_substream(reader, out_size, 0)
        return out

    # Walk the substream directory (huffman_dec.cpp:234-248).
    n_blocks = out_size // bs
    cursor = pos_byte
    for b in range(n_blocks):
        if cursor + 2 > len(data):
            raise ValueError("missing substream length")
        ps = int.from_bytes(data[cursor:cursor + 2], "little")
        cursor += 2
        if ps & 0x8000:
            ps = (ps & 0x7FFF) | (int.from_bytes(data[cursor:cursor + 2], "little") << 15)
            cursor += 2
        reader = _BitReader(data, cursor, ps)
        decode_substream(reader, bs, out_pos)
        out_pos += bs
        cursor += ps
    return out
