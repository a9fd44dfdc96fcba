"""Huffman code construction with bit-exact reference parity.

The HIMG entropy stage is a 261-symbol Huffman code (256 literals + 5
zero-run symbols, huffman_common.h:19-28) whose *tree shape* is serialized
into the stream as a prefix walk.  Byte-identical output requires exactly
replicating the reference's greedy tree construction, including its
tie-breaking: the two-lightest scan (huffman_enc.cpp:202-236) prefers
later-scanned nodes on equal counts (`<=`), and parent nodes are appended to
the scan array so they participate in later rounds by index order.

The code here is host-side and tiny (<= 261 leaves); it runs once per
compressed stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

NUM_SYMBOLS = 261
SYMBOL_BITS = 9

# Zero-run RLE symbols (huffman_common.h:23-28): symbol, (lo, hi), extra bits.
SYM_TWO_ZEROS = 256       # run == 2,        0 extra bits
SYM_UPTO6_ZEROS = 257     # run 3..6,        2 extra bits
SYM_UPTO22_ZEROS = 258    # run 7..22,       4 extra bits
SYM_UPTO278_ZEROS = 259   # run 23..278,     8 extra bits
SYM_UPTO16662_ZEROS = 260  # run 279..16662, 14 extra bits
MAX_ZERO_RUN = 16662


@dataclass
class HuffmanCode:
    """Code assignment + serialized tree description."""
    codes: np.ndarray      # uint32[261], LSB-first code bits
    bits: np.ndarray       # int32[261], code length (0 if absent)
    tree_bits: list        # [(value, nbits), ...] prefix-walk description

    def tree_num_bits(self) -> int:
        return sum(n for _, n in self.tree_bits)


def build_code(histogram: np.ndarray) -> HuffmanCode:
    """Build the Huffman code for a 261-bin symbol histogram.

    Mirrors MakeTree/StoreTree (huffman_enc.cpp:148-238) including the
    single-symbol special case (code length 1).
    """
    counts = np.asarray(histogram, dtype=np.int64)
    assert counts.shape == (NUM_SYMBOLS,)

    # Leaf nodes in symbol order.  Node record: [count, symbol, child_a, child_b]
    node_count: list[int] = []
    node_symbol: list[int] = []
    node_a: list[int] = []
    node_b: list[int] = []
    for sym in range(NUM_SYMBOLS):
        if counts[sym] > 0:
            node_count.append(int(counts[sym]))
            node_symbol.append(sym)
            node_a.append(-1)
            node_b.append(-1)

    num_leaves = len(node_count)
    root = -1
    nodes_left = num_leaves
    while nodes_left > 1:
        # Scan for the two lightest live nodes; ties prefer the later index
        # (the reference uses `<=` at huffman_enc.cpp:207-212).
        n1 = n2 = -1
        for k in range(len(node_count)):
            c = node_count[k]
            if c > 0:
                if n1 < 0 or c <= node_count[n1]:
                    n2 = n1
                    n1 = k
                elif n2 < 0 or c <= node_count[n2]:
                    n2 = k
        parent = len(node_count)
        node_count.append(node_count[n1] + node_count[n2])
        node_symbol.append(-1)
        node_a.append(n1)
        node_b.append(n2)
        node_count[n1] = 0
        node_count[n2] = 0
        root = parent
        nodes_left -= 1

    codes = np.zeros(NUM_SYMBOLS, dtype=np.uint32)
    bits = np.zeros(NUM_SYMBOLS, dtype=np.int32)
    tree_bits: list = []

    def store(node: int, code: int, depth: int) -> None:
        if node_symbol[node] >= 0:
            tree_bits.append((1, 1))
            tree_bits.append((node_symbol[node], SYMBOL_BITS))
            codes[node_symbol[node]] = code & 0xFFFFFFFF
            bits[node_symbol[node]] = depth
            return
        tree_bits.append((0, 1))
        store(node_a[node], code, depth + 1)
        store(node_b[node], code + (1 << depth), depth + 1)

    if root >= 0:
        store(root, 0, 0)
    elif num_leaves == 1:
        # Single distinct symbol: no binary tree; the symbol is written with
        # a 1-bit code (huffman_enc.cpp:230-236).
        store(0, 0, 1)
        bits[node_symbol[0]] = 1
    return HuffmanCode(codes, bits, tree_bits)


def parse_tree(data: bytes):
    """Recover (codes, bits, symbols-by-code) from a serialized tree.

    Reads the prefix walk written by build_code from `data` (LSB-first bits),
    mirroring RecoverTree (huffman_dec.cpp:152-213).  Returns
    (codes uint32[261], bits int32[261], bit_len) where bit_len is the number
    of tree-description bits consumed, or None on malformed input.
    """
    total_bits = len(data) * 8
    pos = 0
    codes = np.zeros(NUM_SYMBOLS, dtype=np.uint32)
    bits = np.zeros(NUM_SYMBOLS, dtype=np.int32)
    max_nodes = 2 * NUM_SYMBOLS - 1
    nodes_used = 0
    leaves = []

    def read_bits(n: int):
        nonlocal pos
        if pos + n > total_bits:
            return None
        v = 0
        for i in range(n):
            p = pos + i
            v |= ((data[p >> 3] >> (p & 7)) & 1) << i
        pos += n
        return v

    def recover(code: int, depth: int) -> bool:
        nonlocal nodes_used
        nodes_used += 1
        if nodes_used >= max_nodes:
            return False
        leaf = read_bits(1)
        if leaf is None:
            return False
        if leaf:
            sym = read_bits(SYMBOL_BITS)
            if sym is None or sym >= NUM_SYMBOLS:
                return False
            codes[sym] = code & 0xFFFFFFFF
            bits[sym] = depth
            leaves.append(sym)
            return True
        return recover(code, depth + 1) and recover(code + (1 << depth), depth + 1)

    if not recover(0, 0):
        return None
    if len(leaves) == 1:
        # Degenerate single-symbol tree: the encoder emits 1 bit per symbol
        # (huffman_enc.cpp:230-236), so decode with a 1-bit code.
        bits[leaves[0]] = 1
    return codes, bits, pos


def zero_run_symbol_and_extras(run_lengths: np.ndarray):
    """Map zero-run lengths (1..16662) to (symbol, extra_value, extra_bits).

    Vectorized classification mirroring huffman_enc.cpp:301-332.
    """
    r = np.asarray(run_lengths, dtype=np.int64)
    sym = np.empty(r.shape, dtype=np.int32)
    extra = np.zeros(r.shape, dtype=np.int64)
    ebits = np.zeros(r.shape, dtype=np.int32)

    m1 = r == 1
    m2 = r == 2
    m6 = (r >= 3) & (r <= 6)
    m22 = (r >= 7) & (r <= 22)
    m278 = (r >= 23) & (r <= 278)
    m16662 = r >= 279

    sym[m1] = 0
    sym[m2] = SYM_TWO_ZEROS
    sym[m6] = SYM_UPTO6_ZEROS
    sym[m22] = SYM_UPTO22_ZEROS
    sym[m278] = SYM_UPTO278_ZEROS
    sym[m16662] = SYM_UPTO16662_ZEROS
    extra[m6] = r[m6] - 3
    extra[m22] = r[m22] - 7
    extra[m278] = r[m278] - 23
    extra[m16662] = r[m16662] - 279
    ebits[m6] = 2
    ebits[m22] = 4
    ebits[m278] = 8
    ebits[m16662] = 14
    return sym, extra, ebits
