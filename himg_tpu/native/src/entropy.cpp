// himg_tpu native entropy codec: HIMG-format Huffman + zero-RLE.
//
// A from-scratch C++17 implementation of the HIMG entropy stage used as the
// fast host-side backend (the TPU path lives in himg_tpu/entropy's JAX
// code; the Python path in entropy/bitpack.py is the readable spec).
//
// Format contract (reference: src/lib/huffman_enc.cpp / huffman_dec.cpp of
// mbitsnbites/himg):
//   * 261 symbols: 256 literals + 5 zero-run symbols with 0/2/4/8/14 extra
//     bits covering runs 2 / 3-6 / 7-22 / 23-278 / 279-16662.
//   * Tree serialized as a prefix walk: 1 leaf bit (+9-bit symbol at
//     leaves), then byte padding; greedy two-lightest merge where equal
//     counts prefer the latest-scanned node, parents appended to the scan
//     order (huffman_enc.cpp:202-236) -- replicated exactly for byte
//     parity.
//   * LSB-first bit packing; per-block byte-aligned substreams prefixed by
//     a 15-bit length with a 17-bit continuation (huffman_enc.cpp:342-352).
//   * Byte-parity quirk: the reference serializes each block through a
//     reused scratch buffer, so unused high bits of a block's final byte
//     leak bytes of earlier blocks; we reproduce that merge.
//
// Unlike the reference's per-bit loops this implementation uses a 64-bit
// accumulator writer and a 64-bit refill reader, and decodes with a
// 16-bit-peek two-level table (direct entries for codes <= 8 bits, tree
// walk beyond).  Decompression is multithreaded over substreams.

#include <algorithm>
#include <atomic>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Phase timing to stderr when HIMG_ENTROPY_PROFILE is set (receipts for
// the host-entropy numbers in docs/ARCHITECTURE.md).
struct PhaseTimer {
  bool on = std::getenv("HIMG_ENTROPY_PROFILE") != nullptr;
  std::chrono::steady_clock::time_point t = std::chrono::steady_clock::now();
  void lap(const char *name) {
    if (!on) return;
    auto now = std::chrono::steady_clock::now();
    std::fprintf(stderr, "[entropy] %-14s %7.2f ms\n", name,
                 std::chrono::duration<double, std::milli>(now - t).count());
    t = now;
  }
};

constexpr int kNumSymbols = 261;
constexpr int kSymbolBits = 9;
constexpr int kMaxNodes = kNumSymbols * 2 - 1;
constexpr int kMaxRun = 16662;

// Zero-run classes: {first run length, extra bits}.
struct RunClass { int base; int extra_bits; };
constexpr RunClass kRunClasses[5] = {{2, 0}, {3, 2}, {7, 4}, {23, 8}, {279, 14}};

inline int RunSymbol(int zeros, uint32_t *extra, int *extra_bits) {
  if (zeros == 1) { *extra = 0; *extra_bits = 0; return 0; }
  if (zeros == 2) { *extra = 0; *extra_bits = 0; return 256; }
  int cls = zeros <= 6 ? 1 : zeros <= 22 ? 2 : zeros <= 278 ? 3 : 4;
  *extra = static_cast<uint32_t>(zeros - kRunClasses[cls].base);
  *extra_bits = kRunClasses[cls].extra_bits;
  return 256 + cls;
}

// --------------------------------------------------------------------------
// Bit IO
// --------------------------------------------------------------------------

// LSB-first writer with a 64-bit accumulator.  Whole bytes overwrite the
// destination; a trailing partial byte is merged bit-wise so pre-existing
// buffer content survives in the unused high bits (the parity quirk).
class BitWriter {
 public:
  explicit BitWriter(uint8_t *buf) : buf_(buf) {}

  // NOTE: each Put spills one unaligned 8-byte store at the write cursor,
  // so the destination buffer needs 8 bytes of slack past the final byte;
  // payload writers therefore target per-thread scratch, not `out`.
  inline void Put(uint64_t value, int bits) {
    acc_ |= (value & ((1ull << bits) - 1)) << fill_;
    fill_ += bits;
    std::memcpy(buf_ + pos_, &acc_, 8);
    int bytes = fill_ >> 3;
    pos_ += bytes;
    acc_ >>= 8 * bytes;
    fill_ &= 7;
  }

  // Flush a trailing partial byte, merging with existing buffer content.
  void FlushPartial() {
    if (fill_ > 0) {
      uint8_t mask = static_cast<uint8_t>((1u << fill_) - 1);
      buf_[pos_] = static_cast<uint8_t>((buf_[pos_] & ~mask) | (acc_ & mask));
    }
  }

  int64_t bit_count() const { return pos_ * 8 + fill_; }
  int64_t byte_count() const { return pos_ + (fill_ ? 1 : 0); }

 private:
  uint8_t *buf_;
  int64_t pos_ = 0;
  uint64_t acc_ = 0;
  int fill_ = 0;
};

// LSB-first reader with bounds tracking; reads past the end yield zeros and
// set a fail flag once consumed.
class BitReader {
 public:
  BitReader(const uint8_t *buf, int64_t size) : buf_(buf), size_(size) {}

  inline uint32_t Read(int bits) {
    Refill();
    uint32_t v = static_cast<uint32_t>(acc_) & ((1u << bits) - 1);
    acc_ >>= bits;
    fill_ -= bits;
    consumed_ += bits;
    return v;
  }

  inline uint32_t Peek16() {
    Refill();
    return static_cast<uint32_t>(acc_) & 0xFFFF;
  }

  inline void Skip(int bits) {
    Refill();
    acc_ >>= bits;
    fill_ -= bits;
    consumed_ += bits;
  }

  bool overrun() const { return consumed_ > size_ * 8; }
  int64_t consumed_bits() const { return consumed_; }

 private:
  inline void Refill() {
    if (fill_ > 56) return;
    if (pos_ + 8 <= size_) {
      // One unaligned little-endian load.  Bits of the partially-claimed
      // top byte leak into acc_ above fill_, but they are the *correct*
      // stream bits and get re-ORed identically when that byte is claimed.
      uint64_t w;
      std::memcpy(&w, buf_ + pos_, 8);
      acc_ |= w << fill_;
      int take = (63 - fill_) >> 3;
      pos_ += take;
      fill_ += take * 8;
      return;
    }
    while (fill_ <= 56) {
      uint8_t b = pos_ < size_ ? buf_[pos_] : 0;
      acc_ |= static_cast<uint64_t>(b) << fill_;
      ++pos_;
      fill_ += 8;
    }
  }

  const uint8_t *buf_;
  int64_t size_;
  int64_t pos_ = 0;
  uint64_t acc_ = 0;
  int fill_ = 0;
  int64_t consumed_ = 0;
};

// --------------------------------------------------------------------------
// Code construction (encode side)
// --------------------------------------------------------------------------

struct TreeNode {
  int64_t count;
  int symbol;    // -1 for internal
  int child_a, child_b;
};

struct CodeTable {
  uint32_t code[kNumSymbols];
  int8_t bits[kNumSymbols];
};

// Greedy merge with the reference's exact tie-breaking; returns root index
// or -1 when <= 1 distinct symbol.
int BuildTree(const int64_t *hist, std::vector<TreeNode> *nodes) {
  nodes->clear();
  for (int s = 0; s < kNumSymbols; ++s)
    if (hist[s] > 0) nodes->push_back({hist[s], s, -1, -1});
  int live = static_cast<int>(nodes->size());
  int root = -1;
  while (live > 1) {
    int n1 = -1, n2 = -1;
    for (int k = 0; k < static_cast<int>(nodes->size()); ++k) {
      int64_t c = (*nodes)[k].count;
      if (c > 0) {
        if (n1 < 0 || c <= (*nodes)[n1].count) { n2 = n1; n1 = k; }
        else if (n2 < 0 || c <= (*nodes)[n2].count) { n2 = k; }
      }
    }
    TreeNode parent{(*nodes)[n1].count + (*nodes)[n2].count, -1, n1, n2};
    (*nodes)[n1].count = 0;
    (*nodes)[n2].count = 0;
    root = static_cast<int>(nodes->size());
    nodes->push_back(parent);
    --live;
  }
  return root;
}

// Serialize the tree as a prefix walk and assign codes (explicit stack).
void StoreTree(const std::vector<TreeNode> &nodes, int root, int root_bits,
               BitWriter *w, CodeTable *table) {
  struct Item { int node; uint32_t code; int bits; };
  std::vector<Item> stack;
  stack.push_back({root, 0, root_bits});
  while (!stack.empty()) {
    Item it = stack.back();
    stack.pop_back();
    const TreeNode &n = nodes[it.node];
    if (n.symbol >= 0) {
      w->Put(1, 1);
      w->Put(static_cast<uint32_t>(n.symbol), kSymbolBits);
      table->code[n.symbol] = it.code;
      table->bits[n.symbol] = static_cast<int8_t>(it.bits);
    } else {
      w->Put(0, 1);
      // LIFO: push B first so A is walked first (reference order).
      stack.push_back({n.child_b, it.code | (1u << it.bits), it.bits + 1});
      stack.push_back({n.child_a, it.code, it.bits + 1});
    }
  }
}

// --------------------------------------------------------------------------
// Decode table
// --------------------------------------------------------------------------

struct DecodeNode {
  int16_t symbol;          // -1 internal
  int16_t child_a, child_b;
};

struct LutEntry {
  int16_t symbol;          // direct symbol when node < 0
  int16_t node;            // >= 0: tree node to continue from
  int8_t bits;
};

// 12-bit-prefix fast entry: up to two decoded symbols per lookup.
//   bits 0-8: first symbol; bits 9-17: second symbol (0x1FF = none);
//   bits 18-23: total code bits consumed; bit 24: valid.
// Pairs are only formed when the first symbol is a literal (RLE extras
// would sit between the codes).
struct Lut12Entry {
  uint32_t packed;
};

struct Decoder {
  DecodeNode nodes[kMaxNodes];
  LutEntry lut[256];
  Lut12Entry lut12[4096];
  int node_count = 0;
  int root = -1;
  int single_leaf_bits = 0;  // 1 when the tree is a lone leaf

  void BuildLut12() {
    for (int p = 0; p < 4096; ++p) {
      uint32_t packed = 0;
      const LutEntry &e1 = lut[p & 0xFF];
      if (e1.node < 0 && e1.bits <= 12) {
        int total = e1.bits;
        uint32_t sym2 = 0x1FF;
        if (e1.symbol <= 255 && total < 12) {
          const LutEntry &e2 = lut[(p >> total) & 0xFF];
          if (e2.node < 0 && total + e2.bits <= 12) {
            sym2 = static_cast<uint32_t>(e2.symbol);
            total += e2.bits;
          }
        }
        packed = static_cast<uint32_t>(e1.symbol) | (sym2 << 9) |
                 (static_cast<uint32_t>(total) << 18) | (1u << 24);
      }
      lut12[p].packed = packed;
    }
  }
};

int RecoverTree(BitReader *r, Decoder *d, uint32_t code, int bits) {
  if (d->node_count >= kMaxNodes - 1) return -1;
  int me = d->node_count++;
  DecodeNode &n = d->nodes[me];
  n.symbol = -1;
  n.child_a = n.child_b = -1;
  if (r->overrun()) return -1;
  if (r->Read(1)) {
    uint32_t sym = r->Read(kSymbolBits);
    if (r->overrun() || sym >= kNumSymbols) return -1;
    n.symbol = static_cast<int16_t>(sym);
    if (bits <= 8) {
      int dups = 256 >> bits;
      for (int i = 0; i < dups; ++i) {
        LutEntry &e = d->lut[(i << bits) | code];
        e.symbol = n.symbol;
        e.node = -1;
        e.bits = static_cast<int8_t>(bits);
      }
    }
    return me;
  }
  if (bits == 8) {
    LutEntry &e = d->lut[code];
    e.symbol = 0;
    e.node = static_cast<int16_t>(me);
    e.bits = 8;
  }
  int a = RecoverTree(r, d, code, bits + 1);
  if (a < 0) return -1;
  d->nodes[me].child_a = static_cast<int16_t>(a);
  int b = RecoverTree(r, d, code | (1u << bits), bits + 1);
  if (b < 0) return -1;
  d->nodes[me].child_b = static_cast<int16_t>(b);
  return me;
}

// Decode one substream into out[0..out_size).  Returns false on corrupt
// data (bad symbol, output overrun, or bit-source exhaustion).
bool DecodeStream(const Decoder &d, const uint8_t *in, int64_t in_size,
                  uint8_t *out, int64_t out_size) {
  BitReader r(in, in_size);
  int64_t filled = 0;
  const bool lone_leaf = d.nodes[d.root].symbol >= 0;
  while (filled < out_size) {
    int symbol;
    if (lone_leaf) {
      // Degenerate tree: the encoder spends 1 zero-bit per token.
      r.Skip(1);
      symbol = d.nodes[d.root].symbol;
    } else {
      uint32_t peek = r.Peek16();
      uint32_t fast = d.lut12[peek & 0xFFF].packed;
      uint32_t sym2 = (fast >> 9) & 0x1FF;
      // Pair entries need room for both symbols (an RLE second symbol
      // bounds-checks itself in the shared run path below).
      bool usable = (fast & (1u << 24)) &&
                    (sym2 == 0x1FF || sym2 > 255 || filled + 2 <= out_size);
      if (usable) {
        if (sym2 <= 255 && sym2 != 0x1FF) {
          // Two literals per lookup (the common dense-content case).
          r.Skip((fast >> 18) & 0x3F);
          out[filled++] = static_cast<uint8_t>(fast & 0x1FF);
          out[filled++] = static_cast<uint8_t>(sym2);
          if (r.overrun()) return false;
          continue;
        }
        if (sym2 == 0x1FF) {
          r.Skip((fast >> 18) & 0x3F);
          symbol = static_cast<int>(fast & 0x1FF);
        } else {
          // Literal + RLE pair: consume both codes, then sym2's extras
          // below via the shared RLE path.
          r.Skip((fast >> 18) & 0x3F);
          out[filled++] = static_cast<uint8_t>(fast & 0x1FF);
          if (filled >= out_size) {
            // The literal completed the substream; sym2 was decoded from
            // the final byte's stale padding bits (a reference encoder
            // quirk) and must be discarded.
            break;
          }
          symbol = static_cast<int>(sym2);
        }
      } else {
        const LutEntry &e = d.lut[peek & 0xFF];
        if (e.node < 0) {
          r.Skip(e.bits);
          symbol = e.symbol;
        } else {
          r.Skip(8);
          int node = e.node;
          while (d.nodes[node].symbol < 0) {
            node = r.Read(1) ? d.nodes[node].child_b : d.nodes[node].child_a;
            if (r.overrun()) return false;
          }
          symbol = d.nodes[node].symbol;
        }
      }
    }
    if (r.overrun()) return false;
    if (symbol <= 255) {
      out[filled++] = static_cast<uint8_t>(symbol);
    } else {
      int64_t zeros;
      switch (symbol) {
        case 256: zeros = 2; break;
        case 257: zeros = r.Read(2) + 3; break;
        case 258: zeros = r.Read(4) + 7; break;
        case 259: zeros = r.Read(8) + 23; break;
        case 260: zeros = r.Read(14) + 279; break;
        default: return false;
      }
      if (r.overrun() || filled + zeros > out_size) return false;
      std::memset(out + filled, 0, static_cast<size_t>(zeros));
      filled += zeros;
    }
  }
  return true;
}

}  // namespace

extern "C" {

// Upper bound on compressed size for buffer allocation: payload can expand
// (worst-case code ~32 bits/byte) plus tree + per-block prefixes.
int64_t he_max_compressed_size(int64_t in_size, int64_t block_size) {
  if (block_size < 1) block_size = in_size > 0 ? in_size : 1;
  int64_t n_blocks = block_size > 0 ? (in_size + block_size - 1) / block_size : 0;
  return 8 * in_size + 64 * n_blocks + 1024;
}

namespace {

// One RLE/literal token packed into 32 bits:
//   bits 0-8  symbol, bits 9-12 extra-bit count, bits 13-26 extra value.
using Token = uint32_t;
inline Token MakeToken(int sym, uint32_t extra, int ebits) {
  return static_cast<uint32_t>(sym) | (static_cast<uint32_t>(ebits) << 9) |
         (extra << 13);
}

// True when an 8-byte word contains a zero byte (Mycroft's trick).
inline bool HasZeroByte(uint64_t w) {
  return ((w - 0x0101010101010101ull) & ~w & 0x8080808080808080ull) != 0;
}

// Tokenize one block into `tokens` (pre-sized to >= block_size) and bump
// the per-block 261-bin histogram; returns (token_count, extra_bits) via
// out-params.  Dense literal stretches are emitted 8 at a time without
// per-byte branches; zero runs skip by 64-bit words.
inline void TokenizeBlock(const uint8_t *blk, int64_t block_size,
                          Token *tokens, uint32_t *hist,
                          int64_t *n_tokens, int64_t *extra_bits) {
  int64_t k = 0;
  Token *tp = tokens;
  int64_t extra_total = 0;
  while (k < block_size) {
    // Branch-light literal burst: whole words without zero bytes.
    while (k + 8 <= block_size) {
      uint64_t w;
      std::memcpy(&w, blk + k, 8);
      if (HasZeroByte(w)) break;
      for (int i = 0; i < 8; ++i) {
        uint8_t v = static_cast<uint8_t>(w >> (8 * i));
        hist[v]++;
        *tp++ = MakeToken(v, 0, 0);
      }
      k += 8;
    }
    if (k >= block_size) break;
    uint8_t v = blk[k];
    if (v != 0) {
      hist[v]++;
      *tp++ = MakeToken(v, 0, 0);
      ++k;
      continue;
    }
    int64_t z = 1;
    int64_t limit = std::min<int64_t>(block_size - k, kMaxRun);
    // Fast-skip aligned zero words.
    while (z + 8 <= limit) {
      uint64_t w;
      std::memcpy(&w, blk + k + z, 8);
      if (w != 0) break;
      z += 8;
    }
    while (z < limit && blk[k + z] == 0) ++z;
    uint32_t extra;
    int ebits;
    int sym = RunSymbol(static_cast<int>(z), &extra, &ebits);
    hist[sym]++;
    extra_total += ebits;
    *tp++ = MakeToken(sym, extra, ebits);
    k += z;
  }
  *n_tokens = tp - tokens;
  *extra_bits = extra_total;
}

}  // namespace

// Compress `in[0..in_size)` with per-block substreams of `block_size`
// uncompressed bytes (0 = single stream).  Returns compressed size, or -1
// on error (bad args / out_cap too small).  Byte-identical to the
// reference encoder.  Pipeline: one tokenizing pass (tokens buffered, so
// the data is scanned once), host tree build, then per-block bit packing
// parallelized over blocks with a sequential final-byte fix-up replaying
// the reference's scratch-buffer reuse.
int64_t he_compress(const uint8_t *in, int64_t in_size, int64_t block_size,
                    uint8_t *out, int64_t out_cap) {
  if (in_size < 1) return 0;
  if (block_size < 1) block_size = in_size;
  const bool use_blocks = block_size < in_size;
  if (in_size % block_size != 0) return -1;
  if (out_cap < he_max_compressed_size(in_size, block_size)) return -1;
  const int64_t n_blocks = in_size / block_size;
  PhaseTimer pt;

  // Pass 1: tokenize + per-block histogram (threaded over block ranges).
  // Per-block histograms let the bit sizes come from a 261-entry dot
  // product with the code lengths instead of a second pass over tokens.
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = std::max(1, std::min<int>(hw, static_cast<int>(
      std::min<int64_t>(n_blocks, 16))));
  // Token storage: one flat arena (worst case one token per byte).
  std::vector<Token> token_arena(static_cast<size_t>(in_size));
  std::vector<int64_t> tok_count(n_blocks);
  std::vector<std::vector<uint32_t>> block_hist(
      n_blocks, std::vector<uint32_t>(kNumSymbols, 0));
  std::vector<int64_t> block_extra_bits(n_blocks);
  {
    std::atomic<int64_t> next_blk(0);
    auto tok_worker = [&]() {
      while (true) {
        int64_t b = next_blk.fetch_add(1, std::memory_order_relaxed);
        if (b >= n_blocks) break;
        TokenizeBlock(in + b * block_size, block_size,
                      token_arena.data() + b * block_size,
                      block_hist[b].data(), &tok_count[b],
                      &block_extra_bits[b]);
      }
    };
    std::vector<std::thread> ts;
    for (int t = 1; t < n_threads; ++t) ts.emplace_back(tok_worker);
    tok_worker();
    for (auto &t : ts) t.join();
  }
  pt.lap("tokenize");
  int64_t hist[kNumSymbols] = {0};
  for (auto &h : block_hist)
    for (int s = 0; s < kNumSymbols; ++s) hist[s] += h[s];

  // Tree + header (+16 slack for the writer's 8-byte spill, later
  // overwritten by the first block's prefix/payload).
  constexpr int64_t kMaxTreeBytes = ((2 + kSymbolBits) * kNumSymbols + 7) / 8;
  std::memset(out, 0, static_cast<size_t>(
      std::min<int64_t>(out_cap, kMaxTreeBytes + 16)));
  BitWriter head(out);
  std::vector<TreeNode> nodes;
  int root = BuildTree(hist, &nodes);
  CodeTable table;
  std::memset(table.bits, 0, sizeof(table.bits));
  if (root >= 0) {
    StoreTree(nodes, root, 0, &head, &table);
  } else if (!nodes.empty()) {
    StoreTree(nodes, 0, 1, &head, &table);  // single-symbol special case
  }
  head.FlushPartial();
  const int64_t head_bytes = head.byte_count();

  // Fused per-symbol (code | bits<<56) pack table.
  uint64_t fused[kNumSymbols];
  for (int s = 0; s < kNumSymbols; ++s)
    fused[s] = static_cast<uint64_t>(table.code[s]) |
               (static_cast<uint64_t>(table.bits[s]) << 56);

  // Exact per-block bit sizes from the per-block histograms.
  std::vector<int64_t> bit_sizes(n_blocks);
  for (int64_t b = 0; b < n_blocks; ++b) {
    int64_t bits = block_extra_bits[b];
    const uint32_t *h = block_hist[b].data();
    for (int s = 0; s < kNumSymbols; ++s)
      bits += static_cast<int64_t>(h[s]) * table.bits[s];
    bit_sizes[b] = bits;
  }
  pt.lap("tree+sizes");
  std::vector<int64_t> offsets(n_blocks + 1);
  offsets[0] = head_bytes;
  for (int64_t b = 0; b < n_blocks; ++b) {
    int64_t packed = (bit_sizes[b] + 7) / 8;
    int64_t prefix = 0;
    if (use_blocks) prefix = packed <= 0x7FFF ? 2 : 4;
    offsets[b + 1] = offsets[b] + prefix + packed;
  }

  {
    int64_t max_packed = 0;
    for (int64_t b = 0; b < n_blocks; ++b)
      max_packed = std::max(max_packed, (bit_sizes[b] + 7) / 8);
    std::atomic<int64_t> next_blk(0);
    auto pack_worker = [&]() {
      // Per-thread scratch: the bulk-store writer spills 8 bytes past its
      // cursor, which must never touch a neighbouring block's bytes.
      std::vector<uint8_t> scratch(static_cast<size_t>(max_packed) + 16, 0);
      while (true) {
        int64_t b = next_blk.fetch_add(1, std::memory_order_relaxed);
        if (b >= n_blocks) break;
        int64_t packed = (bit_sizes[b] + 7) / 8;
        uint8_t *dst = out + offsets[b];
        if (use_blocks) {
          if (packed <= 0x7FFF) {
            dst[0] = static_cast<uint8_t>(packed);
            dst[1] = static_cast<uint8_t>(packed >> 8);
            dst += 2;
          } else {
            uint32_t lo = static_cast<uint32_t>((packed & 0x7FFF) | 0x8000);
            dst[0] = static_cast<uint8_t>(lo);
            dst[1] = static_cast<uint8_t>(lo >> 8);
            dst[2] = static_cast<uint8_t>(packed >> 15);
            dst[3] = static_cast<uint8_t>(packed >> 23);
            dst += 4;
          }
        }
        if (bit_sizes[b] & 7) scratch[packed - 1] = 0;  // defined partial byte
        BitWriter w(scratch.data());
        const Token *tp = token_arena.data() + b * block_size;
        const Token *te = tp + tok_count[b];
        for (; tp != te; ++tp) {
          Token t = *tp;
          uint64_t e = fused[t & 0x1FF];  // code | bits<<56
          int nb = static_cast<int>(e >> 56);
          w.Put((e & 0xFFFFFFFFFFFFFFull) |
                    (static_cast<uint64_t>(t >> 13) << nb),
                nb + ((t >> 9) & 0xF));
        }
        w.FlushPartial();
        std::memcpy(dst, scratch.data(), static_cast<size_t>(packed));
      }
    };
    std::vector<std::thread> ts;
    for (int t = 1; t < n_threads; ++t) ts.emplace_back(pack_worker);
    pack_worker();
    for (auto &t : ts) t.join();
  }

  pt.lap("pack");
  // Sequential stale-bit fix-up: the reference serializes every block
  // through one reused scratch buffer, so the unused high bits of block
  // b's final byte hold the most recent earlier block's byte at the same
  // scratch index.  Replay that by tracking, per byte index, the latest
  // block whose payload covered it.
  {
    int64_t max_packed = 0;
    for (int64_t b = 0; b < n_blocks; ++b)
      max_packed = std::max(max_packed, (bit_sizes[b] + 7) / 8);
    std::vector<uint8_t> scratch(static_cast<size_t>(max_packed) + 1, 0);
    for (int64_t b = 0; b < n_blocks; ++b) {
      int64_t packed = (bit_sizes[b] + 7) / 8;
      int rem = static_cast<int>(bit_sizes[b] & 7);
      uint8_t *payload = out + offsets[b + 1] - packed;
      if (packed > 0 && rem) {
        uint8_t mask = static_cast<uint8_t>((1u << rem) - 1);
        payload[packed - 1] = static_cast<uint8_t>(
            (payload[packed - 1] & mask) | (scratch[packed - 1] & ~mask));
      }
      std::memcpy(scratch.data(), payload, static_cast<size_t>(packed));
    }
  }
  pt.lap("fixup");
  return offsets[n_blocks];
}

// Tokenize + histogram only (the analysis pass of the sharded-assembly
// protocol: each shard histograms its local rows, the 261-bin results are
// all-reduced, and packing happens locally against the shared tree --
// SURVEY.md section 5).  hist_out must hold 261 int64 bins.
int32_t he_histogram(const uint8_t *in, int64_t in_size, int64_t block_size,
                     int64_t *hist_out) {
  if (in_size < 1) { std::memset(hist_out, 0, 261 * 8); return 0; }
  if (block_size < 1) block_size = in_size;
  if (in_size % block_size != 0) return -1;
  const int64_t n_blocks = in_size / block_size;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = std::max<int>(
      1, static_cast<int>(std::min<int64_t>(hw, std::min<int64_t>(n_blocks, 16))));
  std::vector<std::vector<uint32_t>> thread_hist(
      n_threads, std::vector<uint32_t>(kNumSymbols, 0));
  std::atomic<int64_t> next_blk(0);
  auto worker = [&](int tid) {
    std::vector<Token> scratch(static_cast<size_t>(block_size));
    int64_t n_tok, ebits;
    while (true) {
      int64_t b = next_blk.fetch_add(1, std::memory_order_relaxed);
      if (b >= n_blocks) break;
      TokenizeBlock(in + b * block_size, block_size, scratch.data(),
                    thread_hist[tid].data(), &n_tok, &ebits);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < n_threads; ++t) ts.emplace_back(worker, t);
  worker(0);
  for (auto &t : ts) t.join();
  for (int s = 0; s < kNumSymbols; ++s) {
    int64_t acc = 0;
    for (int t = 0; t < n_threads; ++t) acc += thread_hist[t][s];
    hist_out[s] = acc;
  }
  return 0;
}

// Pack blocks against an externally supplied code table (the local-pack
// step of sharded assembly).  Payloads are written back-to-back into
// `out` with NO tree header, NO length prefixes and NO stale-bit fix-up;
// per-block byte sizes and exact bit counts go to sizes_out/bits_out
// (each n_blocks entries).  Returns total payload bytes, or -1 on error.
int64_t he_pack_with_code(const uint8_t *in, int64_t in_size,
                          int64_t block_size, const uint32_t *codes,
                          const uint8_t *code_bits, uint8_t *out,
                          int64_t out_cap, int64_t *sizes_out,
                          int64_t *bits_out) {
  if (in_size < 1) return 0;
  if (block_size < 1) block_size = in_size;
  if (in_size % block_size != 0) return -1;
  const int64_t n_blocks = in_size / block_size;

  uint64_t fused[kNumSymbols];
  for (int s = 0; s < kNumSymbols; ++s)
    fused[s] = static_cast<uint64_t>(codes[s]) |
               (static_cast<uint64_t>(code_bits[s]) << 56);

  int hw = static_cast<int>(std::thread::hardware_concurrency());
  int n_threads = std::max<int>(
      1, static_cast<int>(std::min<int64_t>(hw, std::min<int64_t>(n_blocks, 16))));

  // Pass 1: tokenize into a flat arena with per-block histograms -> exact
  // bit sizes -> output offsets.
  std::vector<Token> token_arena(static_cast<size_t>(in_size));
  std::vector<int64_t> tok_count(n_blocks);
  std::vector<std::vector<uint32_t>> block_hist(
      n_blocks, std::vector<uint32_t>(kNumSymbols, 0));
  std::vector<int64_t> block_extra(n_blocks);
  {
    std::atomic<int64_t> next_blk(0);
    auto worker = [&]() {
      while (true) {
        int64_t b = next_blk.fetch_add(1, std::memory_order_relaxed);
        if (b >= n_blocks) break;
        TokenizeBlock(in + b * block_size, block_size,
                      token_arena.data() + b * block_size,
                      block_hist[b].data(), &tok_count[b], &block_extra[b]);
      }
    };
    std::vector<std::thread> ts;
    for (int t = 1; t < n_threads; ++t) ts.emplace_back(worker);
    worker();
    for (auto &t : ts) t.join();
  }
  std::vector<int64_t> offsets(n_blocks + 1);
  offsets[0] = 0;
  for (int64_t b = 0; b < n_blocks; ++b) {
    int64_t bits = block_extra[b];
    const uint32_t *h = block_hist[b].data();
    for (int s = 0; s < kNumSymbols; ++s)
      bits += static_cast<int64_t>(h[s]) * code_bits[s];
    bits_out[b] = bits;
    sizes_out[b] = (bits + 7) / 8;
    offsets[b + 1] = offsets[b] + sizes_out[b];
  }
  if (offsets[n_blocks] > out_cap) return -1;

  // Pass 2: pack each block into its slot (threaded, via scratch because
  // the 64-bit writer spills past its cursor).
  {
    int64_t max_packed = 0;
    for (int64_t b = 0; b < n_blocks; ++b)
      max_packed = std::max(max_packed, sizes_out[b]);
    std::atomic<int64_t> next_blk(0);
    auto worker = [&]() {
      std::vector<uint8_t> scratch(static_cast<size_t>(max_packed) + 16, 0);
      while (true) {
        int64_t b = next_blk.fetch_add(1, std::memory_order_relaxed);
        if (b >= n_blocks) break;
        BitWriter w(scratch.data());
        const Token *tp = token_arena.data() + b * block_size;
        const Token *te = tp + tok_count[b];
        for (; tp != te; ++tp) {
          Token t = *tp;
          uint64_t e = fused[t & 0x1FF];
          int nb = static_cast<int>(e >> 56);
          w.Put((e & 0xFFFFFFFFFFFFFFull) |
                    (static_cast<uint64_t>(t >> 13) << nb),
                nb + ((t >> 9) & 0xF));
        }
        w.FlushPartial();
        std::memcpy(out + offsets[b], scratch.data(),
                    static_cast<size_t>(sizes_out[b]));
      }
    };
    std::vector<std::thread> ts;
    for (int t = 1; t < n_threads; ++t) ts.emplace_back(worker);
    worker();
    for (auto &t : ts) t.join();
  }
  return offsets[n_blocks];
}

// Decompress into out[0..out_size).  block_size is the *uncompressed*
// bytes per substream (0 = single stream).  Returns 0 on success, negative
// error codes otherwise.  Decoding is threaded over substreams.
int32_t he_decompress(const uint8_t *in, int64_t in_size, int64_t block_size,
                      uint8_t *out, int64_t out_size, int32_t n_threads) {
  if (out_size == 0) return 0;
  if (in_size < 1) return -1;
  if (block_size < 1) block_size = out_size;
  const bool use_blocks = block_size < out_size;
  if (out_size % block_size != 0) return -2;

  PhaseTimer pt;
  Decoder dec;
  BitReader tree_reader(in, in_size);
  dec.root = RecoverTree(&tree_reader, &dec, 0, 0);
  if (dec.root < 0) return -3;
  dec.BuildLut12();
  int64_t tree_bytes = (tree_reader.consumed_bits() + 7) / 8;
  pt.lap("tree+lut");

  if (!use_blocks) {
    return DecodeStream(dec, in + tree_bytes, in_size - tree_bytes, out,
                        out_size) ? 0 : -4;
  }

  // Substream directory.
  int64_t n_blocks = out_size / block_size;
  std::vector<std::pair<int64_t, int64_t>> spans;  // (offset, size)
  spans.reserve(static_cast<size_t>(n_blocks));
  int64_t cursor = tree_bytes;
  for (int64_t b = 0; b < n_blocks; ++b) {
    if (cursor + 2 > in_size) return -5;
    int64_t ps = in[cursor] | (in[cursor + 1] << 8);
    cursor += 2;
    if (ps & 0x8000) {
      if (cursor + 2 > in_size) return -5;
      ps = (ps & 0x7FFF) |
           (static_cast<int64_t>(in[cursor] | (in[cursor + 1] << 8)) << 15);
      cursor += 2;
    }
    if (cursor + ps > in_size) return -5;
    spans.emplace_back(cursor, ps);
    cursor += ps;
  }

  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (n_threads <= 0) n_threads = hw > 0 ? hw : 1;
  n_threads = static_cast<int32_t>(
      std::min<int64_t>(n_threads, n_blocks));

  std::atomic<int64_t> next(0);
  std::atomic<bool> ok(true);
  auto worker = [&]() {
    while (ok.load(std::memory_order_relaxed)) {
      int64_t b = next.fetch_add(1, std::memory_order_relaxed);
      if (b >= n_blocks) break;
      if (!DecodeStream(dec, in + spans[b].first, spans[b].second,
                        out + b * block_size, block_size))
        ok.store(false, std::memory_order_relaxed);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads - 1; ++t) threads.emplace_back(worker);
  worker();
  for (auto &t : threads) t.join();
  pt.lap("decode");
  return ok.load() ? 0 : -4;
}

}  // extern "C"
