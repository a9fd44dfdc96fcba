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
#include <memory>
#include <thread>
#include <vector>

// HIMG_FORCE_SCALAR disables all SIMD paths (tests build this variant to
// byte-check the scalar tail loops, which otherwise only run on block
// remainders).
#if defined(__AVX512BW__) && !defined(HIMG_FORCE_SCALAR)
#include <immintrin.h>
#define HIMG_HAVE_AVX512BW 1
#elif defined(__SSE2__) && !defined(HIMG_FORCE_SCALAR)
#include <emmintrin.h>
#define HIMG_HAVE_SSE2 1
#endif

namespace {

// Phase timing: always recorded into a slot array (exported through
// he_last_phase_ms for the microbench receipts), echoed to stderr when
// HIMG_ENTROPY_PROFILE is set.
enum Phase { kPhTokenize, kPhTree, kPhPack, kPhFixup, kPhTreeLut, kPhDecode,
             kPhCount };
// thread_local: BatchCodec's host_threads pool runs codec calls
// concurrently; a shared slot array would be a data race.  The receipts
// reader (he_last_phase_ms, microbench) is single-threaded and reads its
// own thread's last call.
thread_local double g_phase_ms[kPhCount];

struct PhaseTimer {
  bool on = std::getenv("HIMG_ENTROPY_PROFILE") != nullptr;
  std::chrono::steady_clock::time_point t = std::chrono::steady_clock::now();
  void lap(Phase ph, const char *name) {
    auto now = std::chrono::steady_clock::now();
    double ms = std::chrono::duration<double, std::milli>(now - t).count();
    g_phase_ms[ph] = ms;
    if (on) std::fprintf(stderr, "[entropy] %-14s %7.2f ms\n", name, ms);
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

  // NOTE: each flush spills one unaligned 8-byte store at the write cursor,
  // so the destination buffer needs 8 bytes of slack past the final byte;
  // payload writers therefore target per-thread scratch, not `out`.
  //
  // Lazy flush: bits accumulate until >= 32 are pending, so short codes
  // cost no store at all.  Requires bits <= 32 per call (true for the
  // format: codes are uint32 and extras <= 14; callers split otherwise).
  inline void Put(uint64_t value, int bits) {
    acc_ |= (value & ((1ull << bits) - 1)) << fill_;
    fill_ += bits;
    if (fill_ >= 32) {
      std::memcpy(buf_ + pos_, &acc_, 8);
      int bytes = fill_ >> 3;
      pos_ += bytes;
      acc_ >>= 8 * bytes;
      fill_ &= 7;
    }
  }

  // Flush pending whole bytes, then merge a trailing partial byte with
  // existing buffer content.
  void FlushPartial() {
    while (fill_ >= 8) {
      buf_[pos_++] = static_cast<uint8_t>(acc_);
      acc_ >>= 8;
      fill_ -= 8;
    }
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

// 13-bit-prefix fast entry: multiple decoded *items* per lookup, with
// short RLE extras folded in (run classes up to 259 decode entirely from
// the table; class 260 needs 14 extra bits and never fits).
//
// uint64 layout (entry == 0 -> no fast entry, use the slow path):
//   bits 0-5   total stream bits consumed (codes + inline extras)
//   bit 6      entry kind
//   kind 0 (pattern: any item mix whose total output fits 6 bytes --
//           literals AND short zero runs embedded as zero bytes):
//     bits 8-10   output byte count (1-6)
//     bits 16-63  the output bytes in stream order, zero above the count
//                 -- emitted with one unconditional 8-byte store (no
//                 per-item branch; zeros above the count make the store
//                 idempotent over pre-zeroed output, which the SIMD
//                 lockstep decoder relies on)
//   kind 1 (>6 output bytes, i.e. contains a sizable run):
//     bits 7-9    item count (1-4)
//     bits 10+12k item k: bit 11 set -> zero run, low 11 bits = length
//                 (2..278); bit 11 clear -> literal byte
constexpr int kLutBitsDefault = 13;
constexpr int kLutBitsMax = 14;

// Decode LUT width, overridable for A/B receipts (tools/microbench
// entropy).  13 bits measured best on the bench host (see
// docs/ARCHITECTURE.md); 14 doubles build cost for ~the same loop time,
// 11/12 fit L1 but decode fewer items per lookup.
int LutBits() {
  static int bits = [] {
    const char *env = std::getenv("HIMG_LUT_BITS");
    if (!env) return kLutBitsDefault;
    int v = std::atoi(env);
    return v >= 8 && v <= kLutBitsMax ? v : kLutBitsDefault;
  }();
  return bits;
}

struct Decoder {
  DecodeNode nodes[kMaxNodes];
  LutEntry lut[256];
  uint64_t lutm[1 << kLutBitsMax];
  int lut_bits = LutBits();
  int node_count = 0;
  int root = -1;
  int single_leaf_bits = 0;  // 1 when the tree is a lone leaf

  // Decode one symbol from `bits` (LSB-first) using the 8-bit LUT + tree
  // walk; returns consumed bit count or -1 if it needs > `avail` bits.
  int SymbolFrom(uint32_t bits, int avail, int *symbol) const {
    const LutEntry &e = lut[bits & 0xFF];
    if (e.node < 0) {
      if (e.bits > avail) return -1;
      *symbol = e.symbol;
      return e.bits;
    }
    int used = 8, node = e.node;
    while (nodes[node].symbol < 0) {
      if (used >= avail) return -1;
      node = (bits >> used) & 1 ? nodes[node].child_b : nodes[node].child_a;
      ++used;
    }
    *symbol = nodes[node].symbol;
    return used;
  }

  void BuildLutM() {
    const uint32_t lut_size = 1u << lut_bits;
    for (uint32_t p = 0; p < lut_size; ++p) {
      // Pass A -- pattern entry: decode symbols while the accumulated
      // OUTPUT (literal bytes + embedded zero-run bytes) fits 6 bytes.
      uint64_t pattern = 0;
      int pat_bits = 0, pat_out = 0;
      while (true) {
        int sym;
        int used = SymbolFrom(p >> pat_bits, lut_bits - pat_bits, &sym);
        if (used < 0) break;
        int out;
        if (sym <= 255) {
          out = 1;
        } else if (sym == 260) {
          break;  // 14 extra bits can never fit a 13-bit entry
        } else {
          static constexpr int kEb[4] = {0, 2, 4, 8};
          static constexpr int kBase[4] = {2, 3, 7, 23};
          int eb = kEb[sym - 256];
          if (pat_bits + used + eb > lut_bits) break;
          out = kBase[sym - 256] +
                static_cast<int>((p >> (pat_bits + used)) & ((1u << eb) - 1));
          used += eb;
        }
        if (pat_out + out > 6) break;
        if (sym <= 255 && sym > 0)
          pattern |= static_cast<uint64_t>(sym) << (8 * pat_out);
        pat_out += out;
        pat_bits += used;
      }
      // Pass B -- item entry: up to 4 mixed items of any size.
      uint64_t items = 0;
      int item_bits = 0, n = 0;
      while (n < 4) {
        int sym;
        int used = SymbolFrom(p >> item_bits, lut_bits - item_bits, &sym);
        if (used < 0) break;
        uint64_t item;
        if (sym <= 255) {
          item = static_cast<uint64_t>(sym);
        } else if (sym == 260) {
          break;
        } else {
          static constexpr int kEb[4] = {0, 2, 4, 8};
          static constexpr int kBase[4] = {2, 3, 7, 23};
          int eb = kEb[sym - 256];
          if (item_bits + used + eb > lut_bits) break;
          uint32_t extra = (p >> (item_bits + used)) & ((1u << eb) - 1);
          item = 0x800u | (kBase[sym - 256] + extra);
          used += eb;
        }
        items |= item << (10 + 12 * n);
        item_bits += used;
        ++n;
      }
      // The pattern form costs one unconditional store; take the item
      // form only when it consumes strictly more stream bits.
      uint64_t packed = 0;
      if (pat_out > 0 && pat_bits >= item_bits) {
        packed = static_cast<uint64_t>(pat_bits) |
                 (static_cast<uint64_t>(pat_out) << 8) | (pattern << 16);
      } else if (n) {
        packed = static_cast<uint64_t>(item_bits) | (1u << 6) |
                 (static_cast<uint64_t>(n) << 7) | items;
      }
      lutm[p] = packed;
    }
  }
};

int RecoverTree(BitReader *r, Decoder *d, uint32_t code, int bits) {
  // A full 261-leaf tree has exactly kMaxNodes (521) nodes; reject only
  // when allocating one MORE than that (malformed input).
  if (d->node_count >= kMaxNodes) return -1;
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
  // Codes only matter for the <= 8-bit LUT fill; clamp the branch-bit
  // shift so hostile deep trees (bits >= 32) stay defined behavior.
  uint32_t b_code = bits < 31 ? (code | (1u << bits)) : code;
  int b = RecoverTree(r, d, b_code, bits + 1);
  if (b < 0) return -1;
  d->nodes[me].child_b = static_cast<int16_t>(b);
  return me;
}

bool DecodeStreamResume(const Decoder &d, const uint8_t *in, int64_t in_size,
                        int64_t pos0, uint64_t acc0, int fill0,
                        uint8_t *out, int64_t filled0, int64_t out_size);

// Decode one substream into out[0..out_size).  Returns false on corrupt
// data (bad symbol, output overrun, or bit-source exhaustion).
bool DecodeStream(const Decoder &d, const uint8_t *in, int64_t in_size,
                  uint8_t *out, int64_t out_size) {
  BitReader r(in, in_size);
  int64_t filled = 0;
  const bool lone_leaf = d.nodes[d.root].symbol >= 0;
  if (lone_leaf) {
    // Degenerate tree: the encoder spends 1 zero-bit per token.
    const int symbol = d.nodes[d.root].symbol;
    while (filled < out_size) {
      r.Skip(1);
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
  return DecodeStreamResume(d, in, in_size, 0, 0, 0, out, 0, out_size);
}

// The scalar hot loop, resumable from mid-stream state: pos0 bytes
// loaded, acc0/fill0 pending accumulator bits, filled0 output bytes
// done.  The SIMD group decoder retires lanes into this (tail lanes,
// runaway lanes); DecodeStream enters it at zero state.
bool DecodeStreamResume(const Decoder &d, const uint8_t *in, int64_t in_size,
                        int64_t pos0, uint64_t acc0, int fill0,
                        uint8_t *out, int64_t filled0, int64_t out_size) {
  int64_t filled = filled0;
  // Hot loop with explicit local reader state: byte loads through a
  // uint8_t* alias everything in C++, so member-based state (BitReader)
  // would be spilled and reloaded around every refill -- locals stay in
  // registers.
  const uint64_t lut_mask = (1u << d.lut_bits) - 1;
  int64_t pos = pos0;
  uint64_t acc = acc0;
  int fill = fill0;
  // Bits consumed from the logical stream so far (read-ahead loads do
  // not count: they sit in acc/fill).
  int64_t consumed = pos0 * 8 - fill0;
  const int64_t size_bits = in_size * 8;
  auto refill = [&]() {
    if (fill > 56) return;
    if (pos + 8 <= in_size) {
      // One unaligned little-endian load; bits of the partially-claimed
      // top byte get re-ORed identically when that byte is claimed.
      uint64_t w;
      std::memcpy(&w, in + pos, 8);
      acc |= w << fill;
      int take = (63 - fill) >> 3;
      pos += take;
      fill += take * 8;
    } else {
      while (fill <= 56) {
        uint64_t b = pos < in_size ? in[pos] : 0;
        acc |= b << fill;
        ++pos;
        fill += 8;
      }
    }
  };
  while (filled < out_size) {
    refill();
    uint64_t fast = d.lutm[acc & lut_mask];
    if (fast) {
      // Up to 4 items decoded by one lookup, extras included.  All the
      // entry's bits are consumed up front; items decoded from a final
      // byte's stale padding bits (a reference encoder quirk) fall out of
      // the filled < out_size guard and are discarded.
      int nb = static_cast<int>(fast & 0x3F);
      acc >>= nb;
      fill -= nb;
      consumed += nb;
      if (!(fast & 0x40) && filled + 8 <= out_size) {
        // Literal-only entry, the dense-content common case: one
        // unconditional 8-byte store (up to 6 decoded bytes), no
        // per-item branch.  Bytes past the count get overwritten by
        // subsequent output; the +8 guard keeps the store inside this
        // substream's slot AND excludes stale-bit phantoms (phantom
        // literals require the real stream to end within 5 bytes of
        // out_size, where the guard already fails).
        uint64_t lits = fast >> 16;
        std::memcpy(out + filled, &lits, 8);
        filled += (fast >> 8) & 7;
        if (consumed > size_bits && filled < out_size) return false;
        continue;
      }
      if (!(fast & 0x40)) {
        // Literal-only near the substream end: bounded per-byte path.
        int n = static_cast<int>((fast >> 8) & 7);
        uint64_t lits = fast >> 16;
        for (int i = 0; i < n; ++i, lits >>= 8) {
          out[filled++] = static_cast<uint8_t>(lits);
          if (filled >= out_size) break;  // trailing items = stale bits
        }
        if (filled < out_size && consumed > size_bits) return false;
        continue;
      }
      int n = static_cast<int>((fast >> 7) & 7);
      uint64_t items = fast >> 10;
      for (int i = 0; i < n; ++i, items >>= 12) {
        uint32_t it = static_cast<uint32_t>(items) & 0xFFF;
        if (it & 0x800) {
          int64_t zeros = it & 0x7FF;
          if (filled + zeros > out_size) return false;
          if (zeros <= 16 && filled + 16 <= out_size) {
            // Two unconditional 8-byte stores beat a memset call for the
            // short runs that dominate.
            std::memset(out + filled, 0, 8);
            std::memset(out + filled + 8, 0, 8);
          } else {
            std::memset(out + filled, 0, static_cast<size_t>(zeros));
          }
          filled += zeros;
        } else {
          out[filled++] = static_cast<uint8_t>(it);
        }
        if (filled >= out_size) break;  // trailing items are stale bits
      }
      // Overrun only matters when output remains: the entry may have
      // consumed stale-padding bits past the physical stream end while
      // completing the substream, which is valid.
      if (filled < out_size && consumed > size_bits) return false;
      continue;
    }
    // Slow path: long code (8-bit LUT -> tree walk) or a class-260 run.
    int symbol;
    const LutEntry &e = d.lut[acc & 0xFF];
    if (e.node < 0) {
      acc >>= e.bits;
      fill -= e.bits;
      consumed += e.bits;
      symbol = e.symbol;
    } else {
      acc >>= 8;
      fill -= 8;
      consumed += 8;
      int node = e.node;
      while (d.nodes[node].symbol < 0) {
        refill();
        node = (acc & 1) ? d.nodes[node].child_b : d.nodes[node].child_a;
        acc >>= 1;
        --fill;
        ++consumed;
        if (consumed > size_bits) return false;
      }
      symbol = d.nodes[node].symbol;
    }
    if (consumed > size_bits) return false;
    if (symbol <= 255) {
      out[filled++] = static_cast<uint8_t>(symbol);
    } else {
      refill();
      int64_t zeros;
      int eb = 0;
      switch (symbol) {
        case 256: zeros = 2; break;
        case 257: zeros = (acc & 3) + 3; eb = 2; break;
        case 258: zeros = (acc & 15) + 7; eb = 4; break;
        case 259: zeros = (acc & 255) + 23; eb = 8; break;
        case 260: zeros = (acc & 16383) + 279; eb = 14; break;
        default: return false;
      }
      acc >>= eb;
      fill -= eb;
      consumed += eb;
      if (consumed > size_bits || filled + zeros > out_size) return false;
      std::memset(out + filled, 0, static_cast<size_t>(zeros));
      filled += zeros;
    }
  }
  return true;
}

#if HIMG_HAVE_AVX512BW

// --------------------------------------------------------------------------
// Lockstep SIMD decode: 8 substreams per AVX-512 register set.
//
// The scalar decode loop is latency-bound on its dependent chain
// (lutm load -> consumed-bits -> accumulator shift -> next index, ~20+
// cycles each), and round-2 measured scalar substream interleaving as a
// loss.  The different core this tries: keep ONE chain per lane but run
// 8 lanes in data parallel with gathered table lookups, per-lane
// variable shifts, and scattered stores -- the format's per-block-row
// substreams are the independent streams.
//
// Key invariant: the output buffer is pre-zeroed, so zero runs are pure
// cursor advances (no stores to diverge on), and every store writes its
// full width with zeros above the payload (lutm literal-only entries
// already zero-pad bits above their byte count; kind-1 literals store
// the byte as a u32).  Lanes leave lockstep into the scalar resume loop
// when they get within kMaxEntryAdvance+16 bytes of their block end
// (bounds every vector store and keeps garbage read-ahead bits out of
// consumed windows -- <13 remaining stream bits implies <= 284 remaining
// output bytes, see the retire threshold note), when a lookup misses the
// fast table mid-block they take one inline scalar symbol step and
// rejoin, and on any runaway (corrupt input) the lane's scalar resume
// delivers the authoritative error.
// --------------------------------------------------------------------------

// Max output bytes one fast-table entry can advance: a 259-class run
// (278 zeros, >= 9 bits) leaves <= 4 bits for at most 1-bit 256-runs
// (2 zeros each): 278 + 3 * 2 = 284.
constexpr int64_t kMaxEntryAdvance = 284;
constexpr int64_t kSimdTail = kMaxEntryAdvance + 16;

#ifdef HIMG_SIMD_STATS
int64_t g_simd_steps = 0, g_simd_misses = 0, g_simd_retires = 0;
#endif

// One scalar symbol step on extracted lane state (fast-table miss: a
// long code or a class-260 run).  Runs advance only -- output pre-zeroed.
inline bool ScalarSymbolStep(const Decoder &d, const uint8_t *in,
                             int64_t in_total, int64_t &pos, uint64_t &acc,
                             int64_t &fill, uint8_t *out, int64_t &filled,
                             int64_t out_end) {
  auto refill = [&]() {
    while (fill <= 56) {
      uint64_t b = pos < in_total ? in[pos] : 0;
      acc |= b << fill;
      ++pos;
      fill += 8;
    }
  };
  refill();
  int symbol;
  const LutEntry &e = d.lut[acc & 0xFF];
  if (e.node < 0) {
    acc >>= e.bits;
    fill -= e.bits;
    symbol = e.symbol;
  } else {
    acc >>= 8;
    fill -= 8;
    int node = e.node;
    int steps = 0;
    while (d.nodes[node].symbol < 0) {
      if (fill == 0) refill();
      node = (acc & 1) ? d.nodes[node].child_b : d.nodes[node].child_a;
      acc >>= 1;
      --fill;
      if (++steps > 64) return false;  // corrupt table walk
    }
    symbol = d.nodes[node].symbol;
  }
  if (symbol <= 255) {
    if (filled >= out_end) return false;
    out[filled++] = static_cast<uint8_t>(symbol);
    return true;
  }
  refill();
  int64_t zeros;
  int eb = 0;
  switch (symbol) {
    case 256: zeros = 2; break;
    case 257: zeros = (acc & 3) + 3; eb = 2; break;
    case 258: zeros = (acc & 15) + 7; eb = 4; break;
    case 259: zeros = (acc & 255) + 23; eb = 8; break;
    case 260: zeros = (acc & 16383) + 279; eb = 14; break;
    default: return false;
  }
  acc >>= eb;
  fill -= eb;
  if (filled + zeros > out_end) return false;
  filled += zeros;  // output pre-zeroed
  return true;
}

// Decode 8 substreams in lockstep.  spans/out_base are per-lane
// (compressed offset, size) into `in` and output offsets into `out`;
// `out` must be zeroed over every lane's region.  Returns false on
// corrupt input.
bool DecodeGroupSimd(const Decoder &d, const uint8_t *in, int64_t in_total,
                     const std::pair<int64_t, int64_t> *spans,
                     const int64_t *out_base, int64_t block_size,
                     uint8_t *out) {
  alignas(64) int64_t a_pos[8], a_fill[8], a_filled[8], a_end[8], a_spanend[8];
  alignas(64) uint64_t a_acc[8];
  for (int i = 0; i < 8; ++i) {
    a_pos[i] = spans[i].first;
    a_spanend[i] = spans[i].first + spans[i].second;
    a_acc[i] = 0;
    a_fill[i] = 0;
    a_filled[i] = out_base[i];
    a_end[i] = out_base[i] + block_size;
  }
  __m512i pos = _mm512_load_si512(a_pos);
  __m512i fill = _mm512_load_si512(a_fill);
  __m512i filled = _mm512_load_si512(a_filled);
  const __m512i end = _mm512_load_si512(a_end);
  const __m512i span_end = _mm512_load_si512(a_spanend);
  __m512i acc = _mm512_setzero_si512();
  const __m512i v63 = _mm512_set1_epi64(63);
  const __m512i v56 = _mm512_set1_epi64(56);
  const __m512i lutmask = _mm512_set1_epi64((1u << d.lut_bits) - 1);
  const __m512i retire_at = _mm512_sub_epi64(end, _mm512_set1_epi64(kSimdTail));
  __mmask8 active = 0xFF;

  // Retire a lane set into the scalar resume loop (tail, table miss
  // fallback, runaway); false propagates corruption.
  auto retire = [&](__mmask8 m) -> bool {
    _mm512_store_si512(a_pos, pos);
    _mm512_store_si512(reinterpret_cast<__m512i *>(a_acc), acc);
    _mm512_store_si512(a_fill, fill);
    _mm512_store_si512(a_filled, filled);
    bool ok = true;
    for (int i = 0; i < 8; ++i) {
      if (!(m >> i & 1)) continue;
      const int64_t off = spans[i].first;
      ok = ok && a_fill[i] >= 0 &&
           DecodeStreamResume(d, in + off, spans[i].second, a_pos[i] - off,
                              a_acc[i], static_cast<int>(a_fill[i]),
                              out + out_base[i], a_filled[i] - out_base[i],
                              block_size);
    }
    active &= ~m;
    return ok;
  };

  // Initial refill: every lane starts empty (fill 0 -> claim 7 bytes).
  // Lanes whose 8-byte read-ahead would leave the input buffer (a tiny
  // final substream near the buffer end) go scalar immediately -- the
  // in-loop gathers have the same guard, but this first one must not
  // touch memory before it is applied (the chunk payload is a zero-copy
  // view whose end is the end of the container bytes).
  {
    __mmask8 moob = _mm512_mask_cmpgt_epi64_mask(
        active, _mm512_add_epi64(pos, _mm512_set1_epi64(8)),
        _mm512_set1_epi64(in_total));
    if (moob && !retire(moob)) return false;
    if (!active) return true;
    __m512i w = _mm512_mask_i64gather_epi64(
        _mm512_setzero_si512(), active, pos, in, 1);
    acc = _mm512_sllv_epi64(w, fill);  // fill == 0
    __m512i take = _mm512_srli_epi64(_mm512_sub_epi64(v63, fill), 3);
    pos = _mm512_add_epi64(pos, take);
    fill = _mm512_add_epi64(fill, _mm512_slli_epi64(take, 3));
  }

  while (active) {
#ifdef HIMG_SIMD_STATS
    ++g_simd_steps;
#endif
    // Lanes done or within the tail window: scalar-finish them.  (The
    // window also guarantees every vector store below stays inside the
    // lane's own region and that fast-path windows never contain
    // read-ahead garbage bits.)
    __mmask8 mtail = _mm512_mask_cmpgt_epi64_mask(active, filled, retire_at);
    // Runaway cursor (corrupt input): pos far past the span.  Lanes whose
    // read-ahead would leave the whole input buffer retire too (only
    // possible near the buffer's very end).
    mtail |= _mm512_mask_cmpgt_epi64_mask(
        active, pos, _mm512_add_epi64(span_end, _mm512_set1_epi64(16)));
    mtail |= _mm512_mask_cmpgt_epi64_mask(
        active, _mm512_add_epi64(pos, _mm512_set1_epi64(8)),
        _mm512_set1_epi64(in_total));
#ifdef HIMG_SIMD_STATS
    g_simd_retires += __builtin_popcount(mtail);
#endif
    if (mtail && !retire(mtail)) return false;
    if (!active) break;

    // Issue the NEXT refill's load now (independent of this lookup's
    // chain: pos is known at iteration start); it is applied after the
    // entry's bits are consumed, so the lutm gather below is the only
    // latency on the loop-carried path.
    __m512i w = _mm512_mask_i64gather_epi64(
        _mm512_setzero_si512(), active, pos, in, 1);

    // Fast-table lookup.
    __m512i idx = _mm512_and_epi64(acc, lutmask);
    __m512i e = _mm512_mask_i64gather_epi64(
        _mm512_setzero_si512(), active, idx, d.lutm, 8);
    __mmask8 mmiss = _mm512_mask_cmpeq_epi64_mask(
        active, e, _mm512_setzero_si512());
    if (mmiss) {
#ifdef HIMG_SIMD_STATS
      g_simd_misses += __builtin_popcount(mmiss);
#endif
      // Inline scalar symbol step (long code / 260-run), then rejoin.
      _mm512_store_si512(a_pos, pos);
      _mm512_store_si512(reinterpret_cast<__m512i *>(a_acc), acc);
      _mm512_store_si512(a_fill, fill);
      _mm512_store_si512(a_filled, filled);
      for (int i = 0; i < 8; ++i) {
        if (!(mmiss >> i & 1)) continue;
        if (!ScalarSymbolStep(d, in, in_total, a_pos[i], a_acc[i],
                              a_fill[i], out, a_filled[i], a_end[i]))
          return false;
      }
      pos = _mm512_load_si512(a_pos);
      acc = _mm512_load_si512(reinterpret_cast<const __m512i *>(a_acc));
      fill = _mm512_load_si512(a_fill);
      filled = _mm512_load_si512(a_filled);
    }
    __mmask8 mfast = active & ~mmiss;

    // Consume the entry's bits.
    __m512i nb = _mm512_and_epi64(e, v63);
    acc = _mm512_mask_srlv_epi64(acc, mfast, acc, nb);
    fill = _mm512_mask_sub_epi64(fill, mfast, fill, nb);

    // Pattern entries (the common case): one 8-byte scatter per lane --
    // bytes above the count are zero, so the store is idempotent over
    // the pre-zeroed output.  (Scalar extract+store loops measured
    // slower than the hardware scatter here: 12.1 vs 9.3 ms/frame.)
    __mmask8 mlit = mfast & ~_mm512_test_epi64_mask(
        e, _mm512_set1_epi64(0x40));
    if (mlit) {
      __m512i lits = _mm512_srli_epi64(e, 16);
      _mm512_mask_i64scatter_epi64(out, mlit, filled, lits, 1);
      __m512i cnt = _mm512_and_epi64(_mm512_srli_epi64(e, 8),
                                     _mm512_set1_epi64(7));
      filled = _mm512_mask_add_epi64(filled, mlit, filled, cnt);
    }

    // Item entries (contain a >6-byte run): up to 4 items, 12 bits each;
    // runs advance only (pre-zeroed output), literals store the byte as
    // a u32 (three zero bytes above -- invariant-safe, later items and
    // entries overwrite as needed).
    __mmask8 mrun = mfast & _mm512_test_epi64_mask(
        e, _mm512_set1_epi64(0x40));
    if (mrun) {
      __m512i items = _mm512_srli_epi64(e, 10);
      __m512i n = _mm512_and_epi64(_mm512_srli_epi64(e, 7),
                                   _mm512_set1_epi64(7));
      for (int k = 0; k < 4; ++k) {
        __mmask8 mk = mrun & _mm512_cmpgt_epi64_mask(
            n, _mm512_set1_epi64(k));
        if (!mk) break;
        __m512i it = _mm512_and_epi64(items, _mm512_set1_epi64(0xFFF));
        __mmask8 is_run = _mm512_mask_test_epi64_mask(
            mk, it, _mm512_set1_epi64(0x800));
        __mmask8 is_lit = mk & ~is_run;
        if (is_lit) {
          _mm512_mask_i64scatter_epi32(
              out, is_lit, filled,
              _mm512_cvtepi64_epi32(_mm512_and_epi64(
                  it, _mm512_set1_epi64(0xFF))), 1);
          filled = _mm512_mask_add_epi64(filled, is_lit, filled,
                                         _mm512_set1_epi64(1));
        }
        filled = _mm512_mask_add_epi64(
            filled, is_run, filled,
            _mm512_and_epi64(it, _mm512_set1_epi64(0x7FF)));
        items = _mm512_srli_epi64(items, 12);
      }
    }

    // Apply the prefetched refill to fast-path lanes now below 57
    // pending bits (missed lanes refilled inside their scalar step and
    // already advanced pos, so their stale `w` must not apply).
    __mmask8 mref = _mm512_mask_cmple_epi64_mask(mfast, fill, v56);
    acc = _mm512_mask_or_epi64(acc, mref, acc, _mm512_sllv_epi64(w, fill));
    __m512i take = _mm512_srli_epi64(_mm512_sub_epi64(v63, fill), 3);
    pos = _mm512_mask_add_epi64(pos, mref, pos, take);
    fill = _mm512_mask_add_epi64(fill, mref, fill,
                                 _mm512_slli_epi64(take, 3));
  }
  return true;
}

#endif  // HIMG_HAVE_AVX512BW

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

// A block tokenizes into *segments*: a stretch of literal bytes (re-read
// from the input at pack time -- no per-literal token is ever stored)
// followed by one zero run of >= 2 (zeros == 0 marks a trailing
// literal-only segment).  Single zeros stay inside literal stretches (the
// format codes a 1-run as literal symbol 0).  This keeps the token side
// memory traffic at ~8 bytes per *run* instead of 4 bytes per *byte*.
struct Seg {
  uint32_t lit;    // literal bytes preceding the run
  uint32_t zeros;  // run length (>= 2), or 0 for the block tail
};

// Worst-case segments per block: every segment except a leading (0, 2)
// covers >= 3 input bytes (lit >= 1 plus run >= 2, or a post-cap run of
// >= 2 preceded by a 16662-byte run).
inline int64_t MaxSegs(int64_t block_size) { return block_size / 3 + 4; }

// True when an 8-byte word contains a zero byte (Mycroft's trick).
inline bool HasZeroByte(uint64_t w) {
  return ((w - 0x0101010101010101ull) & ~w & 0x8080808080808080ull) != 0;
}

// Tokenize one block into `segs` (pre-sized to >= MaxSegs(block_size)) and
// bump the per-block 261-bin histogram; returns (seg_count, extra_bits)
// via out-params.  Dense literal stretches histogram 8 bytes per load;
// zero runs skip by 64-bit words.
// Tokenizer state shared by the SIMD and scalar paths.  Zero-run
// bookkeeping: runs are closed through CloseRun, which applies the
// kMaxRun cap exactly like the reference's per-run limit (a capped run
// restarts counting, so a 16663-zero run is run(16662) + literal 0) and
// leaves single zeros inside the literal stretch (symbol 0 is a literal).
struct TokState {
  Seg *sp;
  uint32_t *hist;
  int64_t lit_start = 0;      // absolute offset of the open literal stretch
  int64_t run_begin = 0;      // absolute offset of the open zero run
  int64_t cur_zrun = 0;       // length of the open zero run
  int64_t run_zeros = 0;      // zeros covered by emitted run segments
  int64_t extra_total = 0;

  inline void CloseRun() {
    int64_t r = cur_zrun;
    int64_t begin = run_begin;
    while (r >= 2) {
      int64_t z = std::min<int64_t>(r, kMaxRun);
      uint32_t extra;
      int ebits;
      int sym = RunSymbol(static_cast<int>(z), &extra, &ebits);
      hist[sym]++;
      extra_total += ebits;
      *sp++ = {static_cast<uint32_t>(begin - lit_start),
               static_cast<uint32_t>(z)};
      begin += z;
      lit_start = begin;
      run_zeros += z;
      r -= z;
      if (r == 1) break;  // leftover single zero stays a literal
    }
    cur_zrun = 0;
  }
};

// 8 striped histogram increments for one 8-byte word.
inline void HistWord(uint32_t h4[4][256], uint64_t w) {
  h4[0][static_cast<uint8_t>(w)]++;
  h4[1][static_cast<uint8_t>(w >> 8)]++;
  h4[2][static_cast<uint8_t>(w >> 16)]++;
  h4[3][static_cast<uint8_t>(w >> 24)]++;
  h4[0][static_cast<uint8_t>(w >> 32)]++;
  h4[1][static_cast<uint8_t>(w >> 40)]++;
  h4[2][static_cast<uint8_t>(w >> 48)]++;
  h4[3][static_cast<uint8_t>(w >> 56)]++;
}

inline void HistChunk(uint32_t h4[4][256], const uint8_t *p, int words) {
  for (int i = 0; i < words; ++i) {
    uint64_t w;
    std::memcpy(&w, p + 8 * i, 8);
    HistWord(h4, w);
  }
}

inline void TokenizeBlock(const uint8_t *blk, int64_t block_size,
                          Seg *segs, uint32_t *hist,
                          int64_t *n_segs, int64_t *extra_bits) {
  // 4-way striped literal histogram: planes repeat the same byte for long
  // stretches, so a single counter array serializes on store-to-load
  // forwarding; striping turns dependent increments into independent ones.
  // Zero bytes are histogrammed unconditionally in mixed chunks and
  // corrected at the end (hist[0] must count only single zeros).
  uint32_t h4[4][256] = {{0}};
  TokState st;
  st.sp = segs;
  st.hist = hist;
  int64_t zeros_hist = 0;  // zero bytes that went through h4
  int64_t zeros_all = 0;   // all zero bytes seen
  int64_t k = 0;

#if HIMG_HAVE_AVX512BW
  // 64-byte chunks, zero positions as one 64-bit compare mask.
  const __m512i vz = _mm512_setzero_si512();
  for (; k + 64 <= block_size; k += 64) {
    __m512i v = _mm512_loadu_si512(
        reinterpret_cast<const void *>(blk + k));
    uint64_t m = _mm512_cmpeq_epi8_mask(v, vz);
    if (m == 0) {                       // pure literal chunk
      if (st.cur_zrun) st.CloseRun();
      HistChunk(h4, blk + k, 8);
      continue;
    }
    if (m == ~0ull) {                   // pure zero chunk: extend the run
      if (st.cur_zrun == 0) st.run_begin = k;
      st.cur_zrun += 64;
      zeros_all += 64;
      continue;
    }
    HistChunk(h4, blk + k, 8);
    int pc = __builtin_popcountll(m);
    zeros_hist += pc;
    zeros_all += pc;
    // Branch-reduced run walk; same formulation (and A/B receipts) as
    // PackTokenizer::Run below.
    uint64_t starts = m & ~(m << 1);
    uint64_t ends = m & ~(m >> 1);
    if (m >> 63) ends &= ~(1ull << 63);
    if (st.cur_zrun) {
      if (m & 1) {                      // continuation closes here
        int e = __builtin_ctzll(~m);
        st.cur_zrun += e;
        st.CloseRun();
        starts &= starts - 1;           // its start bit (bit 0)
        ends &= ends - 1;               // its end bit (at e-1)
      } else {
        st.CloseRun();
      }
    }
    // Single zeros stay literal; strip them from both masks up front
    // (same A/B-adjudicated filter as PackTokenizer::Run below).
    uint64_t singles = starts & ends;
    starts ^= singles;
    ends ^= singles;
    while (ends) {
      int e = __builtin_ctzll(ends);
      ends &= ends - 1;
      int s = __builtin_ctzll(starts);
      starts &= starts - 1;
      int len = e - s + 1;              // >= 2 by construction
      uint32_t extra;
      int ebits;
      int sym = RunSymbol(len, &extra, &ebits);
      st.hist[sym]++;
      st.extra_total += ebits;
      *st.sp++ = {static_cast<uint32_t>(k + s - st.lit_start),
                  static_cast<uint32_t>(len)};
      st.lit_start = k + s + len;
      st.run_zeros += len;
    }
    if (starts) {                       // open run into the next chunk
      int s = __builtin_ctzll(starts);
      st.run_begin = k + s;
      st.cur_zrun = 64 - s;
    } else {
      st.cur_zrun = 0;
    }
  }
#elif HIMG_HAVE_SSE2
  const __m128i vzero = _mm_setzero_si128();
  for (; k + 16 <= block_size; k += 16) {
    __m128i v = _mm_loadu_si128(reinterpret_cast<const __m128i *>(blk + k));
    uint32_t m = static_cast<uint32_t>(
        _mm_movemask_epi8(_mm_cmpeq_epi8(v, vzero)));
    if (m == 0) {                       // pure literal chunk
      if (st.cur_zrun) st.CloseRun();
      HistChunk(h4, blk + k, 2);
      continue;
    }
    if (m == 0xFFFF) {                  // pure zero chunk: extend the run
      if (st.cur_zrun == 0) st.run_begin = k;
      st.cur_zrun += 16;
      zeros_all += 16;
      continue;
    }
    // Mixed chunk: histogram everything (zeros corrected later), then
    // the same branch-reduced walk + single-zero pre-filter as the
    // AVX-512 path above, on 16-bit masks (byte-checked against the
    // default build by tests/test_entropy.py's SSE2-build test).
    HistChunk(h4, blk + k, 2);
    int pc = __builtin_popcount(m);
    zeros_hist += pc;
    zeros_all += pc;
    uint32_t starts = m & ~(m << 1);
    uint32_t ends = m & ~(m >> 1);
    if (m >> 15) ends &= ~(1u << 15);
    if (st.cur_zrun) {
      if (m & 1) {                      // continuation closes here
        int e = __builtin_ctz(~m);
        st.cur_zrun += e;
        st.CloseRun();
        starts &= starts - 1;           // its start bit (bit 0)
        ends &= ends - 1;               // its end bit (at e-1)
      } else {
        st.CloseRun();
      }
    }
    uint32_t singles = starts & ends;
    starts ^= singles;
    ends ^= singles;
    while (ends) {
      int e = __builtin_ctz(ends);
      ends &= ends - 1;
      int s = __builtin_ctz(starts);
      starts &= starts - 1;
      int len = e - s + 1;              // >= 2 by construction
      uint32_t extra;
      int ebits;
      int sym = RunSymbol(len, &extra, &ebits);
      st.hist[sym]++;
      st.extra_total += ebits;
      *st.sp++ = {static_cast<uint32_t>(k + s - st.lit_start),
                  static_cast<uint32_t>(len)};
      st.lit_start = k + s + len;
      st.run_zeros += len;
    }
    if (starts) {                       // open run into the next chunk
      int s = __builtin_ctz(starts);
      st.run_begin = k + s;
      st.cur_zrun = 16 - s;
    } else {
      st.cur_zrun = 0;
    }
  }
#endif  // HIMG_HAVE_SSE2

  // Scalar tail (and full fallback without SSE2).
  for (; k < block_size; ++k) {
    uint8_t v = blk[k];
    if (v == 0) {
      if (st.cur_zrun == 0) st.run_begin = k;
      st.cur_zrun++;
      zeros_all++;
      continue;
    }
    if (st.cur_zrun) st.CloseRun();
    h4[k & 3][v]++;
  }
  if (st.cur_zrun) st.CloseRun();

  for (int s = 0; s < 256; ++s)
    hist[s] += h4[0][s] + h4[1][s] + h4[2][s] + h4[3][s];
  // h4 counted zeros_hist zeros into bin 0; only single zeros (all zeros
  // minus run-covered ones) are literal symbol 0.
  hist[0] += static_cast<uint32_t>((zeros_all - st.run_zeros) - zeros_hist);
  if (st.lit_start < block_size)
    *st.sp++ = {static_cast<uint32_t>(block_size - st.lit_start), 0};
  *n_segs = st.sp - segs;
  *extra_bits = st.extra_total;
}

constexpr uint64_t kMask56 = 0xFFFFFFFFFFFFFFull;

// Pair-code table: fused2[b0 | b1 << 8] = combined code for the two
// literal bytes (b0 first in the stream) in bits 0-55, total bits in
// 56-63.  Entries whose combined length exceeds 56 bits store 0xFF in
// the length byte (deep-tree fallback to singles).  One L2 load replaces
// two table loads plus a shift-combine per literal pair.
void BuildFused2(const uint64_t *fused, uint64_t *fused2) {
  for (int a = 0; a < 256; ++a) {
    uint64_t ea = fused[a];
    int ba = static_cast<int>(ea >> 56);
    uint64_t ca = ea & kMask56;
    for (int b = 0; b < 256; ++b) {
      uint64_t eb = fused[b];
      int bb = static_cast<int>(eb >> 56);
      int nb = ba + bb;
      fused2[a | (b << 8)] =
          nb <= 56 ? (ca | ((eb & kMask56) << ba) |
                      (static_cast<uint64_t>(nb) << 56))
                   : (0xFFull << 56);
    }
  }
}

// Pack one tokenized block into dst (which needs 8 bytes of slack past
// the final byte; callers use per-thread scratch).  Literal bytes come
// straight from the input two at a time through the fused2 pair table,
// runs from the segment list.
//
// All writer state lives in locals: byte stores through a uint8_t*
// alias *everything* in C++, so member-based state (the BitWriter) gets
// spilled and reloaded around every flush -- locals stay in registers.
// The writer flushes eagerly after every put (fill stays <= 7), which
// admits puts of up to 56 bits.  A trailing partial byte is merged with
// the pre-existing dst content (the stale-bit parity quirk).
inline void PackBlock(const uint8_t *blk, const Seg *segs, int64_t n_segs,
                      const uint64_t *fused, const uint64_t *fused2,
                      uint8_t *dst) {
  uint8_t *p = dst;
  uint64_t acc = 0;
  int fill = 0;
  auto put = [&](uint64_t v, int bits) {  // v clean, bits <= 56
    acc |= v << fill;
    fill += bits;
    std::memcpy(p, &acc, 8);
    p += fill >> 3;
    acc >>= (fill & ~7);
    fill &= 7;
  };
  const uint8_t *lp = blk;
  for (int64_t s = 0; s < n_segs; ++s) {
    const uint8_t *le = lp + segs[s].lit;
    for (; lp + 2 <= le; lp += 2) {
      uint16_t v;
      std::memcpy(&v, lp, 2);
      uint64_t e = fused2[v];
      int nb = static_cast<int>(e >> 56);
      if (nb <= 56) {
        put(e & kMask56, nb);
      } else {  // deep-tree fallback
        uint64_t e1 = fused[lp[0]], e2 = fused[lp[1]];
        put(e1 & kMask56, static_cast<int>(e1 >> 56));
        put(e2 & kMask56, static_cast<int>(e2 >> 56));
      }
    }
    if (lp != le) {
      uint64_t e = fused[*lp++];
      put(e & kMask56, static_cast<int>(e >> 56));
    }
    uint32_t z = segs[s].zeros;
    if (z) {
      uint32_t extra;
      int ebits;
      int sym = RunSymbol(static_cast<int>(z), &extra, &ebits);
      uint64_t e = fused[sym];
      int nb = static_cast<int>(e >> 56);
      put((e & kMask56) | (static_cast<uint64_t>(extra) << nb), nb + ebits);
      lp += z;
    }
  }
  // Merge the trailing partial byte with dst's pre-existing content.
  if (fill > 0) {
    uint8_t mask = static_cast<uint8_t>((1u << fill) - 1);
    *p = static_cast<uint8_t>((*p & ~mask) | (acc & mask));
  }
}

// Fused tokenize + pack: one SIMD zero-scan pass over the block that
// emits the bitstream directly -- no segment arena, no histogram, no
// second traversal.  Usable only when the code table is already known
// (he_compress_assisted: the 261-bin histogram came from the TPU).
//
// Emitted bits are identical to tokenize-then-PackBlock: the stream is
// the concatenation of per-token codes, and pair-table grouping cannot
// change it (fused2 entries are exactly two single codes concatenated).
// The trailing partial byte is stored RAW (no merge): the caller owns the
// stale-bit replay, because put()'s 8-byte spills clobber the scratch
// bytes a merge would need.  Returns the emitted bit count.
class PackTokenizer {
 public:
  PackTokenizer(const uint8_t *blk, const uint64_t *fused,
                const uint64_t *fused2, const uint64_t *runlut, uint8_t *dst)
      : blk_(blk), fused_(fused), fused2_(fused2), runlut_(runlut),
        dst_(dst), p_(dst) {}

  int64_t Run(int64_t block_size) {
    int64_t k = 0;
#if HIMG_HAVE_AVX512BW
    const __m512i vz = _mm512_setzero_si512();
    for (; k + 64 <= block_size; k += 64) {
      __m512i v = _mm512_loadu_si512(
          reinterpret_cast<const void *>(blk_ + k));
      uint64_t m = _mm512_cmpeq_epi8_mask(v, vz);
      if (m == 0) {                       // pure literal chunk
        if (cur_zrun_) CloseRun();
        continue;
      }
      if (m == ~0ull) {                   // pure zero chunk: extend the run
        if (cur_zrun_ == 0) run_begin_ = k;
        cur_zrun_ += 64;
        continue;
      }
      // Branch-reduced run walk (interleaved A/B min-of-12: 20.9 ->
      // 17.2 ms/frame vs the ctz-and-clear walk): run starts/ends come
      // from the mask's bit transitions and are popped lowest-first in
      // pairs -- one well-predicted loop branch per run instead of three
      // data-dependent ones.  A run touching bit 63 keeps its end bit
      // cleared and stays open; an open run entering at bit 0 closes at
      // the first transition (its start/end bits are popped before the
      // pair loop).  Local runs are <= 64 zeros, so they skip CloseRun's
      // kMaxRun cap loop and emit their symbol directly.
      uint64_t starts = m & ~(m << 1);
      uint64_t ends = m & ~(m >> 1);
      if (m >> 63) ends &= ~(1ull << 63);
      if (cur_zrun_) {
        if (m & 1) {                      // continuation closes here
          int e = __builtin_ctzll(~m);
          cur_zrun_ += e;
          CloseRun();
          starts &= starts - 1;           // its start bit (bit 0)
          ends &= ends - 1;               // its end bit (at e-1)
        } else {
          CloseRun();
        }
      }
      // Single zeros (start bit == end bit) stay literal; strip them
      // from both masks up front so the pair loop iterates only over
      // emittable runs — isolated zeros are a large share of the run
      // boundaries, and each cost two ctz+pop steps plus a branch here
      // (interleaved A/B min-of-20: 12.3 -> 10.5 ms/frame, +14%).
      uint64_t singles = starts & ends;
      starts ^= singles;
      ends ^= singles;
      while (ends) {
        int e = __builtin_ctzll(ends);
        ends &= ends - 1;
        int s = __builtin_ctzll(starts);
        starts &= starts - 1;
        int len = e - s + 1;              // >= 2 by construction
        EmitLits(blk_ + lit_start_, blk_ + k + s);
        uint64_t enc = runlut_[len];      // code|extra pre-combined
        Put(enc & kMask56, static_cast<int>(enc >> 56));
        lit_start_ = k + s + len;
      }
      if (starts) {                       // open run into the next chunk
        int s = __builtin_ctzll(starts);
        run_begin_ = k + s;
        cur_zrun_ = 64 - s;
      } else {
        cur_zrun_ = 0;
      }
    }
#elif HIMG_HAVE_SSE2
    const __m128i vzero = _mm_setzero_si128();
    for (; k + 16 <= block_size; k += 16) {
      __m128i v = _mm_loadu_si128(
          reinterpret_cast<const __m128i *>(blk_ + k));
      uint32_t m = static_cast<uint32_t>(
          _mm_movemask_epi8(_mm_cmpeq_epi8(v, vzero)));
      if (m == 0) {
        if (cur_zrun_) CloseRun();
        continue;
      }
      if (m == 0xFFFF) {
        if (cur_zrun_ == 0) run_begin_ = k;
        cur_zrun_ += 16;
        continue;
      }
      // Same branch-reduced walk + single-zero pre-filter as the
      // AVX-512 path, on 16-bit masks (byte-checked by the SSE2-build
      // test).
      uint32_t starts = m & ~(m << 1);
      uint32_t ends = m & ~(m >> 1);
      if (m >> 15) ends &= ~(1u << 15);
      if (cur_zrun_) {
        if (m & 1) {                      // continuation closes here
          int e = __builtin_ctz(~m);
          cur_zrun_ += e;
          CloseRun();
          starts &= starts - 1;           // its start bit (bit 0)
          ends &= ends - 1;               // its end bit (at e-1)
        } else {
          CloseRun();
        }
      }
      uint32_t singles = starts & ends;
      starts ^= singles;
      ends ^= singles;
      while (ends) {
        int e = __builtin_ctz(ends);
        ends &= ends - 1;
        int s = __builtin_ctz(starts);
        starts &= starts - 1;
        int len = e - s + 1;              // >= 2 by construction
        EmitLits(blk_ + lit_start_, blk_ + k + s);
        uint64_t enc = runlut_[len];      // code|extra pre-combined
        Put(enc & kMask56, static_cast<int>(enc >> 56));
        lit_start_ = k + s + len;
      }
      if (starts) {                       // open run into the next chunk
        int s = __builtin_ctz(starts);
        run_begin_ = k + s;
        cur_zrun_ = 16 - s;
      } else {
        cur_zrun_ = 0;
      }
    }
#endif
    for (; k < block_size; ++k) {          // scalar tail / fallback
      if (blk_[k] == 0) {
        if (cur_zrun_ == 0) run_begin_ = k;
        cur_zrun_++;
        continue;
      }
      if (cur_zrun_) CloseRun();
    }
    if (cur_zrun_) CloseRun();
    EmitLits(blk_ + lit_start_, blk_ + block_size);
    // Store the trailing partial byte raw (low bits valid; caller merges
    // the stale high bits from its replay buffer).
    if (fill_ > 0) *p_ = static_cast<uint8_t>(acc_);
    return (p_ - dst_) * 8 + fill_;
  }

 private:
  inline void Put(uint64_t v, int bits) {  // v clean, bits <= 56
    acc_ |= v << fill_;
    fill_ += bits;
    std::memcpy(p_, &acc_, 8);
    p_ += fill_ >> 3;
    acc_ >>= (fill_ & ~7);
    fill_ &= 7;
  }

  inline void EmitLits(const uint8_t *lp, const uint8_t *le) {
    for (; lp + 2 <= le; lp += 2) {
      uint16_t v;
      std::memcpy(&v, lp, 2);
      uint64_t e = fused2_[v];
      int nb = static_cast<int>(e >> 56);
      if (nb <= 56) {
        Put(e & kMask56, nb);
      } else {  // deep-tree fallback
        uint64_t e1 = fused_[lp[0]], e2 = fused_[lp[1]];
        Put(e1 & kMask56, static_cast<int>(e1 >> 56));
        Put(e2 & kMask56, static_cast<int>(e2 >> 56));
      }
    }
    if (lp != le) {
      uint64_t e = fused_[*lp];
      Put(e & kMask56, static_cast<int>(e >> 56));
    }
  }

  // Close the open zero run: emit the pending literal stretch, then the
  // run's chunk symbols (kMaxRun cap exactly like TokState::CloseRun); a
  // chunk leftover of one zero is emitted as literal 0, which produces
  // the same bits as leaving it for the next literal stretch.
  inline void CloseRun() {
    int64_t r = cur_zrun_;
    if (r >= 2) {
      EmitLits(blk_ + lit_start_, blk_ + run_begin_);
      int64_t begin = run_begin_;
      while (r >= 2) {
        int64_t z = std::min<int64_t>(r, kMaxRun);
        uint32_t extra;
        int ebits;
        int sym = RunSymbol(static_cast<int>(z), &extra, &ebits);
        uint64_t e = fused_[sym];
        int nb = static_cast<int>(e >> 56);
        Put((e & kMask56) | (static_cast<uint64_t>(extra) << nb), nb + ebits);
        begin += z;
        r -= z;
        if (r == 1) {
          uint64_t e0 = fused_[0];
          Put(e0 & kMask56, static_cast<int>(e0 >> 56));
          begin += 1;
          r = 0;
        }
      }
      lit_start_ = begin;
    }
    // cur_zrun_ == 1: the single zero stays inside the literal stretch.
    cur_zrun_ = 0;
  }

  const uint8_t *blk_;
  const uint64_t *fused_;
  const uint64_t *fused2_;
  const uint64_t *runlut_;
  uint8_t *dst_;
  uint8_t *p_;
  uint64_t acc_ = 0;
  int fill_ = 0;
  int64_t lit_start_ = 0;
  int64_t run_begin_ = 0;
  int64_t cur_zrun_ = 0;
};

// --------------------------------------------------------------------------
// Lockstep SIMD encode pack: 8 substreams per AVX-512 register set.
//
// The fused scalar scan+pack is chain-bound on literal emission (~2.8M
// sequential Puts/frame; docs/ARCHITECTURE.md round-3 splits).  The
// decode-side cure -- 8 data-parallel lanes -- applies here with a
// structural advantage: the put chain, unlike the decode chain, feeds no
// table lookup.  Every gather below (input word, pair table, run table,
// segment list) depends only on the cheap cursor chain, so steps pipeline
// at gather/scatter throughput instead of serializing on load latency.
//
// Tokenization is folded INTO the lockstep loop (a first cut with a
// separate segment-scan pass measured -14%: the scan re-paid the memory
// traffic the fused scalar pass already amortizes).  Each step gathers
// one 8-byte window per lane; a vector byte-compare yields the window's
// zero map, per-lane VPLZCNTQ arithmetic turns it into leading-literal /
// leading-zero counts, and each lane emits one put: up to 4 literals via
// the pair table (two entries register-combined when their widths fit),
// a zero-run close via the full-range run LUT, or a pure cursor advance
// while a run extends across windows.  The per-lane (acc, fill, pos)
// writers keep the exact eager-flush store pattern of the scalar Put,
// with one 8-byte scatter per step into per-lane scratch.
//
// Emitted bits are identical to the scalar packer's: the stream is the
// concatenation of per-token codes; neither pair grouping nor pair
// alignment can change it, a lone zero is literal symbol 0 on both
// paths, and run closes follow the same kMaxRun cap rule.  Lanes whose
// window would cross their block end retire into a scalar byte-loop
// finisher (bounded tail work).
// --------------------------------------------------------------------------

// Pre-combined run payloads for every legal length (2..kMaxRun):
// code | extra << nb, total bits in the top byte.  nb <= kMaxCodeBits=42
// plus <= 14 extra bits fits the 56-bit Put ceiling.  (PackTokenizer's
// in-chunk walk indexes only lengths <= 64 of this same table.)
void BuildRunLutFull(const uint64_t *fused, uint64_t *runlut) {
  runlut[0] = 0;
  // A 1-zero "stretch" codes as literal symbol 0 (the format's rule);
  // fused[] shares the code|bits<<56 layout.  The SIMD packer closes a
  // carried run of 1 (a lone zero at a window edge) through this entry.
  runlut[1] = fused[0];
  for (int len = 2; len <= kMaxRun; ++len) {
    uint32_t extra;
    int ebits;
    int sym = RunSymbol(len, &extra, &ebits);
    uint64_t e = fused[sym];
    int nb = static_cast<int>(e >> 56);
    runlut[len] = (e & kMask56) | (static_cast<uint64_t>(extra) << nb) |
                  (static_cast<uint64_t>(nb + ebits) << 56);
  }
}

#if HIMG_HAVE_AVX512BW && defined(__AVX512CD__)
#define HIMG_HAVE_SIMD_ENC 1

#ifdef HIMG_SIMD_STATS
int64_t g_enc_steps = 0, g_enc_lanes = 0, g_enc_one = 0, g_enc_pair = 0,
        g_enc_comb = 0, g_enc_ext = 0, g_enc_close = 0;
#endif

// Mid-pack lane state extracted from the vector registers.
struct LanePack {
  int64_t inpos;    // absolute input cursor
  int64_t carried;  // open zero-run length (0 = none)
  int64_t pos;      // byte cursor into the lane's scratch
  uint64_t acc;
  int64_t fill;
};

// Finish one lane's remaining bytes with the scalar byte loop (the
// window no longer fits its block).  Closes the open run with the same
// cap rule as PackTokenizer::CloseRun.  Returns the final bit count.
int64_t ScalarPackFinish(const uint8_t *in, int64_t blk_end,
                         const uint64_t *fused, const uint64_t *runlut,
                         uint8_t *dst, LanePack st) {
  uint8_t *p = dst + st.pos;
  uint64_t acc = st.acc;
  int fill = static_cast<int>(st.fill);
  auto put = [&](uint64_t v, int bits) {  // v clean, bits <= 56
    acc |= v << fill;
    fill += bits;
    std::memcpy(p, &acc, 8);
    p += fill >> 3;
    acc >>= (fill & ~7);
    fill &= 7;
  };
  int64_t run = st.carried;
  auto close_run = [&]() {
    while (run >= 2) {
      int64_t z = std::min<int64_t>(run, kMaxRun);
      uint64_t e = runlut[z];
      put(e & kMask56, static_cast<int>(e >> 56));
      run -= z;
      if (run == 1) break;  // capped-run leftover: literal 0 below
    }
    if (run == 1) {  // lone zero codes as literal symbol 0
      uint64_t e0 = fused[0];
      put(e0 & kMask56, static_cast<int>(e0 >> 56));
    }
    run = 0;
  };
  for (; st.inpos < blk_end; ++st.inpos) {
    uint8_t v = in[st.inpos];
    if (v == 0) {
      ++run;
      continue;
    }
    if (run) close_run();
    uint64_t e = fused[v];
    put(e & kMask56, static_cast<int>(e >> 56));
  }
  if (run) close_run();
  if (fill > 0) *p = static_cast<uint8_t>(acc);
  return (p - dst) * 8 + fill;
}

// Pack 8 equal-size blocks in lockstep into per-lane scratch slots
// (lane_stride bytes apart, each with >= 8 bytes of slack past any
// reachable cursor).  Writes each lane's exact bit count to out_bits.
void PackGroupSimd(const uint8_t *in, const int64_t *blk_off,
                   int64_t block_size, const uint64_t *fused,
                   const uint64_t *fused2, const uint64_t *runlut,
                   uint8_t *scratch, int64_t lane_stride,
                   int64_t *out_bits) {
  alignas(64) int64_t a_inpos[8], a_carried[8], a_pos[8], a_fill[8],
      a_end[8], a_lane[8], a_total[8];
  alignas(64) uint64_t a_acc[8];
  for (int i = 0; i < 8; ++i) {
    a_inpos[i] = blk_off[i];
    a_end[i] = blk_off[i] + block_size;
    a_lane[i] = i * lane_stride;
  }
  __m512i inpos = _mm512_load_si512(a_inpos);
  __m512i carried = _mm512_setzero_si512();
  __m512i pos = _mm512_setzero_si512();
  __m512i fill = _mm512_setzero_si512();
  __m512i acc = _mm512_setzero_si512();
  const __m512i vend = _mm512_load_si512(a_end);
  const __m512i lane = _mm512_load_si512(a_lane);
  const __m512i vzero = _mm512_setzero_si512();
  const __m512i v1 = _mm512_set1_epi64(1);
  const __m512i v7 = _mm512_set1_epi64(7);
  const __m512i v8 = _mm512_set1_epi64(8);
  const __m512i v63 = _mm512_set1_epi64(63);
  const __m512i vmask56 = _mm512_set1_epi64(static_cast<int64_t>(kMask56));
  __mmask8 active = 0xFF;

  auto retire = [&](__mmask8 m) {
    _mm512_store_si512(a_inpos, inpos);
    _mm512_store_si512(a_carried, carried);
    _mm512_store_si512(a_pos, pos);
    _mm512_store_si512(a_fill, fill);
    _mm512_store_si512(reinterpret_cast<__m512i *>(a_acc), acc);
    for (int i = 0; i < 8; ++i) {
      if (!(m >> i & 1)) continue;
      LanePack st{a_inpos[i], a_carried[i], a_pos[i], a_acc[i], a_fill[i]};
      out_bits[i] = ScalarPackFinish(in, a_end[i], fused, runlut,
                                     scratch + i * lane_stride, st);
    }
    active &= static_cast<__mmask8>(~m);
  };

  // Per-lane index of the lowest 0xFF byte of t (t's bytes are
  // 0x00/0xFF): isolate the lowest set bit, VPLZCNTQ it; 8 when t == 0.
  auto byte_ctz = [&](__m512i t) {
    __m512i lo = _mm512_and_epi64(t, _mm512_sub_epi64(vzero, t));
    __m512i lz = _mm512_lzcnt_epi64(lo);  // 64 for t == 0
    __m512i idx = _mm512_srli_epi64(_mm512_sub_epi64(v63, lz), 3);
    return _mm512_mask_mov_epi64(idx, _mm512_cmpeq_epi64_mask(t, vzero),
                                 v8);
  };

  while (active) {
#ifdef HIMG_SIMD_STATS
    ++g_enc_steps;
    g_enc_lanes += __builtin_popcount(active);
#endif
    // Lanes whose 8-byte window would cross their block end finish
    // scalar (bounded tail work; also closes any open run).
    __mmask8 mnear = _mm512_mask_cmpgt_epi64_mask(
        active, _mm512_add_epi64(inpos, v8), vend);
    if (mnear) retire(mnear);
    if (!active) break;

    __m512i w = _mm512_mask_i64gather_epi64(vzero, active, inpos, in, 1);
    // Zero-byte map of each lane's window, as 0x00/0xFF bytes.
    __m512i zb = _mm512_movm_epi8(_mm512_cmpeq_epi8_mask(w, vzero));
    // A zero byte BLOCKS literal pairing only when it can start a >= 2
    // run: a zero neighbour on either side, or the window's last byte
    // (continuation unknown -- conservative, resolved next step).  Lone
    // zeros are literal symbol 0 and ride the pair table like any byte.
    __m512i blocking = _mm512_and_si512(
        zb, _mm512_or_si512(
                _mm512_or_si512(_mm512_slli_epi64(zb, 8),
                                _mm512_srli_epi64(zb, 8)),
                _mm512_set1_epi64(
                    static_cast<int64_t>(0xFF00000000000000ull))));
    __m512i nlit = byte_ctz(blocking);  // pairable bytes this window
    __m512i nzmask = _mm512_andnot_si512(zb, _mm512_set1_epi8(-1));
    __m512i nz = byte_ctz(nzmask);  // zero bytes before the first nonzero

    __mmask8 mrunmode =
        _mm512_mask_cmpgt_epi64_mask(active, carried, vzero);
    __mmask8 mfresh = static_cast<__mmask8>(active & ~mrunmode);
    // Fresh lanes whose window starts on a blocking zero take the run
    // logic (nlit == 0 implies zeros at positions 0 and 1, so nz >= 2,
    // except a lone zero in the last window byte -- nz == 1 -- which
    // steps forward as a single literal).
    __mmask8 mz = _mm512_mask_cmpeq_epi64_mask(mfresh, nlit, vzero);
    __mmask8 mzrun = _mm512_mask_cmpgt_epi64_mask(mz, nz, v1);
    // Run extension: the whole window is zero.
    __mmask8 mext = _mm512_mask_cmpeq_epi64_mask(
        static_cast<__mmask8>(mrunmode | mzrun), nz, v8);
    carried = _mm512_mask_add_epi64(carried, mext, carried, v8);
    // Run close: the run ends inside the window (nz may be 0 for a
    // carried run whose window starts with a literal).
    __mmask8 mclose = static_cast<__mmask8>((mrunmode | mzrun) & ~mext);
    __m512i total = _mm512_mask_add_epi64(vzero, mclose, carried, nz);
    __mmask8 mbig = _mm512_mask_cmpgt_epi64_mask(
        mclose, total, _mm512_set1_epi64(kMaxRun));
    carried = _mm512_mask_mov_epi64(carried, mclose, vzero);

    // Literal lanes emit one put covering as much of the window as the
    // 56-bit ceiling allows: up to four pair-table entries, the odd
    // trailing byte, and -- when the zero stretch after the literals
    // closes inside the window -- its run code, all register-combined.
    // A deep entry's 0xFF width fails every fit check, so deep pairs
    // stop the tier chain naturally; only a deep FIRST pair needs the
    // explicit demotion to a single literal.
    __mmask8 mlit = static_cast<__mmask8>((mfresh & ~mz) | (mz & ~mzrun));
    const __m512i vff = _mm512_set1_epi64(0xFFFF);
    __mmask8 mge2 = _mm512_mask_cmpgt_epi64_mask(mlit, nlit, v1);
    __mmask8 mge4 = _mm512_mask_cmpgt_epi64_mask(
        mlit, nlit, _mm512_set1_epi64(3));
    __mmask8 mge6 = _mm512_mask_cmpgt_epi64_mask(
        mlit, nlit, _mm512_set1_epi64(5));
    __mmask8 mge8 = _mm512_mask_cmpgt_epi64_mask(
        mlit, nlit, _mm512_set1_epi64(7));
    __m512i ea = _mm512_mask_i64gather_epi64(
        vzero, mge2, _mm512_and_epi64(w, vff), fused2, 8);
    __m512i eb = _mm512_mask_i64gather_epi64(
        vzero, mge4, _mm512_and_epi64(_mm512_srli_epi64(w, 16), vff),
        fused2, 8);
    __m512i ec = _mm512_mask_i64gather_epi64(
        vzero, mge6, _mm512_and_epi64(_mm512_srli_epi64(w, 32), vff),
        fused2, 8);
    __m512i ed = _mm512_mask_i64gather_epi64(
        vzero, mge8, _mm512_srli_epi64(w, 48), fused2, 8);
    __m512i na = _mm512_srli_epi64(ea, 56);
    __m512i n2 = _mm512_add_epi64(na, _mm512_srli_epi64(eb, 56));
    __m512i n3 = _mm512_add_epi64(n2, _mm512_srli_epi64(ec, 56));
    __m512i n4 = _mm512_add_epi64(n3, _mm512_srli_epi64(ed, 56));
    __mmask8 mdeepa = _mm512_mask_cmpeq_epi64_mask(
        mge2, na, _mm512_set1_epi64(0xFF));
    mge2 &= static_cast<__mmask8>(~mdeepa);
    const __m512i v56 = _mm512_set1_epi64(56);
    __mmask8 t2 = static_cast<__mmask8>(
        mge4 & ~mdeepa & _mm512_cmple_epi64_mask(n2, v56));
    __mmask8 t3 = static_cast<__mmask8>(
        mge6 & t2 & _mm512_cmple_epi64_mask(n3, v56));
    __mmask8 t4 = static_cast<__mmask8>(
        mge8 & t3 & _mm512_cmple_epi64_mask(n4, v56));
    __m512i e1 = _mm512_mask_i64gather_epi64(
        vzero, mdeepa, _mm512_and_epi64(w, _mm512_set1_epi64(0xFF)),
        fused, 8);

    // Pair-tier payload/width/advance (tiers overwrite upwards;
    // t4 c t3 c t2 c mge2 by construction).  nlit == 1 lanes stay at
    // zero here and are completed by the tail append below.
    __m512i pay =
        _mm512_maskz_mov_epi64(mdeepa, _mm512_and_epi64(e1, vmask56));
    __m512i nbits =
        _mm512_maskz_mov_epi64(mdeepa, _mm512_srli_epi64(e1, 56));
    __m512i adv = _mm512_maskz_mov_epi64(mdeepa, v1);
    pay = _mm512_mask_mov_epi64(pay, mge2, _mm512_and_epi64(ea, vmask56));
    nbits = _mm512_mask_mov_epi64(nbits, mge2, na);
    adv = _mm512_mask_mov_epi64(adv, mge2, _mm512_set1_epi64(2));
    __m512i pay2 = _mm512_or_epi64(
        _mm512_and_epi64(ea, vmask56),
        _mm512_sllv_epi64(_mm512_and_epi64(eb, vmask56), na));
    pay = _mm512_mask_mov_epi64(pay, t2, pay2);
    nbits = _mm512_mask_mov_epi64(nbits, t2, n2);
    adv = _mm512_mask_mov_epi64(adv, t2, _mm512_set1_epi64(4));
    __m512i pay3 = _mm512_or_epi64(
        pay2, _mm512_sllv_epi64(_mm512_and_epi64(ec, vmask56), n2));
    pay = _mm512_mask_mov_epi64(pay, t3, pay3);
    nbits = _mm512_mask_mov_epi64(nbits, t3, n3);
    adv = _mm512_mask_mov_epi64(adv, t3, _mm512_set1_epi64(6));
    __m512i pay4 = _mm512_or_epi64(
        pay3, _mm512_sllv_epi64(_mm512_and_epi64(ed, vmask56), n3));
    pay = _mm512_mask_mov_epi64(pay, t4, pay4);
    nbits = _mm512_mask_mov_epi64(nbits, t4, n4);
    adv = _mm512_mask_mov_epi64(adv, t4, v8);

    // Odd-tail append: lanes whose every full pair fitted add the
    // trailing literal (this also covers nlit == 1, whose "pairs" part
    // is empty; single codes are <= 42 bits, so they always fit there).
    __m512i oddv = _mm512_and_epi64(nlit, v1);
    __mmask8 full_pairs = static_cast<__mmask8>(
        (mlit & ~mdeepa) &
        _mm512_cmpeq_epi64_mask(adv, _mm512_sub_epi64(nlit, oddv)));
    __mmask8 mtail = full_pairs & _mm512_test_epi64_mask(nlit, v1);
    __m512i tbyte = _mm512_and_epi64(
        _mm512_srlv_epi64(
            w, _mm512_slli_epi64(_mm512_sub_epi64(nlit, v1), 3)),
        _mm512_set1_epi64(0xFF));
    __m512i et = _mm512_mask_i64gather_epi64(vzero, mtail, tbyte, fused, 8);
    __m512i wt = _mm512_add_epi64(nbits, _mm512_srli_epi64(et, 56));
    __mmask8 tail_ok =
        static_cast<__mmask8>(mtail & _mm512_cmple_epi64_mask(wt, v56));
    pay = _mm512_mask_or_epi64(
        pay, tail_ok, pay,
        _mm512_sllv_epi64(_mm512_and_epi64(et, vmask56), nbits));
    nbits = _mm512_mask_mov_epi64(nbits, tail_ok, wt);
    adv = _mm512_mask_add_epi64(adv, tail_ok, adv, v1);

    // Full-literal lanes look past their literals: a zero stretch that
    // closes inside the window appends its run code when it fits; one
    // that reaches the window edge becomes the carried run.
    __mmask8 full_emit = static_cast<__mmask8>(
        full_pairs & (~mtail | tail_ok));
    __m512i shifted = _mm512_srlv_epi64(nzmask, _mm512_slli_epi64(nlit, 3));
    __m512i nz2 = byte_ctz(shifted);
    __mmask8 closes = static_cast<__mmask8>(
        full_emit & _mm512_cmplt_epi64_mask(_mm512_add_epi64(nlit, nz2),
                                            v8));
    // One run-LUT gather serves both the carried-run closes and the
    // literal-step appends (disjoint lanes).
    __mmask8 mrunput = static_cast<__mmask8>(mclose & ~mbig);
    __m512i runidx = _mm512_maskz_mov_epi64(closes, nz2);
    runidx = _mm512_mask_mov_epi64(runidx, mrunput, total);
    __m512i er = _mm512_mask_i64gather_epi64(
        vzero, static_cast<__mmask8>(mrunput | closes), runidx, runlut, 8);
    __m512i wr = _mm512_add_epi64(nbits, _mm512_srli_epi64(er, 56));
    __mmask8 run_ok =
        static_cast<__mmask8>(closes & _mm512_cmple_epi64_mask(wr, v56));
    pay = _mm512_mask_or_epi64(
        pay, run_ok, pay,
        _mm512_sllv_epi64(_mm512_and_epi64(er, vmask56), nbits));
    nbits = _mm512_mask_mov_epi64(nbits, run_ok, wr);
    adv = _mm512_mask_mov_epi64(adv, run_ok, _mm512_add_epi64(nlit, nz2));
    __mmask8 medge = static_cast<__mmask8>(full_emit & ~closes);
    carried = _mm512_mask_add_epi64(carried, medge, carried,
                                    _mm512_sub_epi64(v8, nlit));
    adv = _mm512_mask_mov_epi64(adv, medge, v8);
#ifdef HIMG_SIMD_STATS
    g_enc_one += __builtin_popcount(mdeepa | (mtail & ~tail_ok));
    g_enc_pair += __builtin_popcount(mge2 & ~t2);
    g_enc_comb += __builtin_popcount(run_ok | tail_ok);
    g_enc_ext += __builtin_popcount(mext | medge);
    g_enc_close += __builtin_popcount(mclose | (closes & ~run_ok));
#endif

    // Carried-run close lanes: the run code is the whole put.
    pay = _mm512_mask_mov_epi64(pay, mrunput,
                                _mm512_and_epi64(er, vmask56));
    nbits = _mm512_mask_mov_epi64(nbits, mrunput, _mm512_srli_epi64(er, 56));
    adv = _mm512_mask_mov_epi64(adv, mclose, nz);
    adv = _mm512_mask_mov_epi64(adv, mext, v8);

    // The put, vectorized: identical store pattern to the scalar Put
    // (eager flush, 8-byte store at the pre-advance cursor).  Extension
    // lanes carry zero width; their re-store is idempotent.
    acc = _mm512_or_epi64(acc, _mm512_sllv_epi64(pay, fill));
    fill = _mm512_add_epi64(fill, nbits);
    _mm512_mask_i64scatter_epi64(scratch, active,
                                 _mm512_add_epi64(lane, pos), acc, 1);
    pos = _mm512_add_epi64(pos, _mm512_srli_epi64(fill, 3));
    acc = _mm512_srlv_epi64(acc, _mm512_andnot_epi64(v7, fill));
    fill = _mm512_and_epi64(fill, v7);
    inpos = _mm512_add_epi64(inpos, adv);

    // Over-cap run close (> kMaxRun zeros): scalar emission of the
    // capped pieces; reachable only via multi-kilobyte in-block runs.
    if (mbig) {
      _mm512_store_si512(a_pos, pos);
      _mm512_store_si512(a_fill, fill);
      _mm512_store_si512(reinterpret_cast<__m512i *>(a_acc), acc);
      _mm512_store_si512(a_total, total);
      for (int i = 0; i < 8; ++i) {
        if (!(mbig >> i & 1)) continue;
        uint8_t *dst = scratch + i * lane_stride;
        uint8_t *p = dst + a_pos[i];
        uint64_t lacc = a_acc[i];
        int lfill = static_cast<int>(a_fill[i]);
        int64_t r = a_total[i];
        while (r >= 2) {
          int64_t z = std::min<int64_t>(r, kMaxRun);
          uint64_t e = z <= kMaxRun ? runlut[z] : 0;
          lacc |= (e & kMask56) << lfill;
          lfill += static_cast<int>(e >> 56);
          std::memcpy(p, &lacc, 8);
          p += lfill >> 3;
          lacc >>= (lfill & ~7);
          lfill &= 7;
          r -= z;
          if (r == 1) {  // capped-run leftover: literal 0
            uint64_t e0 = fused[0];
            lacc |= (e0 & kMask56) << lfill;
            lfill += static_cast<int>(e0 >> 56);
            std::memcpy(p, &lacc, 8);
            p += lfill >> 3;
            lacc >>= (lfill & ~7);
            lfill &= 7;
            r = 0;
          }
        }
        a_pos[i] = p - dst;
        a_acc[i] = lacc;
        a_fill[i] = lfill;
      }
      pos = _mm512_load_si512(a_pos);
      fill = _mm512_load_si512(a_fill);
      acc = _mm512_load_si512(reinterpret_cast<const __m512i *>(a_acc));
    }
  }
}

#endif  // HIMG_HAVE_AVX512BW && __AVX512CD__

// The single-pass packers admit at most 56 bits per Put (eager flush keeps
// fill <= 7), so codes deeper than 42 bits (+14 extra) would corrupt the
// stream.  Reaching depth 43 requires ~Fibonacci-growth symbol counts over
// hundreds of MB -- unreachable for real content -- but enforce it so the
// invariant is checked, not assumed.
constexpr int kMaxCodeBits = 42;

bool CodeDepthOk(const int8_t *bits) {
  for (int s = 0; s < kNumSymbols; ++s)
    if (bits[s] > kMaxCodeBits) return false;
  return true;
}

// Pass 1 shared by he_compress and he_pack_with_code: tokenize every
// block into the segment arena with per-block histograms, threaded over
// block ranges.  Keeping one copy is what guarantees the sharded path
// stays byte-identical to the single-host path when the tokenizer
// changes.
struct Tokenized {
  int64_t seg_stride;
  std::unique_ptr<Seg[]> seg_arena;  // uninitialized on purpose
  std::vector<int64_t> seg_count;
  std::vector<uint32_t> block_hist;  // n_blocks x kNumSymbols
  std::vector<int64_t> block_extra_bits;
  int n_threads;
};

Tokenized TokenizeAll(const uint8_t *in, int64_t block_size,
                      int64_t n_blocks) {
  Tokenized tk;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  tk.n_threads = std::max(1, std::min<int>(hw, static_cast<int>(
      std::min<int64_t>(n_blocks, 16))));
  tk.seg_stride = MaxSegs(block_size);
  // One flat *uninitialized* arena (a value-initialized vector would
  // memset multiple MB for nothing).
  tk.seg_arena.reset(new Seg[tk.seg_stride * n_blocks]);
  tk.seg_count.resize(n_blocks);
  tk.block_hist.assign(n_blocks * kNumSymbols, 0);
  tk.block_extra_bits.resize(n_blocks);
  std::atomic<int64_t> next_blk(0);
  auto tok_worker = [&]() {
    while (true) {
      int64_t b = next_blk.fetch_add(1, std::memory_order_relaxed);
      if (b >= n_blocks) break;
      TokenizeBlock(in + b * block_size, block_size,
                    tk.seg_arena.get() + b * tk.seg_stride,
                    tk.block_hist.data() + b * kNumSymbols,
                    &tk.seg_count[b], &tk.block_extra_bits[b]);
    }
  };
  std::vector<std::thread> ts;
  for (int t = 1; t < tk.n_threads; ++t) ts.emplace_back(tok_worker);
  tok_worker();
  for (auto &t : ts) t.join();
  return tk;
}

// Exact per-block bit sizes from the per-block histograms (a 261-entry
// dot product with the code lengths instead of a second token pass).
inline int64_t BlockBits(const Tokenized &tk, int64_t b,
                         const int8_t *code_bits) {
  int64_t bits = tk.block_extra_bits[b];
  const uint32_t *h = tk.block_hist.data() + b * kNumSymbols;
  for (int s = 0; s < kNumSymbols; ++s)
    bits += static_cast<int64_t>(h[s]) * code_bits[s];
  return bits;
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

  Tokenized tk = TokenizeAll(in, block_size, n_blocks);
  const int64_t seg_stride = tk.seg_stride;
  const Seg *seg_arena = tk.seg_arena.get();
  const int n_threads = tk.n_threads;
  pt.lap(kPhTokenize, "tokenize");
  int64_t hist[kNumSymbols] = {0};
  for (int64_t b = 0; b < n_blocks; ++b)
    for (int s = 0; s < kNumSymbols; ++s)
      hist[s] += tk.block_hist[b * kNumSymbols + s];

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
  if (!CodeDepthOk(table.bits)) return -3;
  const int64_t head_bytes = head.byte_count();

  // Fused per-symbol (code | bits<<56) pack table + the pair table.
  uint64_t fused[kNumSymbols];
  for (int s = 0; s < kNumSymbols; ++s)
    fused[s] = static_cast<uint64_t>(table.code[s]) |
               (static_cast<uint64_t>(table.bits[s]) << 56);
  std::vector<uint64_t> fused2(65536);
  BuildFused2(fused, fused2.data());

  std::vector<int64_t> bit_sizes(n_blocks);
  for (int64_t b = 0; b < n_blocks; ++b)
    bit_sizes[b] = BlockBits(tk, b, table.bits);
  pt.lap(kPhTree, "tree+sizes");
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
        PackBlock(in + b * block_size, seg_arena + b * seg_stride,
                  tk.seg_count[b], fused, fused2.data(), scratch.data());
        std::memcpy(dst, scratch.data(), static_cast<size_t>(packed));
      }
    };
    std::vector<std::thread> ts;
    for (int t = 1; t < n_threads; ++t) ts.emplace_back(pack_worker);
    pack_worker();
    for (auto &t : ts) t.join();
  }

  pt.lap(kPhPack, "pack");
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
  pt.lap(kPhFixup, "fixup");
  return offsets[n_blocks];
}

// Export of the last call's phase timings (ms): [tokenize, tree+sizes,
// pack, fixup, tree+lut, decode].  Receipts for tools/microbench entropy.
void he_last_phase_ms(double *out6) {
  std::memcpy(out6, g_phase_ms, sizeof(g_phase_ms));
}

// Compress with an externally supplied 261-bin token histogram (the
// TPU-assisted path: the device computes per-frame histograms alongside
// the transform, entropy/device_hist.py, so the host skips its tokenize
// pass entirely).  hist MUST be the exact token histogram of `in` -- the
// tree, per-block sizes and therefore every byte of output depend on it;
// callers verify via tests, not at runtime.  Byte-identical to
// he_compress(in), but single-pass: one fused SIMD scan+pack per block,
// sequential over blocks (the reference's scratch-buffer stale-bit reuse
// falls out of the sequential replay).  Returns compressed size or -1 on
// bad args / -3 on a >42-bit code (unreachable for real content).
int64_t he_compress_assisted(const uint8_t *in, int64_t in_size,
                             int64_t block_size, const int64_t *hist,
                             uint8_t *out, int64_t out_cap) {
  if (in_size < 1) return 0;
  if (block_size < 1) block_size = in_size;
  const bool use_blocks = block_size < in_size;
  if (in_size % block_size != 0) return -1;
  if (out_cap < he_max_compressed_size(in_size, block_size)) return -1;
  const int64_t n_blocks = in_size / block_size;
  PhaseTimer pt;
  g_phase_ms[kPhTokenize] = 0.0;  // the pass this entry point eliminates

  // Tree + header, exactly as he_compress.
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
    StoreTree(nodes, 0, 1, &head, &table);
  } else {
    return -1;  // an all-zero histogram cannot describe a non-empty input
  }
  head.FlushPartial();
  if (!CodeDepthOk(table.bits)) return -3;
  int64_t cursor = head.byte_count();

  uint64_t fused[kNumSymbols];
  for (int s = 0; s < kNumSymbols; ++s)
    fused[s] = static_cast<uint64_t>(table.code[s]) |
               (static_cast<uint64_t>(table.bits[s]) << 56);
  std::vector<uint64_t> fused2(65536);
  BuildFused2(fused, fused2.data());
  // Run payload LUT: code and extra bits pre-combined into one Put
  // payload, killing RunSymbol's class-branch chain in the hot walk.
  // Full length range (2..kMaxRun) so the SIMD group packer can gather
  // ANY segment's run payload; PackTokenizer indexes only lengths <= 64.
  // thread_local so the 130 KB buffer is faulted in once per thread, not
  // per frame (BatchCodec calls this from a worker pool).
  static thread_local std::vector<uint64_t> runlut_v;
  runlut_v.resize(kMaxRun + 1);
  uint64_t *runlut = runlut_v.data();
  BuildRunLutFull(fused, runlut);
  pt.lap(kPhTree, "tree");

  // Sequential fused scan+pack, written DIRECTLY into `out` (the old
  // scratch+replay formulation copied every packed byte twice more;
  // interleaved A/B min-of-12: 17.6 -> 16.9 ms/frame).  The stale-bit
  // quirk needs, for block b's trailing partial byte at block-relative
  // index i, the byte the reference's reused serialization buffer would
  // still hold there: the latest earlier block whose payload covered
  // index i (else 0, the buffer's initial fill).  Payload bytes of
  // earlier blocks are final in `out` (their own trailing byte already
  // merged), so a backward scan over the recorded (offset, size) pairs
  // reproduces the replay buffer exactly -- almost always hitting block
  // b-1 on the first probe.
  //
  // (Negative result, same A/B harness: restructuring PackTokenizer as
  // a free function with local state + nested by-reference lambdas was
  // 20% SLOWER than the member-state class -- the closure chain
  // close_run->emit_lits->put defeats register allocation where the
  // class methods do not.  Don't retry.)
  std::vector<int64_t> boff(static_cast<size_t>(n_blocks));
  std::vector<int64_t> bpacked(static_cast<size_t>(n_blocks));
  // Stale byte for block b's trailing partial byte at block-relative
  // index i: the latest earlier block whose payload covered i (the
  // reference's reused serialization buffer), else 0.
  auto stale_at = [&](int64_t b, int64_t i) -> uint8_t {
    for (int64_t j = b - 1; j >= 0; --j)
      if (bpacked[j] > i) return out[boff[j] + i];
    return 0;
  };
  int64_t b0 = 0;
#if HIMG_HAVE_SIMD_ENC
  // Lockstep SIMD groups of 8 blocks (see PackGroupSimd); remainder
  // blocks and the kill-switch fallback (HIMG_SIMD_ENCODE=0, for A/B
  // receipts) take the scalar fused scan+pack below.
  {
    const char *env = std::getenv("HIMG_SIMD_ENCODE");
    const bool simd_on = !(env && env[0] == '0');
    if (simd_on && use_blocks && n_blocks >= 8 && block_size >= 64)
      b0 = (n_blocks / 8) * 8;
  }
  if (b0) {
    const int64_t lane_stride = 8 * block_size + 16;
    // thread_local: reused across frames, no per-call faulting.
    static thread_local std::vector<uint8_t> lane_buf;
    lane_buf.resize(static_cast<size_t>(8 * lane_stride));
    for (int64_t g = 0; g < b0; g += 8) {
      int64_t blk_off[8], bits8[8];
      for (int i = 0; i < 8; ++i) blk_off[i] = (g + i) * block_size;
      PackGroupSimd(in, blk_off, block_size, fused, fused2.data(), runlut,
                    lane_buf.data(), lane_stride, bits8);
      for (int i = 0; i < 8; ++i) {
        const int64_t b = g + i;
        if (cursor + 4 + 8 * block_size + 16 > out_cap) return -1;
        int64_t packed = (bits8[i] + 7) / 8;
        int64_t prefix = use_blocks ? (packed <= 0x7FFF ? 2 : 4) : 0;
        uint8_t *dst = out + cursor + prefix;
        std::memcpy(dst, lane_buf.data() + i * lane_stride,
                    static_cast<size_t>(packed));
        int rem = static_cast<int>(bits8[i] & 7);
        if (rem) {
          uint8_t mask = static_cast<uint8_t>((1u << rem) - 1);
          dst[packed - 1] = static_cast<uint8_t>(
              (dst[packed - 1] & mask) | (stale_at(b, packed - 1) & ~mask));
        }
        if (use_blocks) {
          uint8_t *pre = out + cursor;
          if (prefix == 2) {
            pre[0] = static_cast<uint8_t>(packed);
            pre[1] = static_cast<uint8_t>(packed >> 8);
          } else {
            uint32_t lo = static_cast<uint32_t>((packed & 0x7FFF) | 0x8000);
            pre[0] = static_cast<uint8_t>(lo);
            pre[1] = static_cast<uint8_t>(lo >> 8);
            pre[2] = static_cast<uint8_t>(packed >> 15);
            pre[3] = static_cast<uint8_t>(packed >> 23);
          }
        }
        boff[b] = cursor + prefix;
        bpacked[b] = packed;
        cursor += prefix + packed;
      }
    }
  }
#endif  // HIMG_HAVE_SIMD_ENC
  for (int64_t b = b0; b < n_blocks; ++b) {
    // Worst case: every input byte takes a full-depth code (<= 64 bits,
    // he_max_compressed_size's 8x bound) + prefix + 8-byte spill slack.
    if (cursor + 4 + 8 * block_size + 16 > out_cap) return -1;
    // Pack optimistically at the 2-byte-prefix position; a >0x7FFF
    // payload (incompressible content) shifts by 2 afterwards.
    int64_t prefix = use_blocks ? 2 : 0;
    uint8_t *dst = out + cursor + prefix;
    PackTokenizer ptk(in + b * block_size, fused, fused2.data(), runlut,
                      dst);
    int64_t bits = ptk.Run(block_size);
    int64_t packed = (bits + 7) / 8;
    if (use_blocks && packed > 0x7FFF) {
      std::memmove(dst + 2, dst, static_cast<size_t>(packed));
      dst += 2;
      prefix = 4;
    }
    int rem = static_cast<int>(bits & 7);
    if (rem) {
      uint8_t mask = static_cast<uint8_t>((1u << rem) - 1);
      dst[packed - 1] = static_cast<uint8_t>(
          (dst[packed - 1] & mask) | (stale_at(b, packed - 1) & ~mask));
    }
    if (use_blocks) {
      uint8_t *pre = out + cursor;
      if (prefix == 2) {
        pre[0] = static_cast<uint8_t>(packed);
        pre[1] = static_cast<uint8_t>(packed >> 8);
      } else {
        uint32_t lo = static_cast<uint32_t>((packed & 0x7FFF) | 0x8000);
        pre[0] = static_cast<uint8_t>(lo);
        pre[1] = static_cast<uint8_t>(lo >> 8);
        pre[2] = static_cast<uint8_t>(packed >> 15);
        pre[3] = static_cast<uint8_t>(packed >> 23);
      }
    }
    boff[b] = cursor + prefix;
    bpacked[b] = packed;
    cursor += prefix + packed;
  }
  pt.lap(kPhPack, "scan+pack");
  g_phase_ms[kPhFixup] = 0.0;
  return cursor;
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
  Tokenized tk = TokenizeAll(in, block_size, n_blocks);
  for (int s = 0; s < kNumSymbols; ++s) {
    int64_t acc = 0;
    for (int64_t b = 0; b < n_blocks; ++b)
      acc += tk.block_hist[b * kNumSymbols + s];
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

  for (int s = 0; s < kNumSymbols; ++s)
    if (code_bits[s] > kMaxCodeBits) return -3;
  uint64_t fused[kNumSymbols];
  for (int s = 0; s < kNumSymbols; ++s)
    fused[s] = static_cast<uint64_t>(codes[s]) |
               (static_cast<uint64_t>(code_bits[s]) << 56);
  std::vector<uint64_t> fused2(65536);
  BuildFused2(fused, fused2.data());

  // Pass 1 (shared with he_compress): tokenize -> exact bit sizes ->
  // output offsets.
  Tokenized tk = TokenizeAll(in, block_size, n_blocks);
  const int64_t seg_stride = tk.seg_stride;
  const Seg *seg_arena = tk.seg_arena.get();
  const int n_threads = tk.n_threads;
  std::vector<int64_t> offsets(n_blocks + 1);
  offsets[0] = 0;
  for (int64_t b = 0; b < n_blocks; ++b) {
    bits_out[b] = BlockBits(tk, b, reinterpret_cast<const int8_t *>(
        code_bits));
    sizes_out[b] = (bits_out[b] + 7) / 8;
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
        PackBlock(in + b * block_size, seg_arena + b * seg_stride,
                  tk.seg_count[b], fused, fused2.data(), scratch.data());
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
  if (dec.nodes[dec.root].symbol < 0) dec.BuildLutM();
  int64_t tree_bytes = (tree_reader.consumed_bits() + 7) / 8;
  pt.lap(kPhTreeLut, "tree+lut");

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

  // Lockstep SIMD over groups of 8 substreams where profitable (see
  // DecodeGroupSimd); scalar for the remainder and as the kill-switch
  // fallback (HIMG_SIMD_DECODE=0, for A/B receipts).
  int64_t n_groups = 0;
#if HIMG_HAVE_AVX512BW
  {
    const char *env = std::getenv("HIMG_SIMD_DECODE");
    const bool simd_on = !(env && env[0] == '0');
    if (simd_on && dec.nodes[dec.root].symbol < 0 &&
        block_size > 4 * kSimdTail)
      n_groups = n_blocks / 8;
  }
  // (Measured, not a lever: this memset is 0.26 ms/frame, and letting a
  // caller-side np.zeros replace it is +0.6% -- calloc memsets reused
  // arena chunks anyway.)
  if (n_groups > 0) std::memset(out, 0, static_cast<size_t>(out_size));
#endif
  const int64_t first_scalar = n_groups * 8;
  const int64_t n_items = n_groups + (n_blocks - first_scalar);

  std::atomic<int64_t> next(0);
  std::atomic<bool> ok(true);
  auto worker = [&]() {
    while (ok.load(std::memory_order_relaxed)) {
      int64_t t = next.fetch_add(1, std::memory_order_relaxed);
      if (t >= n_items) break;
      bool good;
      if (t < n_groups) {
#if HIMG_HAVE_AVX512BW
        int64_t out_base[8];
        for (int i = 0; i < 8; ++i)
          out_base[i] = (t * 8 + i) * block_size;
        good = DecodeGroupSimd(dec, in, in_size, &spans[t * 8], out_base,
                               block_size, out);
#else
        good = false;  // unreachable: n_groups == 0 without AVX512BW
#endif
      } else {
        int64_t b = first_scalar + (t - n_groups);
        good = DecodeStream(dec, in + spans[b].first, spans[b].second,
                            out + b * block_size, block_size);
      }
      if (!good) ok.store(false, std::memory_order_relaxed);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads - 1; ++t) threads.emplace_back(worker);
  worker();
  for (auto &t : threads) t.join();
  pt.lap(kPhDecode, "decode");
  return ok.load() ? 0 : -4;
}

}  // extern "C"
