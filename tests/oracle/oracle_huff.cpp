// Raw Huffman compress/decompress via the reference library, for entropy-
// layer conformance tests.
//   oracle_huff enc <raw_in> <block_size> <out>
//   oracle_huff dec <comp_in> <out_size> <block_size> <out>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <vector>

#include "huffman_enc.h"
#include "huffman_dec.h"

static std::vector<uint8_t> ReadFile(const char *path) {
  std::ifstream f(path, std::ios::binary);
  if (!f.good()) { fprintf(stderr, "cannot read %s\n", path); exit(2); }
  f.seekg(0, std::ios::end);
  size_t n = (size_t)f.tellg();
  f.seekg(0, std::ios::beg);
  std::vector<uint8_t> buf(n);
  f.read((char *)buf.data(), n);
  return buf;
}

int main(int argc, char **argv) {
  if (argc >= 2 && strcmp(argv[1], "enc") == 0 && argc == 5) {
    std::vector<uint8_t> in = ReadFile(argv[2]);
    int block_size = atoi(argv[3]);
    std::vector<uint8_t> out(himg::HuffmanEnc::MaxCompressedSize(in.size()) +
                             1024 * 1024);
    int n = himg::HuffmanEnc::Compress(out.data(), in.data(), (int)in.size(),
                                       block_size);
    std::ofstream f(argv[4], std::ios::binary);
    f.write((char *)out.data(), n);
    return 0;
  }
  if (argc >= 2 && strcmp(argv[1], "dec") == 0 && argc == 6) {
    std::vector<uint8_t> in = ReadFile(argv[2]);
    int out_size = atoi(argv[3]);
    int block_size = atoi(argv[4]);
    std::vector<uint8_t> out(out_size);
    himg::HuffmanDec dec(in.data(), (int)in.size(), block_size);
    if (!dec.Init()) { fprintf(stderr, "init failed\n"); return 3; }
    if (block_size > 0 && block_size < out_size) {
      int n_blocks = out_size / block_size;
      for (int b = 0; b < n_blocks; ++b)
        if (!dec.UncompressBlock(out.data() + b * block_size, block_size, b)) {
          fprintf(stderr, "block %d failed\n", b); return 3;
        }
    } else {
      if (!dec.Uncompress(out.data(), out_size)) {
        fprintf(stderr, "uncompress failed\n"); return 3;
      }
    }
    std::ofstream f(argv[5], std::ios::binary);
    f.write((char *)out.data(), out_size);
    return 0;
  }
  fprintf(stderr, "usage: enc in block out | dec in out_size block out\n");
  return 1;
}
