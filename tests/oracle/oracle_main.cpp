// Test-oracle harness for the reference HIMG library (built from
// /root/reference, linked read-only). NOT part of the himg_tpu framework —
// used only by the conformance test suite to generate golden data.
//
// Usage:
//   oracle encode <raw_in> <width> <height> <channels> <quality> <use_ycbcr> <out.himg>
//   oracle decode <in.himg> <raw_out>   (writes w,h,c as 3 LE u32 then raw bytes)
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fstream>
#include <vector>

#include "encoder.h"
#include "decoder.h"

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

static void WriteFile(const char *path, const uint8_t *data, size_t n) {
  std::ofstream f(path, std::ios::binary);
  f.write((const char *)data, n);
}

int main(int argc, char **argv) {
  if (argc >= 2 && strcmp(argv[1], "encode") == 0 && argc == 9) {
    std::vector<uint8_t> raw = ReadFile(argv[2]);
    int w = atoi(argv[3]), h = atoi(argv[4]), c = atoi(argv[5]);
    int q = atoi(argv[6]), ycbcr = atoi(argv[7]);
    if ((int)raw.size() != w * h * c) { fprintf(stderr, "size mismatch\n"); return 2; }
    himg::Encoder enc;
    if (!enc.Encode(raw.data(), w, h, c, c, q, ycbcr != 0)) return 3;
    WriteFile(argv[8], enc.packed_data(), enc.packed_size());
    return 0;
  }
  if (argc >= 2 && strcmp(argv[1], "decode") == 0 && argc == 4) {
    std::vector<uint8_t> packed = ReadFile(argv[2]);
    himg::Decoder dec(0);
    if (!dec.Decode(packed.data(), (int)packed.size())) return 3;
    uint32_t hdr[3] = {(uint32_t)dec.width(), (uint32_t)dec.height(),
                       (uint32_t)dec.num_channels()};
    std::ofstream f(argv[3], std::ios::binary);
    f.write((const char *)hdr, sizeof(hdr));
    f.write((const char *)dec.unpacked_data(), dec.unpacked_size());
    return 0;
  }
  fprintf(stderr, "usage: oracle encode raw w h c q ycbcr out.himg | oracle decode in.himg raw_out\n");
  return 1;
}
