// Dumps reference-internal tables for exhaustive parity testing of himg_tpu's
// table constructors. Writes binary to the given path:
//   [64 u8 luma shift][64 u8 chroma shift]
//   [256 i16 lowres mapper full table][256 i16 fullres mapper full table]
//   [65536 u8 lowres MapTo8Bit LUT][65536 u8 fullres MapTo8Bit LUT]
//   [lowres mapping-function serialization: u32 size + bytes]
//   [fullres mapping-function serialization: u32 size + bytes]
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <vector>

#include "mapper.h"
#include "quantize.h"

using namespace himg;

int main(int argc, char **argv) {
  if (argc != 3) { fprintf(stderr, "usage: oracle_tables <quality> <outfile>\n"); return 1; }
  int q = atoi(argv[1]);
  std::ofstream f(argv[2], std::ios::binary);

  Quantize quant;
  quant.InitForQuality((uint8_t)q, true);
  std::vector<uint8_t> qcfg(quant.ConfigurationSize());
  quant.GetConfiguration(qcfg.data());
  // qcfg is 4-bit packed; unpack to 64+64 bytes
  for (int t = 0; t < 2; ++t)
    for (int i = 0; i < 32; ++i) {
      uint8_t x = qcfg[t * 32 + i];
      uint8_t hi = x >> 4, lo = x & 15;
      f.write((char *)&hi, 1);
      f.write((char *)&lo, 1);
    }

  LowResMapper lrm;
  lrm.InitForQuality(q);
  FullResMapper frm;
  frm.InitForQuality(q);

  for (int i = 0; i < 256; ++i) {
    int16_t v = lrm.UnmapFrom8Bit((uint8_t)((i + 128) & 255));  // full[i]
    f.write((char *)&v, 2);
  }
  for (int i = 0; i < 256; ++i) {
    int16_t v = frm.UnmapFrom8Bit((uint8_t)((i + 128) & 255));
    f.write((char *)&v, 2);
  }
  for (long x = -32768; x < 32768; ++x) {
    uint8_t m = lrm.MapTo8Bit((int16_t)x);
    f.write((char *)&m, 1);
  }
  for (long x = -32768; x < 32768; ++x) {
    uint8_t m = frm.MapTo8Bit((int16_t)x);
    f.write((char *)&m, 1);
  }
  for (int t = 0; t < 2; ++t) {
    Mapper &m = t == 0 ? (Mapper &)lrm : (Mapper &)frm;
    uint32_t sz = (uint32_t)m.MappingFunctionSize();
    std::vector<uint8_t> buf(sz);
    m.GetMappingFunction(buf.data());
    f.write((char *)&sz, 4);
    f.write((char *)buf.data(), sz);
  }
  return 0;
}
