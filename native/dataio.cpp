// Native data-pipeline primitives (the torchvision-loader equivalent for the
// TPU rebuild — the reference delegates decoding to torchvision's C++ ops,
// /root/reference/train.py:58-92; here the equivalents are owned in-repo).
//
// Exposed via a C ABI for ctypes (no pybind11 in this environment):
//   * idx_decode          — MNIST IDX tensor files (raw or gzip via zlib)
//   * cifar_decode_batch  — CIFAR-10 binary records -> NHWC uint8 + labels
//   * chw_to_hwc          — layout transpose for CIFAR pickle batches
//   * shuffled_indices    — seeded Fisher-Yates permutation (epoch shuffle)
//
// Build: make -C native   (g++ -O3 -shared -fPIC, links zlib)

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

extern "C" {

// Reads an entire (possibly gzip-compressed) file. Returns bytes read or -1.
// gzopen transparently handles BOTH gzip and raw files.
static int64_t read_all(const char* path, std::vector<uint8_t>& out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return -1;
  const size_t kChunk = 1 << 20;
  size_t size = 0;
  out.clear();
  while (true) {
    out.resize(size + kChunk);
    int n = gzread(f, out.data() + size, kChunk);
    if (n < 0) {
      gzclose(f);
      return -1;
    }
    size += static_cast<size_t>(n);
    if (static_cast<size_t>(n) < kChunk) break;
  }
  gzclose(f);
  out.resize(size);
  return static_cast<int64_t>(size);
}

// Parse an IDX header from `buf`; fills dims[0..ndim). Returns header bytes
// or -1 on malformed input. IDX: magic u32 (last byte = ndim), ndim u32 dims,
// payload bytes (dtype 0x08 = uint8, the only one MNIST uses).
static int64_t parse_idx_header(const uint8_t* buf, int64_t len,
                                int64_t* dims, int32_t* ndim_out) {
  if (len < 4) return -1;
  if (buf[0] != 0 || buf[1] != 0 || buf[2] != 0x08) return -1;
  int32_t ndim = buf[3];
  if (ndim < 1 || ndim > 4 || len < 4 + 4 * ndim) return -1;
  for (int i = 0; i < ndim; ++i) {
    const uint8_t* p = buf + 4 + 4 * i;
    dims[i] = (int64_t(p[0]) << 24) | (int64_t(p[1]) << 16) |
              (int64_t(p[2]) << 8) | int64_t(p[3]);
  }
  *ndim_out = ndim;
  return 4 + 4 * ndim;
}

// Two-phase API: call with out=nullptr to get payload size + dims, then with
// an allocated buffer to copy the payload. Returns payload bytes or -1.
int64_t idx_decode(const char* path, uint8_t* out, int64_t out_capacity,
                   int64_t* dims, int32_t* ndim) {
  std::vector<uint8_t> raw;
  if (read_all(path, raw) < 0) return -1;
  int64_t header = parse_idx_header(raw.data(), (int64_t)raw.size(), dims, ndim);
  if (header < 0) return -1;
  int64_t payload = (int64_t)raw.size() - header;
  int64_t expect = 1;
  for (int i = 0; i < *ndim; ++i) expect *= dims[i];
  if (payload < expect) return -1;
  if (out) {
    if (out_capacity < expect) return -1;
    std::memcpy(out, raw.data() + header, expect);
  }
  return expect;
}

// CIFAR-10 binary batch: n records of [label u8 | 3072 u8 CHW pixels].
// Writes labels[n] and NHWC images[n*32*32*3]. Returns record count or -1.
int64_t cifar_decode_batch(const char* path, uint8_t* images, int32_t* labels,
                           int64_t capacity_records) {
  std::vector<uint8_t> raw;
  int64_t size = read_all(path, raw);
  if (size < 0 || size % 3073 != 0) return -1;
  int64_t n = size / 3073;
  if (!images) return n;
  if (n > capacity_records) return -1;
  for (int64_t r = 0; r < n; ++r) {
    const uint8_t* rec = raw.data() + r * 3073;
    labels[r] = rec[0];
    const uint8_t* chw = rec + 1;
    uint8_t* hwc = images + r * 3072;
    for (int c = 0; c < 3; ++c)
      for (int p = 0; p < 1024; ++p)
        hwc[p * 3 + c] = chw[c * 1024 + p];
  }
  return n;
}

// CHW->HWC for n images of [c, h*w] (CIFAR pickle batches are decoded by
// Python's pickle; only the transpose is the hot part).
void chw_to_hwc(const uint8_t* chw, uint8_t* hwc, int64_t n, int64_t c,
                int64_t hw) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* src = chw + i * c * hw;
    uint8_t* dst = hwc + i * c * hw;
    for (int64_t ch = 0; ch < c; ++ch)
      for (int64_t p = 0; p < hw; ++p) dst[p * c + ch] = src[ch * hw + p];
  }
}

// Seeded Fisher-Yates permutation of [0, n) — epoch shuffling without
// holding a second copy of the index array (SplitMix64 PRNG).
void shuffled_indices(int32_t* out, int64_t n, uint64_t seed) {
  for (int64_t i = 0; i < n; ++i) out[i] = (int32_t)i;
  uint64_t s = seed + 0x9E3779B97F4A7C15ULL;
  for (int64_t i = n - 1; i > 0; --i) {
    // SplitMix64 step
    uint64_t z = (s += 0x9E3779B97F4A7C15ULL);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    z ^= z >> 31;
    int64_t j = (int64_t)(z % (uint64_t)(i + 1));
    int32_t t = out[i];
    out[i] = out[j];
    out[j] = t;
  }
}

}  // extern "C"
