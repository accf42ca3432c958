// COCO run-length-encoding codec, C implementation.
//
// Native replacement for the pycocotools C extension the reference depends
// on for mask decode/encode (reference: ufvideo/mm_utils.py:19-33 annToMask).
// Exposed through a minimal C ABI consumed via ctypes (ufvideo_tpu/rle.py
// uses it as a fast path; the numpy implementation stays as fallback).
//
// Format notes (matching the COCO spec):
//  - masks are column-major (Fortran order) binary arrays
//  - runs alternate background/foreground starting with background
//  - the chars encoding packs 5 bits per byte (+48), LEB128-style
//    continuation, with counts[i>2] delta-coded against counts[i-2]
//
// Build: g++ -O3 -shared -fPIC -o librle_codec.so rle_codec.cc

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Decode a counts string into a binary mask of h*w (column-major flat).
// Returns 0 on success, -1 if the runs overflow the mask area.
int rle_decode(const char* counts, int counts_len, int h, int w,
               uint8_t* out_mask) {
  const int64_t area = static_cast<int64_t>(h) * w;
  std::memset(out_mask, 0, area);
  int64_t pos = 0;
  uint8_t value = 0;
  int p = 0;
  int64_t prev2 = 0, prev1 = 0;
  int idx = 0;
  while (p < counts_len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (p >= counts_len) return -1;
      const int c = counts[p] - 48;
      x |= static_cast<int64_t>(c & 0x1F) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (idx > 2) x += prev2;
    prev2 = prev1;
    prev1 = x;
    ++idx;
    if (x < 0 || pos + x > area) return -1;
    if (value) std::memset(out_mask + pos, 1, x);
    pos += x;
    value ^= 1;
  }
  return 0;
}

// Encode a column-major binary mask. Writes the counts string into out
// (caller allocates >= 16 + 8 * (h*w) bytes worst case; realistically the
// number of runs * 8). Returns the string length.
int rle_encode(const uint8_t* mask, int h, int w, char* out, int out_cap) {
  const int64_t area = static_cast<int64_t>(h) * w;
  std::vector<int64_t> counts;
  counts.reserve(256);
  int64_t run = 0;
  uint8_t value = 0;
  for (int64_t i = 0; i < area; ++i) {
    const uint8_t v = mask[i] ? 1 : 0;
    if (v != value) {
      counts.push_back(run);
      run = 0;
      value = v;
    }
    ++run;
  }
  counts.push_back(run);

  int n = 0;
  for (size_t i = 0; i < counts.size(); ++i) {
    int64_t x = counts[i];
    if (i > 2) x -= counts[i - 2];
    bool more = true;
    while (more) {
      int c = static_cast<int>(x & 0x1F);
      x >>= 5;
      more = (c & 0x10) ? (x != -1) : (x != 0);
      if (more) c |= 0x20;
      if (n >= out_cap) return -1;
      out[n++] = static_cast<char>(c + 48);
    }
  }
  return n;
}

// Union-merge: decode `n` RLEs into one mask (logical OR).
int rle_merge(const char** counts_arr, const int* counts_lens, int n, int h,
              int w, uint8_t* out_mask) {
  const int64_t area = static_cast<int64_t>(h) * w;
  std::vector<uint8_t> tmp(area);
  std::memset(out_mask, 0, area);
  for (int i = 0; i < n; ++i) {
    if (rle_decode(counts_arr[i], counts_lens[i], h, w, tmp.data()) != 0)
      return -1;
    for (int64_t j = 0; j < area; ++j) out_mask[j] |= tmp[j];
  }
  return 0;
}

// Mask area (popcount) straight from the RLE without materializing it.
int64_t rle_area(const char* counts, int counts_len) {
  int64_t total = 0;
  uint8_t value = 0;
  int p = 0;
  int64_t prev2 = 0, prev1 = 0;
  int idx = 0;
  while (p < counts_len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (p >= counts_len) return -1;
      const int c = counts[p] - 48;
      x |= static_cast<int64_t>(c & 0x1F) << (5 * k);
      more = (c & 0x20) != 0;
      ++p;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);
    }
    if (idx > 2) x += prev2;
    prev2 = prev1;
    prev1 = x;
    ++idx;
    if (value) total += x;
    value ^= 1;
  }
  return total;
}

}  // extern "C"
