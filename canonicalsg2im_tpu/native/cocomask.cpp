// COCO mask codec — native replacement for the pycocotools C RLE routines the
// reference depends on (sg2im/data/packed_coco.py:371-382 via
// pycocotools.mask; SURVEY.md §2.10 "C++ RLE decode in the host-side input
// pipeline"). Decodes both the compressed LEB128-style RLE strings found in
// COCO annotation JSON and uncompressed count lists, and rasterizes polygon
// segmentations with an even-odd scanline fill.
//
// COCO RLE conventions:
//  - masks are stored column-major (Fortran order), h rows by w cols;
//  - counts alternate runs of 0s and 1s, starting with 0s;
//  - the compressed string packs each count as little-endian 6-bit chunks
//    (chunk = char - 48), bit 0x20 = continuation; counts from index 2 on are
//    delta-encoded against count[i-2].
//
// Built once at import time by canonicalsg2im_tpu/native/build.py:
//   g++ -O2 -shared -fPIC cocomask.cpp -o libcocomask.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <cmath>

extern "C" {

// Decode a compressed COCO RLE string into a row-major uint8 mask (h, w).
// Returns 0 on success, -1 on malformed input / overflow.
int rle_decode_string(const char* s, int64_t h, int64_t w, uint8_t* out) {
  const int64_t n_pix = h * w;
  std::vector<int64_t> counts;
  int64_t i = 0;
  const int64_t len = (int64_t)strlen(s);
  while (i < len) {
    int64_t x = 0;
    int k = 0;
    bool more = true;
    while (more) {
      if (i >= len) return -1;
      int64_t c = (int64_t)(s[i]) - 48;
      x |= (c & 0x1f) << (5 * k);
      more = (c & 0x20) != 0;
      ++i;
      ++k;
      if (!more && (c & 0x10)) x |= -1LL << (5 * k);  // sign-extend
    }
    if (counts.size() > 2) x += counts[counts.size() - 2];
    counts.push_back(x);
  }

  // expand runs column-major, write row-major
  std::memset(out, 0, (size_t)n_pix);
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t ci = 0; ci < (int64_t)counts.size(); ++ci) {
    int64_t run = counts[ci];
    if (run < 0 || pos + run > n_pix) return -1;
    if (val) {
      for (int64_t p = pos; p < pos + run; ++p) {
        const int64_t col = p / h, row = p % h;
        out[row * w + col] = 1;
      }
    }
    pos += run;
    val ^= 1;
  }
  return pos == n_pix ? 0 : -1;
}

// Decode an uncompressed counts list (already parsed from JSON).
int rle_decode_counts(const int64_t* counts, int64_t n, int64_t h, int64_t w,
                      uint8_t* out) {
  const int64_t n_pix = h * w;
  std::memset(out, 0, (size_t)n_pix);
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t ci = 0; ci < n; ++ci) {
    int64_t run = counts[ci];
    if (run < 0 || pos + run > n_pix) return -1;
    if (val) {
      for (int64_t p = pos; p < pos + run; ++p) {
        const int64_t col = p / h, row = p % h;
        out[row * w + col] = 1;
      }
    }
    pos += run;
    val ^= 1;
  }
  return pos <= n_pix ? 0 : -1;
}

// Rasterize one polygon (xy interleaved, n vertices) into mask (h, w) with an
// even-odd scanline fill at pixel centers, OR-ing into `out`.
int polygon_fill(const double* xy, int64_t n, int64_t h, int64_t w,
                 uint8_t* out) {
  if (n < 3) return 0;
  std::vector<double> xs(n), ys(n);
  for (int64_t i = 0; i < n; ++i) {
    xs[i] = xy[2 * i];
    ys[i] = xy[2 * i + 1];
  }
  std::vector<double> inter;
  for (int64_t row = 0; row < h; ++row) {
    const double y = row + 0.5;
    inter.clear();
    for (int64_t i = 0; i < n; ++i) {
      const int64_t j = (i + 1) % n;
      const double y0 = ys[i], y1 = ys[j];
      if ((y0 <= y && y1 > y) || (y1 <= y && y0 > y)) {
        const double t = (y - y0) / (y1 - y0);
        inter.push_back(xs[i] + t * (xs[j] - xs[i]));
      }
    }
    std::sort(inter.begin(), inter.end());
    for (size_t k = 0; k + 1 < inter.size(); k += 2) {
      int64_t x0 = (int64_t)std::ceil(inter[k] - 0.5);
      int64_t x1 = (int64_t)std::floor(inter[k + 1] - 0.5);
      x0 = std::max<int64_t>(x0, 0);
      x1 = std::min<int64_t>(x1, w - 1);
      for (int64_t x = x0; x <= x1; ++x) out[row * w + x] = 1;
    }
  }
  return 0;
}

}  // extern "C"
