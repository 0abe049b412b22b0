// fastimage — native host-side image preprocessing for the mammography data path.
//
// The per-image hot loop of probe harvesting / fine-tune loading is
// decode -> resize to 1520x912 -> min-max -> mean/std (reference contract
// `Datasets/dataset_concepts.py:212-215`, `concept_vit/data_utils.py:120-122`).
// PIL does this in ~3 passes with intermediate copies; this extension fuses
// resize+normalize in one pass per output pixel and parallelizes across a small
// thread pool for batch loading. Exposed to Python via ctypes
// (mammodissect/native/__init__.py); built by build.sh / setup at import time.
//
// API (C, extern "C"):
//   fi_resize_normalize(src, sh, sw, dst, dh, dw, do_minmax, mean, std)
//     bilinear-resample float32 [sh, sw] -> [dh, dw], then (x-lo)/(hi-lo) when
//     do_minmax (lo/hi over the SOURCE image, matching torch reference order:
//     resize happens before min-max in the dataset), then (x-mean)/std.
//   fi_batch_resize_normalize(...): same over a batch with pthreads.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

static inline float bilinear_sample(const float* src, int sh, int sw, float y, float x) {
  int y0 = (int)y;
  int x0 = (int)x;
  int y1 = y0 + 1 < sh ? y0 + 1 : sh - 1;
  int x1 = x0 + 1 < sw ? x0 + 1 : sw - 1;
  float fy = y - y0;
  float fx = x - x0;
  const float* r0 = src + (size_t)y0 * sw;
  const float* r1 = src + (size_t)y1 * sw;
  float top = r0[x0] * (1.f - fx) + r0[x1] * fx;
  float bot = r1[x0] * (1.f - fx) + r1[x1] * fx;
  return top * (1.f - fy) + bot * fy;
}

// PIL-convention bilinear: sample at pixel centers with scale = src/dst.
// Normalization order matches the python reference path (resize THEN min-max over the
// resized image, `Datasets/dataset_concepts.py:212-215`): pass 1 resizes while
// tracking min/max of the output; pass 2 applies the fused affine
// x' = ((x-lo)/(hi-lo) - mean) / std = x*a + b.
void fi_resize_normalize(const float* src, int sh, int sw, float* dst, int dh, int dw,
                         int do_minmax, float mean, float std_) {
  float scale_y = (float)sh / dh;
  float scale_x = (float)sw / dw;
  float lo = 3.4e38f, hi = -3.4e38f;
  for (int oy = 0; oy < dh; ++oy) {
    float sy = (oy + 0.5f) * scale_y - 0.5f;
    if (sy < 0) sy = 0;
    if (sy > sh - 1) sy = (float)(sh - 1);
    for (int ox = 0; ox < dw; ++ox) {
      float sx = (ox + 0.5f) * scale_x - 0.5f;
      if (sx < 0) sx = 0;
      if (sx > sw - 1) sx = (float)(sw - 1);
      float v = bilinear_sample(src, sh, sw, sy, sx);
      if (v < lo) lo = v;
      if (v > hi) hi = v;
      dst[(size_t)oy * dw + ox] = v;
    }
  }
  float inv_std = 1.f / std_;
  float a, b;
  if (do_minmax) {
    float inv_range = hi > lo ? 1.f / (hi - lo) : 0.f;
    a = inv_range * inv_std;
    b = (-lo * inv_range - mean) * inv_std;
  } else {
    a = inv_std;
    b = -mean * inv_std;
  }
  for (size_t i = 0; i < (size_t)dh * dw; ++i) dst[i] = dst[i] * a + b;
}

void fi_batch_resize_normalize(const float* src, int n, int sh, int sw, float* dst,
                               int dh, int dw, int do_minmax, float mean, float std_,
                               int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      fi_resize_normalize(src + (size_t)i * sh * sw, sh, sw,
                          dst + (size_t)i * dh * dw, dh, dw, do_minmax, mean, std_);
    }
  };
  std::vector<std::thread> threads;
  int nt = n_threads < n ? n_threads : n;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// Packed-wire host kernels (dissect/packing.py).
//
// The packed uint8 wire's host cost is per-ROW work over [B, H, W, C] batches:
// find each row's [first, last] nonzero span, then copy span bytes contiguously
// into one flat payload. numpy does both via full-frame boolean masks + fancy
// indexing (~4 passes over the 89 MB batch at the canonical geometry — measured
// ~0.9 s/batch on a 1-vCPU host, the dominant non-wire term of the r5 full-scale
// harvest). Here each is one forward/backward scan + one memcpy per row.

// Per-row nonzero spans of [B*H] rows, each [W, C] uint8: start/length int32.
// "Nonzero" = any channel nonzero (matches packing.row_spans).
void fi_row_spans(const uint8_t* u8, int64_t n_rows, int64_t w, int64_t c,
                  int32_t* start, int32_t* length) {
  for (int64_t r = 0; r < n_rows; ++r) {
    const uint8_t* row = u8 + r * w * c;
    int64_t nb = w * c;
    // byte-level scan: first/last nonzero BYTE, then round to pixel granularity.
    // word-wise fast path skips zero bytes 8 at a time.
    int64_t i = 0;
    while (i + 8 <= nb) {
      uint64_t v;
      std::memcpy(&v, row + i, 8);
      if (v != 0) break;
      i += 8;
    }
    while (i < nb && row[i] == 0) ++i;
    if (i == nb) {
      start[r] = 0;
      length[r] = 0;
      continue;
    }
    int64_t j = nb;
    while (j - 8 >= i) {
      uint64_t v;
      std::memcpy(&v, row + j - 8, 8);
      if (v != 0) break;
      j -= 8;
    }
    while (j > i && row[j - 1] == 0) --j;
    int32_t first_px = (int32_t)(i / c);
    int32_t last_px = (int32_t)((j - 1) / c);
    start[r] = first_px;
    length[r] = last_px - first_px + 1;
  }
}

// Pack [n_rows] rows' spans contiguously into `out` (row-major over rows, the
// packing.pack_batch order). Returns bytes written; caller sizes `out` from
// sum(length)*c.
int64_t fi_pack_spans(const uint8_t* u8, int64_t n_rows, int64_t w, int64_t c,
                      const int32_t* start, const int32_t* length, uint8_t* out) {
  int64_t off = 0;
  for (int64_t r = 0; r < n_rows; ++r) {
    int64_t nb = (int64_t)length[r] * c;
    if (nb == 0) continue;
    std::memcpy(out + off, u8 + (r * w + start[r]) * c, (size_t)nb);
    off += nb;
  }
  return off;
}

// Threaded batch pack for a [B, H, W, C] batch in one call. Each image's
// payload lands at out + out_offsets[b]. Spans are always caller-provided
// (fi_row_spans or a probe's precomputed spans): out_offsets are prefix sums
// of the span lengths, so spans necessarily exist before this can be called.
void fi_batch_pack(const uint8_t* u8, int64_t b, int64_t h, int64_t w, int64_t c,
                   const int32_t* start, const int32_t* length,
                   uint8_t* out, const int64_t* out_offsets, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1);
      if (i >= b) return;
      const uint8_t* img = u8 + i * h * w * c;
      fi_pack_spans(img, h, w, c, start + i * h, length + i * h,
                    out + out_offsets[i]);
    }
  };
  std::vector<std::thread> threads;
  int nt = (int64_t)n_threads < b ? n_threads : (int)b;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// uint8 HWC (1 or 3 channels) decode-normalize fast path: scale to [0,1], optional
// grayscale collapse, then resize+minmax+meanstd per channel.
void fi_u8_to_gray_resize_normalize(const uint8_t* src, int sh, int sw, int sc,
                                    float* dst, int dh, int dw, int do_minmax,
                                    float mean, float std_, float* scratch) {
  // scratch: [sh*sw] float workspace
  const float inv255 = 1.f / 255.f;
  if (sc == 1) {
    for (size_t i = 0; i < (size_t)sh * sw; ++i) scratch[i] = src[i] * inv255;
  } else {
    for (size_t i = 0; i < (size_t)sh * sw; ++i) {
      const uint8_t* p = src + i * sc;
      scratch[i] = (p[0] + p[1] + p[2]) * (inv255 / 3.f);
    }
  }
  fi_resize_normalize(scratch, sh, sw, dst, dh, dw, do_minmax, mean, std_);
}

// ABI stamp: bump the suffix whenever any exported signature changes (symbol
// NAMES alone can't reveal a signature change — fi_batch_pack kept its name
// when compute_spans was dropped). The Python loader requires this exact
// symbol, so a stale same-named .so is rejected before dlopen.
void fi_abi_v2(void) {}

}  // extern "C"
