// Native Morton-block layout builder (the hashed pipeline's host prep).
//
// Bit-identical port of build_sorted_cloud_host (feat3dnet_tpu/ops/
// hash_grid.py): same f32 arithmetic, same stable sorts, same pad
// conventions (invalid -> +1e9 coords, pad rows at +1e9 with UNIQUE
// sentinel keys n..Np-1). The point of the native version is the GIL:
// numpy's argsort holds it, so extract_many's prep thread pool cannot
// scale (r3 measurement: 4 workers SLOWER than 1); ctypes calls release
// the GIL for the whole sort+pack, letting per-cloud preps run truly in
// parallel.
//
// Exact-match invariants (asserted by tests/test_native_morton.py):
//   * cell = clip((pts - finite_min) / cell_size, 0, 1023) in f32, C
//     truncation == numpy .astype(int32) for the clipped range;
//   * stable sorts (std::stable_sort) == np.argsort(kind="stable");
//   * block bboxes are plain fmin/fmax chains (no NaN inputs).
#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr float kFar = 1.0e9f;

inline uint32_t spread10(uint32_t x) {
  x = (x | (x << 16)) & 0x030000FFu;
  x = (x | (x << 8)) & 0x0300F00Fu;
  x = (x | (x << 4)) & 0x030C30C3u;
  x = (x | (x << 2)) & 0x09249249u;
  return x;
}

}  // namespace

extern "C" {

// xyz: (n, 3) f32; valid: (n) uint8 or nullptr; outputs (caller-allocated):
//   pts4: (np_, 4) f32, blk_bbox: (np_/block, 8) f32, inv_perm: (n) int32
// with np_ = n padded up to a multiple of `block`. Returns np_ (or -1).
int f3d_morton_pack(const float* xyz, const uint8_t* valid, int n,
                    float cell_size, int block, float* pts4,
                    float* blk_bbox, int32_t* inv_perm) {
  if (n <= 0 || block <= 0) return -1;
  const int pad = (block - n % block) % block;
  const int np_ = n + pad;

  // masked coords + finite min
  std::vector<float> pts(static_cast<size_t>(n) * 3);
  std::vector<uint8_t> ok_row(n);
  float fmin3[3] = {kFar, kFar, kFar};
  for (int i = 0; i < n; ++i) {
    bool ok = valid == nullptr || valid[i];
    // non-finite coords count as invalid (mirrors the numpy/device paths)
    for (int d = 0; d < 3 && ok; ++d) ok = std::isfinite(xyz[3 * i + d]);
    ok_row[i] = ok;
    for (int d = 0; d < 3; ++d) {
      const float v = ok ? xyz[3 * i + d] : kFar;
      pts[3 * i + d] = v;
      if (v < fmin3[d]) fmin3[d] = v;
    }
  }

  // morton keys (invalid past every real code)
  std::vector<int64_t> key(n);
  for (int i = 0; i < n; ++i) {
    const bool ok = ok_row[i];
    if (!ok) {
      key[i] = int64_t(1) << 30;
      continue;
    }
    uint32_t c[3];
    for (int d = 0; d < 3; ++d) {
      float f = (pts[3 * i + d] - fmin3[d]) / cell_size;  // f32 math
      f = std::fmin(std::fmax(f, 0.0f), 1023.0f);
      c[d] = static_cast<uint32_t>(static_cast<int32_t>(f));  // trunc
    }
    key[i] = static_cast<int64_t>(
        spread10(c[0]) | (spread10(c[1]) << 1) | (spread10(c[2]) << 2));
  }

  // order1 = stable argsort(key), padded with 0 (dups of slot 0)
  std::vector<int32_t> order1(np_, 0);
  std::iota(order1.begin(), order1.begin() + n, 0);
  std::stable_sort(order1.begin(), order1.begin() + n,
                   [&](int32_t a, int32_t b) { return key[a] < key[b]; });

  // within-block re-sort by original index; pad rows pushed last
  // (key2 = blk * 2*np_ + order1 + (pad ? np_ : 0), stable)
  std::vector<int32_t> order2(np_);
  std::iota(order2.begin(), order2.end(), 0);
  std::stable_sort(order2.begin(), order2.end(), [&](int32_t a, int32_t b) {
    const int64_t ka = static_cast<int64_t>(a / block) * (2 * np_) +
                       order1[a] + (a >= n ? np_ : 0);
    const int64_t kb = static_cast<int64_t>(b / block) * (2 * np_) +
                       order1[b] + (b >= n ? np_ : 0);
    return ka < kb;
  });

  // pts4 rows + inv_perm + unique pad sentinel keys
  int pad_seen = 0;
  for (int p = 0; p < np_; ++p) {
    const int32_t src = order2[p];
    const bool is_pad = src >= n;
    const int32_t orig = order1[src];
    if (is_pad) {
      pts4[4 * p + 0] = kFar;
      pts4[4 * p + 1] = kFar;
      pts4[4 * p + 2] = kFar;
      pts4[4 * p + 3] = static_cast<float>(n + pad_seen++);
    } else {
      pts4[4 * p + 0] = pts[3 * orig + 0];
      pts4[4 * p + 1] = pts[3 * orig + 1];
      pts4[4 * p + 2] = pts[3 * orig + 2];
      pts4[4 * p + 3] = static_cast<float>(orig);
      inv_perm[orig] = p;
    }
  }

  // per-block bboxes over the sorted coords
  const int nb = np_ / block;
  for (int b = 0; b < nb; ++b) {
    float mn[3] = {pts4[4 * b * block], pts4[4 * b * block + 1],
                   pts4[4 * b * block + 2]};
    float mx[3] = {mn[0], mn[1], mn[2]};
    for (int r = 1; r < block; ++r) {
      const float* row = &pts4[4 * (b * block + r)];
      for (int d = 0; d < 3; ++d) {
        mn[d] = std::fmin(mn[d], row[d]);
        mx[d] = std::fmax(mx[d], row[d]);
      }
    }
    float* out = &blk_bbox[8 * b];
    out[0] = mn[0]; out[1] = mn[1]; out[2] = mn[2];
    out[3] = mx[0]; out[4] = mx[1]; out[5] = mx[2];
    out[6] = 0.0f;  out[7] = 0.0f;
  }
  return np_;
}

}  // extern "C"
