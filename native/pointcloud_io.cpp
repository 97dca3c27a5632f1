// Native data-loading hot path: read + crop + resample point-cloud binaries.
//
// The reference's host data path (datagenerator.py: per-step Python file
// reads, numpy crop, numpy random choice) is its known throughput sink
// (SURVEY.md §3.1). This library implements the same semantics in C++ with
// a thread pool so a TPU slice stays fed:
//   * .bin files are float32 rows of num_cols (XYZ first);
//   * crop: keep rows with x^2+y^2+z^2 <= crop_radius^2 (reference
//     datagenerator.py:144);
//   * resample to exactly num_points: without replacement when enough rows
//     survive, duplicate-pad with replacement otherwise (reference
//     :148-160). RNG is xoshiro256** seeded per call — statistically
//     equivalent to the reference's np.random.choice, not bit-identical
//     (documented divergence; the choice is random either way).
//
// C ABI only — loaded from Python via ctypes (no pybind11 in this image).
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Xoshiro256 {
  uint64_t s[4];
  explicit Xoshiro256(uint64_t seed) {
    // splitmix64 init
    for (int i = 0; i < 4; i++) {
      seed += 0x9E3779B97f4A7C15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      s[i] = z ^ (z >> 31);
    }
  }
  static uint64_t rotl(uint64_t x, int k) { return (x << k) | (x >> (64 - k)); }
  uint64_t next() {
    uint64_t result = rotl(s[1] * 5, 7) * 9;
    uint64_t t = s[1] << 17;
    s[2] ^= s[0]; s[3] ^= s[1]; s[1] ^= s[2]; s[0] ^= s[3]; s[2] ^= t;
    s[3] = rotl(s[3], 45);
    return result;
  }
  // uniform integer in [0, n) without modulo bias (Lemire)
  uint64_t below(uint64_t n) {
    __uint128_t m = ( (__uint128_t)next() ) * n;
    uint64_t l = (uint64_t)m;
    if (l < n) {
      uint64_t t = (-n) % n;
      while (l < t) { m = ((__uint128_t)next()) * n; l = (uint64_t)m; }
    }
    return (uint64_t)(m >> 64);
  }
};

// Read whole file into buf; returns row count or -1.
long read_rows(const char* path, int num_cols, std::vector<float>& buf) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (bytes < 0 || bytes % (long)(sizeof(float) * num_cols) != 0) {
    std::fclose(f);
    return -1;
  }
  buf.resize(bytes / sizeof(float));
  size_t got = std::fread(buf.data(), 1, (size_t)bytes, f);
  std::fclose(f);
  if (got != (size_t)bytes) return -1;
  return bytes / (long)(sizeof(float) * num_cols);
}

int load_one(const char* path, int num_cols, float crop_radius, int num_points,
             uint64_t seed, float* out) {
  std::vector<float> buf;
  long rows = read_rows(path, num_cols, buf);
  if (rows <= 0) return -1;

  // Crop: collect surviving row indices.
  const float r2 = crop_radius * crop_radius;
  std::vector<int64_t> keep;
  keep.reserve((size_t)rows);
  for (long i = 0; i < rows; i++) {
    const float* p = &buf[(size_t)i * num_cols];
    const float d2 = p[0] * p[0] + p[1] * p[1] + p[2] * p[2];
    if (crop_radius <= 0.0f || d2 <= r2) keep.push_back(i);
  }
  const int64_t n = (int64_t)keep.size();
  if (n == 0) return -2;

  Xoshiro256 rng(seed);
  auto emit = [&](int64_t src_row, int64_t dst_row) {
    std::memcpy(out + (size_t)dst_row * num_cols,
                &buf[(size_t)keep[(size_t)src_row] * num_cols],
                sizeof(float) * (size_t)num_cols);
  };

  if (n <= num_points) {
    for (int64_t i = 0; i < n; i++) emit(i, i);
    for (int64_t i = n; i < num_points; i++) emit((int64_t)rng.below((uint64_t)n), i);
  } else {
    // partial Fisher-Yates: first num_points of a random permutation
    for (int64_t i = 0; i < num_points; i++) {
      int64_t j = i + (int64_t)rng.below((uint64_t)(n - i));
      std::swap(keep[(size_t)i], keep[(size_t)j]);
      emit(i, i);
    }
  }
  return 0;
}

}  // namespace

extern "C" {

// Single file. Returns 0 ok, -1 io/format error, -2 empty after crop.
int f3d_load_processed(const char* path, int num_cols, float crop_radius,
                       int num_points, uint64_t seed, float* out) {
  return load_one(path, num_cols, crop_radius, num_points, seed, out);
}

// Batch with a thread pool. out is (n, num_points, num_cols) row-major.
// status is length n (per-file result codes). Returns 0 if all succeeded.
int f3d_load_processed_batch(const char** paths, int n, int num_cols,
                             float crop_radius, int num_points,
                             const uint64_t* seeds, float* out, int* status,
                             int num_threads) {
  if (num_threads <= 0) {
    num_threads = (int)std::thread::hardware_concurrency();
    if (num_threads <= 0) num_threads = 1;
  }
  if (num_threads > n) num_threads = n > 0 ? n : 1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = load_one(paths[i], num_cols, crop_radius, num_points, seeds[i],
                        out + (size_t)i * num_points * num_cols);
      status[i] = rc;
      if (rc != 0) failures.fetch_add(1);
    }
  };
  std::vector<std::thread> threads;
  for (int t = 0; t < num_threads; t++) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load() == 0 ? 0 : -1;
}

// Raw whole-file read into caller buffer (capacity = max_rows*num_cols
// floats). Returns row count, or negative on error/overflow.
long f3d_read_cloud(const char* path, int num_cols, float* out, long max_rows) {
  std::vector<float> buf;
  long rows = read_rows(path, num_cols, buf);
  if (rows < 0) return -1;
  if (rows > max_rows) return -2;
  std::memcpy(out, buf.data(), sizeof(float) * (size_t)rows * num_cols);
  return rows;
}

}  // extern "C"
