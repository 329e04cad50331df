// Native NL-Drive .bin loader.
//
// TPU-native replacement for the host-side role of the reference's
// torch DataLoader worker pool (train.py:64-69: 8-16 worker processes doing
// np.fromfile + random sampling).  Exposed via a tiny extern "C" surface for
// ctypes — no pybind11 dependency.
//
// Semantics match data/no_norm_datasets.py:43-55:
//   - raw float32 file reshaped (-1, 3)
//   - n >= num_points: uniform sample WITHOUT replacement
//   - n <  num_points: keep all n points as a prefix, pad by sampling WITH
//     replacement
// (The RNG stream differs from numpy's — the contract is "uniform random
// sample", not a bit-exact permutation.)

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct XorShift128 {
  uint64_t s0, s1;
  explicit XorShift128(uint64_t seed) {
    // splitmix64 init
    auto next = [&seed]() {
      seed += 0x9E3779B97f4A7C15ULL;
      uint64_t z = seed;
      z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
      z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
      return z ^ (z >> 31);
    };
    s0 = next();
    s1 = next();
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  // uniform in [0, bound)
  uint32_t below(uint32_t bound) { return (uint32_t)(next() % bound); }
};

// Load one .bin and sample num_points rows of 3 floats into out.
// Returns the raw point count, or a negative errno-style code.
int load_one(const char* path, int num_points, uint64_t seed, float* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -2;
  }
  size_t n = (size_t)st.st_size / (3 * sizeof(float));
  if (n == 0) {
    close(fd);
    return -3;
  }
  const float* data =
      (const float*)mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (data == MAP_FAILED) {
    close(fd);
    return -4;
  }

  XorShift128 rng(seed);
  if ((int64_t)n >= num_points) {
    // partial Fisher-Yates over an index array: first num_points entries are a
    // uniform sample without replacement
    std::vector<uint32_t> idx(n);
    for (size_t i = 0; i < n; ++i) idx[i] = (uint32_t)i;
    for (int i = 0; i < num_points; ++i) {
      uint32_t j = i + rng.below((uint32_t)(n - i));
      std::swap(idx[i], idx[j]);
      const float* src = data + (size_t)idx[i] * 3;
      out[i * 3 + 0] = src[0];
      out[i * 3 + 1] = src[1];
      out[i * 3 + 2] = src[2];
    }
  } else {
    memcpy(out, data, n * 3 * sizeof(float));
    for (int i = (int)n; i < num_points; ++i) {
      const float* src = data + (size_t)rng.below((uint32_t)n) * 3;
      out[i * 3 + 0] = src[0];
      out[i * 3 + 1] = src[1];
      out[i * 3 + 2] = src[2];
    }
  }
  munmap((void*)data, st.st_size);
  close(fd);
  return (int)n;
}

}  // namespace

extern "C" {

// Single file. out must hold num_points*3 floats.
int nld_load_and_sample(const char* path, int num_points, uint64_t seed,
                        float* out) {
  return load_one(path, num_points, seed, out);
}

// Batch of files loaded by a thread pool. paths: array of C strings;
// out: count * num_points * 3 floats; status: count ints (raw point counts or
// negative errors). Returns 0 on success, first negative status otherwise.
int nld_load_batch(const char** paths, int count, int num_points, uint64_t seed,
                   int n_threads, float* out, int* status) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int> cursor{0};
  auto worker = [&]() {
    for (;;) {
      int i = cursor.fetch_add(1);
      if (i >= count) return;
      status[i] = load_one(paths[i], num_points, seed + 0x5bd1e995u * (i + 1),
                           out + (size_t)i * num_points * 3);
    }
  };
  std::vector<std::thread> pool;
  int nt = n_threads < count ? n_threads : count;
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  for (int i = 0; i < count; ++i)
    if (status[i] < 0) return status[i];
  return 0;
}
}
