// Native host-side data pipeline for distillation_trajectories_tpu.
//
// The reference fed batches through torch DataLoader worker processes
// (data/dataset.py:34).  The TPU-native rebuild keeps datasets as flat
// uint8 arrays in host memory; this library provides the hot host-side
// ops — epoch shuffling and multi-threaded gather + [-1, 1] float32
// normalization into a caller-owned batch buffer — as a small C++ shared
// object (loaded via ctypes, with a pure-numpy fallback in
// distillation_trajectories_tpu/data/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC -o libdtt_data.so dtt_data.cpp -lpthread

#include <cstdint>
#include <cstring>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// Fisher-Yates shuffle of an index array, deterministic in `seed`.
void dtt_shuffle_indices(int64_t* idx, int64_t n, uint64_t seed) {
  std::mt19937_64 rng(seed);
  for (int64_t i = n - 1; i > 0; --i) {
    std::uniform_int_distribution<int64_t> dist(0, i);
    int64_t j = dist(rng);
    int64_t tmp = idx[i];
    idx[i] = idx[j];
    idx[j] = tmp;
  }
}

// Gather `batch` images (each `img_elems` uint8 values) selected by `idx`
// from `images`, converting to float32 in [-1, 1]:  out = u8/255*2-1.
// Parallelized across a thread pool sized to the host.
void dtt_gather_normalize(const uint8_t* images, const int64_t* idx,
                          int64_t batch, int64_t img_elems, float* out) {
  // Precomputed u8 -> [-1, 1] lookup table.
  float lut[256];
  for (int v = 0; v < 256; ++v) lut[v] = (float)v / 255.0f * 2.0f - 1.0f;

  int64_t n_threads = (int64_t)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n_threads > batch) n_threads = batch;

  auto work = [&](int64_t t0, int64_t t1) {
    for (int64_t b = t0; b < t1; ++b) {
      const uint8_t* src = images + idx[b] * img_elems;
      float* dst = out + b * img_elems;
      for (int64_t e = 0; e < img_elems; ++e) dst[e] = lut[src[e]];
    }
  };

  if (n_threads == 1) {
    work(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (batch + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < batch ? lo + chunk : batch;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

// Gather float32 images (already normalized) by index — the fast path for
// pre-normalized in-memory datasets.
void dtt_gather_f32(const float* images, const int64_t* idx, int64_t batch,
                    int64_t img_elems, float* out) {
  int64_t n_threads = (int64_t)std::thread::hardware_concurrency();
  if (n_threads < 1) n_threads = 1;
  if (n_threads > batch) n_threads = batch;

  auto work = [&](int64_t t0, int64_t t1) {
    for (int64_t b = t0; b < t1; ++b) {
      std::memcpy(out + b * img_elems, images + idx[b] * img_elems,
                  (size_t)img_elems * sizeof(float));
    }
  };
  if (n_threads == 1) {
    work(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  int64_t chunk = (batch + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = lo + chunk < batch ? lo + chunk : batch;
    if (lo >= hi) break;
    threads.emplace_back(work, lo, hi);
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
