// Native host-side ops for the data pipeline.
//
// The reference ships CUDA extensions (libs/pointops) for device-side
// neighborhood ops; on TPU those became XLA programs (cdsegnet_tpu/ops).
// What remains hot on the HOST is the per-scene preprocessing: voxel
// hashing + grid sampling (pointcept/datasets/transform.py:796-933) runs in
// every dataloader worker for every scene. These C implementations replace
// the numpy hash/argsort/unique pipeline (one fused pass, no temporaries).
//
// Exposed via ctypes (see cdsegnet_tpu/data/native.py); built by
// csrc/Makefile into libcdseg_hostops.so.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <vector>

extern "C" {

// FNV64-1a over rows of a (n, 3) int32 array (matches
// GridSample.fnv_hash_vec bit-for-bit on the uint64 domain).
void fnv_hash_rows(const int32_t* grid, int64_t n, uint64_t* out) {
  constexpr uint64_t kBasis = 14695981039346656037ull;
  constexpr uint64_t kPrime = 1099511628211ull;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t h = kBasis;
    for (int j = 0; j < 3; ++j) {
      h *= kPrime;
      h ^= static_cast<uint64_t>(static_cast<int64_t>(grid[i * 3 + j]));
    }
    out[i] = h;
  }
}

// Grid sampling, train mode: for each occupied voxel pick one member
// (rotating by `pick` for test-fragment mode, random-offset by the caller
// for train mode). Returns the number of selected indices.
//
// keys:    (n,) voxel hashes
// order:   scratch (n,) — filled with the key-sorted permutation
// offsets: (n,) per-voxel random offsets (train) or a constant (test)
// sel:     out (<= n) selected indices
int64_t grid_sample_pick(const uint64_t* keys, int64_t n,
                         const int64_t* offsets, int64_t* order,
                         int64_t* sel) {
  std::iota(order, order + n, int64_t{0});
  std::sort(order, order + n,
            [keys](int64_t a, int64_t b) { return keys[a] < keys[b]; });
  int64_t n_vox = 0;
  int64_t run_start = 0;
  for (int64_t i = 1; i <= n; ++i) {
    if (i == n || keys[order[i]] != keys[order[run_start]]) {
      const int64_t count = i - run_start;
      const int64_t off = offsets[n_vox % n] % count;
      sel[n_vox++] = order[run_start + off];
      run_start = i;
    }
  }
  return n_vox;
}

// Brute-force k nearest neighbors on the host (used by offline
// preprocessing and the visualization tool's original-resolution remap).
void knn_host(const float* query, int64_t m, const float* ref, int64_t n,
              int64_t k, int64_t* out_idx, float* out_d2) {
  std::vector<std::pair<float, int64_t>> heap;
  for (int64_t i = 0; i < m; ++i) {
    heap.clear();
    const float qx = query[i * 3], qy = query[i * 3 + 1], qz = query[i * 3 + 2];
    for (int64_t j = 0; j < n; ++j) {
      const float dx = qx - ref[j * 3];
      const float dy = qy - ref[j * 3 + 1];
      const float dz = qz - ref[j * 3 + 2];
      const float d2 = dx * dx + dy * dy + dz * dz;
      if (static_cast<int64_t>(heap.size()) < k) {
        heap.emplace_back(d2, j);
        std::push_heap(heap.begin(), heap.end());
      } else if (d2 < heap.front().first) {
        std::pop_heap(heap.begin(), heap.end());
        heap.back() = {d2, j};
        std::push_heap(heap.begin(), heap.end());
      }
    }
    std::sort_heap(heap.begin(), heap.end());
    for (int64_t t = 0; t < k; ++t) {
      const auto& p = heap[std::min<int64_t>(t, heap.size() - 1)];
      out_idx[i * k + t] = p.second;
      out_d2[i * k + t] = p.first;
    }
  }
}

}  // extern "C"
