// Parallel row gather: memmap -> contiguous host batch.
//
// The ArrayStore hot loop (mmd_tpu/data/store.py batches()) gathers B rows
// from a large memory-mapped .npy column into a contiguous batch buffer.
// NumPy fancy indexing does this single-threaded; this does the same with N
// threads of straight memcpy — the native equivalent of the data-loader
// workers the reference got from torch DataLoader(num_workers=8)
// (reference train.py:31, dataset.py:181-192).
//
// Build: make -C mmd_tpu/native

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>
#include <algorithm>

extern "C" {

// src: base pointer of the (N, row_bytes) column; indices: (n,) int64 row
// ids; out: (n, row_bytes) destination.
void mmdgather_rows(const uint8_t* src, int64_t row_bytes,
                    const int64_t* indices, int64_t n,
                    uint8_t* out, int32_t num_threads) {
  int32_t nt = static_cast<int32_t>(
      std::max<int64_t>(1, std::min<int64_t>(num_threads, n)));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int32_t t = 0; t < nt; ++t) {
    threads.emplace_back([=]() {
      for (int64_t i = t; i < n; i += nt) {
        std::memcpy(out + i * row_bytes, src + indices[i] * row_bytes,
                    static_cast<size_t>(row_bytes));
      }
    });
  }
  for (auto& th : threads) th.join();
}

}  // extern "C"
