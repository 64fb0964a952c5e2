// Native batch-assembly engine for the host-stream input path.
//
// The reference feeds its GPU from 10 Python dataloader worker
// processes (SURVEY.md §3.1). On a TPU VM host the equivalent hot loop
// is assembling a contiguous batch from a memmapped dataset by row
// indices — a pure memory-bandwidth problem that Python/numpy fancy
// indexing serialises behind the GIL. This library does the gather with
// a small thread pool; Python binds it via ctypes
// (stil_tta_tpu/data/native_loader.py) and falls back to numpy when the
// shared object is absent.
//
// Build: make -C stil_tta_tpu/data/native   (g++ -O3 -shared -fPIC)

#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Gather rows of `row_bytes` bytes from `src` at `idx[0..n_idx)` into
// contiguous `dst`. Rows are independent; work is striped over threads.
void gather_rows(const uint8_t* src, const int64_t* idx, int64_t n_idx,
                 int64_t row_bytes, uint8_t* dst, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n_idx) return;
      std::memcpy(dst + i * row_bytes, src + idx[i] * row_bytes,
                  static_cast<size_t>(row_bytes));
    }
  };
  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Gather float32 rows and cast uint8 images to float32 scaled by 1/255
// in the same pass (fuses the convert_to_ts normalisation,
// utils/utils.py:34-38, into the copy).
void gather_rows_u8_to_f32(const uint8_t* src, const int64_t* idx,
                           int64_t n_idx, int64_t row_elems, float* dst,
                           float scale, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    for (;;) {
      int64_t i = next.fetch_add(1, std::memory_order_relaxed);
      if (i >= n_idx) return;
      const uint8_t* s = src + idx[i] * row_elems;
      float* d = dst + i * row_elems;
      for (int64_t j = 0; j < row_elems; ++j)
        d[j] = static_cast<float>(s[j]) * scale;
    }
  };
  if (n_threads == 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

}  // extern "C"
