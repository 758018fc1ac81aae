// Native runtime components for recsys_tpu (C API, loaded via ctypes).
//
// 1. parse_ratings_dat: high-throughput parser for the MovieLens
//    "::"-separated ratings format (user::movie::rating::timestamp).
//    Replaces pandas' python-engine read_csv on the 1M-row hot path of
//    preprocessing (reference: src/preprocessing.py:164-169). Single
//    pass over the mmap'd/own buffer, branch-light integer scanning.
//
// 2. topk_dot: exact top-k by dot product over a row-major float32
//    item matrix, one min-heap per query, multi-threaded across
//    queries. This is the host-side serving fallback filling the role
//    FAISS IndexFlatIP plays for the reference (src/trainer.py:236-248)
//    when no accelerator is attached; the TPU path uses the on-device
//    scorer instead.
//
// Build: make -C native   (produces libnative.so; -O3 -march=native
// lets the compiler vectorize the dot-product inner loop with AVX2).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <thread>
#include <vector>

extern "C" {

// Parse a ratings.dat buffer. Returns number of rows parsed, or -1 on
// malformed input. Output arrays must be pre-allocated with capacity
// max_rows.
int64_t parse_ratings_dat(const char* buf, int64_t len,
                          int64_t max_rows,
                          int64_t* user_out, int64_t* movie_out,
                          double* rating_out, int64_t* ts_out) {
  int64_t row = 0;
  const char* p = buf;
  const char* end = buf + len;
  while (p < end && row < max_rows) {
    // skip blank lines
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    int64_t fields[4] = {0, 0, 0, 0};
    double rating = 0.0;
    bool ok = true;
    for (int f = 0; f < 4 && ok; ++f) {
      // parse integer (ratings are integers in ML-1M; accept x.y too)
      int64_t v = 0;
      bool any = false;
      bool neg = false;
      if (p < end && *p == '-') { neg = true; ++p; }
      while (p < end && *p >= '0' && *p <= '9') {
        v = v * 10 + (*p - '0');
        ++p;
        any = true;
      }
      double dv = static_cast<double>(v);
      if (f == 2 && p < end && *p == '.') {  // fractional rating
        ++p;
        double frac = 0.1;
        while (p < end && *p >= '0' && *p <= '9') {
          dv += (*p - '0') * frac;
          frac *= 0.1;
          ++p;
        }
      }
      if (!any) { ok = false; break; }
      if (neg) { v = -v; dv = -dv; }
      fields[f] = v;
      if (f == 2) rating = dv;
      if (f < 3) {
        // expect "::" separator
        if (p + 1 < end && p[0] == ':' && p[1] == ':') {
          p += 2;
        } else {
          ok = false;
        }
      }
    }
    if (!ok) {
      // skip to next line, count nothing
      while (p < end && *p != '\n') ++p;
      continue;
    }
    user_out[row] = fields[0];
    movie_out[row] = fields[1];
    rating_out[row] = rating;
    ts_out[row] = fields[3];
    ++row;
    while (p < end && *p != '\n') ++p;
  }
  return row;
}

// Exact top-k dot-product search.
//   queries:  [n_q, dim] row-major float32
//   items:    [n_items, dim] row-major float32
//   bias:     optional [n_items] added to every score (nullptr = none)
//   scores_out: [n_q, k], ids_out: [n_q, k] (descending score order)
void topk_dot(const float* queries, int64_t n_q,
              const float* items, int64_t n_items, int64_t dim,
              const float* bias, int64_t k,
              float* scores_out, int32_t* ids_out,
              int32_t n_threads) {
  if (k > n_items) k = n_items;
  if (n_threads <= 0) {
    n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  std::atomic<int64_t> next_q{0};
  auto worker = [&]() {
    using Entry = std::pair<float, int32_t>;  // (score, id), min-heap
    std::vector<Entry> heap;
    heap.reserve(k + 1);
    for (;;) {
      int64_t q = next_q.fetch_add(1);
      if (q >= n_q) break;
      const float* qv = queries + q * dim;
      heap.clear();
      auto cmp = [](const Entry& a, const Entry& b) { return a.first > b.first; };
      for (int64_t i = 0; i < n_items; ++i) {
        const float* iv = items + i * dim;
        float s = 0.f;
        for (int64_t d = 0; d < dim; ++d) s += qv[d] * iv[d];
        if (bias) s += bias[i];
        if (static_cast<int64_t>(heap.size()) < k) {
          heap.emplace_back(s, static_cast<int32_t>(i));
          std::push_heap(heap.begin(), heap.end(), cmp);
        } else if (s > heap.front().first) {
          std::pop_heap(heap.begin(), heap.end(), cmp);
          heap.back() = {s, static_cast<int32_t>(i)};
          std::push_heap(heap.begin(), heap.end(), cmp);
        }
      }
      std::sort(heap.begin(), heap.end(),
                [](const Entry& a, const Entry& b) { return a.first > b.first; });
      for (int64_t j = 0; j < k; ++j) {
        scores_out[q * k + j] = heap[j].first;
        ids_out[q * k + j] = heap[j].second;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int32_t t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// L2-normalize rows in place ([n, dim] float32).
void l2_normalize_rows(float* data, int64_t n, int64_t dim) {
  for (int64_t i = 0; i < n; ++i) {
    float* row = data + i * dim;
    float ss = 0.f;
    for (int64_t d = 0; d < dim; ++d) ss += row[d] * row[d];
    float inv = ss > 1e-24f ? 1.0f / std::sqrt(ss) : 0.f;
    for (int64_t d = 0; d < dim; ++d) row[d] *= inv;
  }
}

// 3. gather_batch: the streaming data-loader's hot op — materialize one
//    shuffled batch from column arrays: dst[c][j] = src[c][idx[j]] for
//    every column, rows of arbitrary byte width. Threaded over index
//    ranges (each thread copies its row range across ALL columns, so a
//    row's columns stay cache-warm together). Called through ctypes,
//    which releases the GIL — a Python prefetch thread overlaps the
//    next batch's gather with the device step at full parallelism
//    (data/pipeline.py::NativeBatcher). Replaces NumPy fancy indexing,
//    which is single-threaded and re-walks the index array per column.
//
//    src[c]: base pointer of column c (contiguous, n_rows rows of
//    row_bytes[c] bytes each); idx: [n_idx] row indices (caller
//    guarantees in-range); dst[c]: [n_idx * row_bytes[c]] output.
void gather_batch(int32_t n_cols, const void** src,
                  const int64_t* row_bytes, const int64_t* idx,
                  int64_t n_idx, void** dst, int32_t n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int32_t>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads > n_idx) n_threads = n_idx > 0 ? static_cast<int32_t>(n_idx) : 1;
  auto worker = [&](int64_t lo, int64_t hi) {
    for (int32_t c = 0; c < n_cols; ++c) {
      const int64_t rb = row_bytes[c];
      const char* s = static_cast<const char*>(src[c]);
      char* d = static_cast<char*>(dst[c]);
      // per-column inner loop: wide rows memcpy, narrow rows get a
      // typed fast path the compiler can vectorize the addressing of
      if (rb == 4) {
        const uint32_t* s4 = reinterpret_cast<const uint32_t*>(s);
        uint32_t* d4 = reinterpret_cast<uint32_t*>(d);
        for (int64_t j = lo; j < hi; ++j) d4[j] = s4[idx[j]];
      } else if (rb == 8) {
        const uint64_t* s8 = reinterpret_cast<const uint64_t*>(s);
        uint64_t* d8 = reinterpret_cast<uint64_t*>(d);
        for (int64_t j = lo; j < hi; ++j) d8[j] = s8[idx[j]];
      } else {
        for (int64_t j = lo; j < hi; ++j)
          std::memcpy(d + j * rb, s + idx[j] * rb, rb);
      }
    }
  };
  if (n_threads == 1) {
    worker(0, n_idx);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (n_idx + n_threads - 1) / n_threads;
  for (int32_t t = 0; t < n_threads; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n_idx, lo + chunk);
    if (lo >= hi) break;
    threads.emplace_back(worker, lo, hi);
  }
  for (auto& t : threads) t.join();
}

}  // extern "C"
