// Native correctness oracle + timers for the tpujoin engine.
//
// The TPU-native equivalent of the reference's C++ support runtime
// (reference shared_stuff/shared.cpp): the reference verifies every GPU join
// by recomputing it with O(n*m) nested loops on the host and comparing both
// results as lexicographically-sorted multisets of (rowID_R, rowID_S) pairs
// (shared.cpp:129-171, sort+compare at :167-171, -1 on overflow at
// :158-160). This oracle keeps that exact contract and adds a sort-based
// O((n+m)log n + out) mode so the 100M-row benchmark configs are verifiable
// in practice (the quadratic mode is retained for small inputs as the
// independent ground truth).
//
// Exposed as a plain C ABI, bound from Python with ctypes (no pybind11 in
// the image). Build: make -C native   (g++ -O2 -shared -fPIC).

#include <algorithm>
#include <chrono>
#include <cstdint>
#include <cstdio>
#include <utility>
#include <vector>

namespace {

using Pair = std::pair<int32_t, int32_t>;

// Recompute the equi-join with literal nested loops — the reference's
// oracle semantics (shared.cpp:154-165).
std::vector<Pair> join_nested(const int32_t* rk, int64_t n, const int32_t* sk,
                              int64_t m) {
  std::vector<Pair> out;
  for (int64_t i = 0; i < n; ++i) {
    for (int64_t j = 0; j < m; ++j) {
      if (rk[i] == sk[j]) out.emplace_back((int32_t)i, (int32_t)j);
    }
  }
  return out;
}

// Sort-based recompute: independent fast path for large configs.
std::vector<Pair> join_sorted(const int32_t* rk, int64_t n, const int32_t* sk,
                              int64_t m) {
  std::vector<Pair> build(n);
  for (int64_t i = 0; i < n; ++i) build[i] = {rk[i], (int32_t)i};
  std::sort(build.begin(), build.end());
  std::vector<Pair> out;
  for (int64_t j = 0; j < m; ++j) {
    auto lo = std::lower_bound(build.begin(), build.end(),
                               Pair{sk[j], INT32_MIN});
    for (auto it = lo; it != build.end() && it->first == sk[j]; ++it) {
      out.emplace_back(it->second, (int32_t)j);
    }
  }
  return out;
}

}  // namespace

extern "C" {

// Exact result size of R join S (for capacity planning and size checks).
int64_t oracle_join_count(const int32_t* rk, int64_t n, const int32_t* sk,
                          int64_t m, int use_nested) {
  auto pairs = use_nested ? join_nested(rk, n, sk, m) : join_sorted(rk, n, sk, m);
  return (int64_t)pairs.size();
}

// Multiset-equality check of an engine result against the recomputed join.
// Returns 1 = exact multiset match, 0 = mismatch, -1 = size mismatch
// (the reference's overflow signal, shared.cpp:158-160).
int oracle_check(const int32_t* rk, int64_t n, const int32_t* sk, int64_t m,
                 const int32_t* res_r, const int32_t* res_s, int64_t nres,
                 int use_nested) {
  auto expected = use_nested ? join_nested(rk, n, sk, m)
                             : join_sorted(rk, n, sk, m);
  if ((int64_t)expected.size() != nres) return -1;
  std::vector<Pair> got(nres);
  for (int64_t i = 0; i < nres; ++i) got[i] = {res_r[i], res_s[i]};
  // exact multiset equality via lexicographic sort of both pair vectors
  // (reference shared.cpp:167-171)
  std::sort(expected.begin(), expected.end());
  std::sort(got.begin(), got.end());
  return expected == got ? 1 : 0;
}

// Group-by-count oracle: returns number of distinct keys; fills
// (keys_out, counts_out) ascending if non-null and capacity suffices.
int64_t oracle_group_count(const int32_t* keys, int64_t n, int32_t* keys_out,
                           int32_t* counts_out, int64_t capacity) {
  std::vector<int32_t> sorted(keys, keys + n);
  std::sort(sorted.begin(), sorted.end());
  int64_t groups = 0;
  int64_t i = 0;
  while (i < n) {
    int64_t j = i;
    while (j < n && sorted[j] == sorted[i]) ++j;
    if (keys_out && counts_out && groups < capacity) {
      keys_out[groups] = sorted[i];
      counts_out[groups] = (int32_t)(j - i);
    }
    ++groups;
    i = j;
  }
  return groups;
}

// Wall-clock timers with the reference's print contract
// ("For k, time taken: N microseconds", shared.cpp:10-31).
static std::chrono::high_resolution_clock::time_point g_t0;
static int g_timer_calls = 0;

void oracle_start_timer() { g_t0 = std::chrono::high_resolution_clock::now(); }

int64_t oracle_end_timer() {
  auto t1 = std::chrono::high_resolution_clock::now();
  auto us =
      std::chrono::duration_cast<std::chrono::microseconds>(t1 - g_t0).count();
  std::printf("For %d, time taken: %lld microseconds\n", g_timer_calls++,
              (long long)us);
  return (int64_t)us;
}

}  // extern "C"
