// Native semiring-GEMM verification oracle.
//
// TPU-framework re-build of the reference's host verification path
// (reference include/Utility.h:18-111): the generic `Naive` triple loop
// honoring the configurable (map, reduce) semiring, plus the BLAS-style
// cache-blocked fast path.  Exposed as a C ABI for ctypes
// (gemm_hls_tpu/utils/native.py); used by the test harness as the oracle
// for large problems where the numpy sweep is too slow.
//
// Layout: row-major A[m x k], B[k x n], C[m x n]; transpose flags mean the
// operand is stored transposed (A as [k x m], B as [n x k]) — the analogue
// of MM_TRANSPOSED_A (reference include/Config.h.in:41-43).

#include <algorithm>
#include <cstdint>
#include <limits>
#include <thread>
#include <vector>

namespace {

enum Op : int { kMul = 0, kAdd = 1, kMin = 2, kMax = 3, kAnd = 4, kOr = 5 };

template <typename T>
inline T apply(int op, T a, T b) {
  switch (op) {
    case kMul: return a * b;
    case kAdd: return a + b;
    case kMin: return std::min(a, b);
    case kMax: return std::max(a, b);
    case kAnd: return static_cast<T>(a != T(0) && b != T(0));
    case kOr:  return static_cast<T>(a != T(0) || b != T(0));
  }
  return T(0);
}

template <typename T>
inline T identity_of(int reduce_op) {
  switch (reduce_op) {
    case kAdd: return T(0);
    case kMin: return std::numeric_limits<T>::has_infinity
                   ? std::numeric_limits<T>::infinity()
                   : std::numeric_limits<T>::max();
    case kMax: return std::numeric_limits<T>::has_infinity
                   ? -std::numeric_limits<T>::infinity()
                   : std::numeric_limits<T>::lowest();
    case kMul: return T(1);
    case kOr:  return T(0);
    case kAnd: return T(1);
  }
  return T(0);
}

// Cache-blocked semiring GEMM over one row range.  The blocking mirrors the
// reference's two-level tiling idea scaled to L1/L2 instead of BRAM.
template <typename T>
void gemm_rows(const T* a, const T* b, T* c, int64_t m0, int64_t m1,
               int64_t n, int64_t k, int map_op, int reduce_op,
               bool ta, bool tb, int64_t lda, int64_t ldb) {
  constexpr int64_t BN = 256;
  constexpr int64_t BK = 256;
  const T ident = identity_of<T>(reduce_op);
  std::vector<T> acc(BN);
  for (int64_t i = m0; i < m1; ++i) {
    for (int64_t j0 = 0; j0 < n; j0 += BN) {
      const int64_t jn = std::min(BN, n - j0);
      std::fill(acc.begin(), acc.begin() + jn, ident);
      for (int64_t k0 = 0; k0 < k; k0 += BK) {
        const int64_t kn = std::min(BK, k - k0);
        for (int64_t kk = 0; kk < kn; ++kk) {
          const int64_t kg = k0 + kk;
          const T av = ta ? a[kg * lda + i] : a[i * lda + kg];
          const T* brow = tb ? nullptr : &b[kg * ldb + j0];
          if (tb) {
            for (int64_t jj = 0; jj < jn; ++jj) {
              const T bv = b[(j0 + jj) * ldb + kg];
              acc[jj] = apply<T>(reduce_op, acc[jj], apply<T>(map_op, av, bv));
            }
          } else {
            for (int64_t jj = 0; jj < jn; ++jj) {
              acc[jj] = apply<T>(reduce_op, acc[jj],
                                 apply<T>(map_op, av, brow[jj]));
            }
          }
        }
      }
      std::copy(acc.begin(), acc.begin() + jn, &c[i * n + j0]);
    }
  }
}

template <typename T>
int gemm_impl(const T* a, const T* b, T* c, int64_t m, int64_t n, int64_t k,
              int map_op, int reduce_op, int ta, int tb, int n_threads) {
  if (m < 0 || n < 0 || k < 0) return 1;
  if (map_op < 0 || map_op > 5 || reduce_op < 0 || reduce_op > 5) return 2;
  const int64_t lda = ta ? m : k;
  const int64_t ldb = tb ? k : n;
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = static_cast<int>(std::min<int64_t>(n_threads, std::max<int64_t>(m, 1)));
  if (n_threads == 1) {
    gemm_rows<T>(a, b, c, 0, m, n, k, map_op, reduce_op, ta, tb, lda, ldb);
    return 0;
  }
  std::vector<std::thread> pool;
  const int64_t rows_per = (m + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t r0 = t * rows_per;
    const int64_t r1 = std::min<int64_t>(m, r0 + rows_per);
    if (r0 >= r1) break;
    pool.emplace_back(gemm_rows<T>, a, b, c, r0, r1, n, k, map_op, reduce_op,
                      ta != 0, tb != 0, lda, ldb);
  }
  for (auto& th : pool) th.join();
  return 0;
}

}  // namespace

extern "C" {

int gemmref_f32(const float* a, const float* b, float* c, int64_t m,
                int64_t n, int64_t k, int map_op, int reduce_op, int ta,
                int tb, int n_threads) {
  return gemm_impl<float>(a, b, c, m, n, k, map_op, reduce_op, ta, tb,
                          n_threads);
}

int gemmref_f64(const double* a, const double* b, double* c, int64_t m,
                int64_t n, int64_t k, int map_op, int reduce_op, int ta,
                int tb, int n_threads) {
  return gemm_impl<double>(a, b, c, m, n, k, map_op, reduce_op, ta, tb,
                           n_threads);
}

int gemmref_i64(const int64_t* a, const int64_t* b, int64_t* c, int64_t m,
                int64_t n, int64_t k, int map_op, int reduce_op, int ta,
                int tb, int n_threads) {
  return gemm_impl<int64_t>(a, b, c, m, n, k, map_op, reduce_op, ta, tb,
                            n_threads);
}

int gemmref_version() { return 1; }

}  // extern "C"
