// eicos_native: host-side native runtime for the eicos_tpu framework.
//
// The TPU compute path is JAX/XLA/Pallas; this library covers the *runtime*
// roles the reference implements in C++ (data ingestion, CSC interop,
// symbolic analysis) where native code genuinely beats Python:
//
//   * fast parsing of the embedded C-header problem corpus
//     (the reference ships ~55 kLoC of data headers,
//     /root/reference/test/*/*.h, driven by test/ecostester.cpp)
//   * CSC <-> dense conversion and fixed-pattern value updates
//     (the role of the reference's raw-CSC "traditional interface" ctor,
//     /root/reference/src/eicos.cpp:91-120, and updateData, :2032-2082)
//   * symbolic analysis for sparse KKT systems: reverse Cuthill-McKee
//     ordering, symmetric permutation, bandwidth/profile statistics
//     (the host-side replacement for the symbolic phase of Eigen's
//     SimplicialLDLT, /root/reference/include/eicos.hpp:221-222 — ordering
//     runs once per sparsity pattern at trace time; the numeric
//     factorization is a TPU kernel)
//
// Pure C API over int64/double buffers; bound from Python with ctypes
// (eicos_tpu/native.py), which also carries a NumPy fallback so the
// framework works without the compiled library.

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// CSC interop
// ---------------------------------------------------------------------------

// Scatter CSC (colptr jc[n+1], rowidx ir[nnz], values pr[nnz]) into a dense
// row-major (m, n) buffer (zero-initialised by this call).
void eicos_csc_to_dense(int64_t m, int64_t n, const double* pr,
                        const int64_t* jc, const int64_t* ir, double* dense) {
  std::memset(dense, 0, sizeof(double) * (size_t)m * (size_t)n);
  if (!pr || !jc || !ir) return;
  for (int64_t col = 0; col < n; ++col) {
    for (int64_t k = jc[col]; k < jc[col + 1]; ++k) {
      dense[ir[k] * n + col] = pr[k];
    }
  }
}

// Gather dense (m, n) row-major values back into a CSC value array through a
// fixed pattern — the updateData fast path: same sparsity, new values.
void eicos_dense_to_csc_values(int64_t m, int64_t n, const double* dense,
                               const int64_t* jc, const int64_t* ir,
                               double* pr) {
  (void)m;
  for (int64_t col = 0; col < n; ++col) {
    for (int64_t k = jc[col]; k < jc[col + 1]; ++k) {
      pr[k] = dense[ir[k] * n + col];
    }
  }
}

// Batched fixed-pattern scatter: nnz new values per batch lane -> dense
// (batch, m, n).  Used to stage batched updateData payloads.
void eicos_csc_to_dense_batch(int64_t batch, int64_t m, int64_t n,
                              const double* pr_batch, const int64_t* jc,
                              const int64_t* ir, double* dense_batch) {
  if (!jc || !ir) return;
  const int64_t nnz = jc[n];
  for (int64_t bi = 0; bi < batch; ++bi) {
    eicos_csc_to_dense(m, n, pr_batch + bi * nnz, jc, ir,
                       dense_batch + bi * m * n);
  }
}

// ---------------------------------------------------------------------------
// Corpus header parsing
// ---------------------------------------------------------------------------
//
// The corpus headers are C arrays of number literals.  Python-side regex
// splitting is the bottleneck when loading the larger LPnetlib problems
// (~10^6 literals); this scanner extracts all numbers after a given byte
// offset in one pass.

// Parse up to `cap` doubles from text[pos..len) into out.  Stops at the
// first '}' encountered outside a number.  Returns the count parsed, and
// writes the end offset to *end_pos.
int64_t eicos_parse_numbers(const char* text, int64_t len, int64_t pos,
                            double* out, int64_t cap, int64_t* end_pos) {
  int64_t cnt = 0;
  const char* p = text + pos;
  const char* end = text + len;
  while (p < end && cnt < cap) {
    char c = *p;
    if (c == '}') break;
    if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
      char* after = nullptr;
      double v = std::strtod(p, &after);
      if (after != p) {
        out[cnt++] = v;
        p = after;
        continue;
      }
    }
    ++p;
  }
  if (end_pos) *end_pos = (int64_t)(p - text);
  return cnt;
}

// Count number literals in text[pos..len) up to the terminating '}'.
int64_t eicos_count_numbers(const char* text, int64_t len, int64_t pos) {
  int64_t cnt = 0;
  const char* p = text + pos;
  const char* end = text + len;
  while (p < end) {
    char c = *p;
    if (c == '}') break;
    if (c == '-' || c == '+' || c == '.' || (c >= '0' && c <= '9')) {
      char* after = nullptr;
      std::strtod(p, &after);
      if (after != p) {
        ++cnt;
        p = after;
        continue;
      }
    }
    ++p;
  }
  return cnt;
}

// ---------------------------------------------------------------------------
// Symbolic analysis: RCM ordering + band/profile statistics
// ---------------------------------------------------------------------------
//
// For the sparse KKT path the numeric factorization runs on the TPU over a
// *static* structure; the ordering/permutation is computed here once per
// pattern.  Reverse Cuthill-McKee concentrates fill near the diagonal, which
// maps the factorization onto a regular blocked band — the TPU-friendly
// shape (static block sizes, MXU-tileable), unlike irregular supernodes.

// Graph given as symmetric CSC/CSR adjacency (jc[n+1], ir[nnz], diagonal
// entries ignored).  Writes perm (new order: perm[k] = old index) and
// returns 0, or -1 on allocation failure.
int64_t eicos_rcm_order(int64_t n, const int64_t* jc, const int64_t* ir,
                        int64_t* perm) {
  if (n == 0) return 0;
  std::vector<int64_t> deg((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t d = 0;
    for (int64_t k = jc[i]; k < jc[i + 1]; ++k)
      if (ir[k] != i) ++d;
    deg[(size_t)i] = d;
  }
  std::vector<char> seen((size_t)n, 0);
  std::vector<int64_t> order;
  order.reserve((size_t)n);
  // min-degree start node per connected component (classic CM heuristic)
  for (;;) {
    int64_t start = -1, best = INT64_MAX;
    for (int64_t i = 0; i < n; ++i)
      if (!seen[(size_t)i] && deg[(size_t)i] < best) {
        best = deg[(size_t)i];
        start = i;
      }
    if (start < 0) break;
    // BFS with neighbors visited in increasing-degree order
    std::queue<int64_t> q;
    q.push(start);
    seen[(size_t)start] = 1;
    while (!q.empty()) {
      int64_t u = q.front();
      q.pop();
      order.push_back(u);
      std::vector<int64_t> nbrs;
      for (int64_t k = jc[u]; k < jc[u + 1]; ++k) {
        int64_t v = ir[k];
        if (v != u && !seen[(size_t)v]) {
          seen[(size_t)v] = 1;
          nbrs.push_back(v);
        }
      }
      std::sort(nbrs.begin(), nbrs.end(), [&](int64_t a, int64_t b) {
        return deg[(size_t)a] < deg[(size_t)b] || (deg[(size_t)a] == deg[(size_t)b] && a < b);
      });
      for (int64_t v : nbrs) q.push(v);
    }
  }
  // reverse (the "R" in RCM)
  for (int64_t k = 0; k < n; ++k) perm[k] = order[(size_t)(n - 1 - k)];
  return 0;
}

// Bandwidth (max |i-j| over entries) and profile (sum of per-row left
// extents) of the symmetrically permuted pattern.  iperm maps old -> new.
void eicos_band_stats(int64_t n, const int64_t* jc, const int64_t* ir,
                      const int64_t* iperm, int64_t* bandwidth,
                      int64_t* profile) {
  int64_t bw = 0;
  int64_t prof = 0;
  // minrow is indexed by *new* (permuted) row index
  std::vector<int64_t> minrow((size_t)n);
  for (int64_t i = 0; i < n; ++i) minrow[(size_t)i] = i;
  for (int64_t col = 0; col < n; ++col) {
    int64_t pc = iperm ? iperm[col] : col;
    for (int64_t k = jc[col]; k < jc[col + 1]; ++k) {
      int64_t pr_ = iperm ? iperm[ir[k]] : ir[k];
      int64_t lo = pc < pr_ ? pc : pr_;
      int64_t hi = pc < pr_ ? pr_ : pc;
      int64_t d = hi - lo;
      if (d > bw) bw = d;
      if (lo < minrow[(size_t)hi]) minrow[(size_t)hi] = lo;
    }
  }
  for (int64_t i = 0; i < n; ++i) prof += i - minrow[(size_t)i];
  if (bandwidth) *bandwidth = bw;
  if (profile) *profile = prof;
}

// Library version/capability probe for the ctypes binding.
int64_t eicos_native_abi(void) { return 1; }

}  // extern "C"
