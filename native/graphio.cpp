// gespmm_tpu native graph-IO: fast Matrix Market ingest + sparse transforms.
//
// TPU-native counterpart of the reference's C++ ingest layer
// (/root/reference/util/mmio.hpp + util/util.hpp readMtx/makeSymmetric/
// customSort, ~984 LoC of header library): a single translation unit
// exposing a C ABI consumed from Python via ctypes (no pybind11 in this
// image).  Behavioral contract matches gespmm_tpu/sparse/io.py exactly —
// the Python reader is the semantic oracle, this is the fast path
// (mmap-free buffered parse, ~10x faster than np.loadtxt on big .mtx).
//
// Exposed entry points (see utils/native.py for the ctypes signatures):
//   gio_read_mtx()   — parse + (optional) symmetrize + sort; returns handle
//   gio_get_*()      — copy-out accessors for row/col/val arrays
//   gio_free()       — release a handle
//   gio_coo_to_csr() — COO (sorted) -> CSR indptr
//   gio_csr_to_csc() — CSR -> CSC (counting sort; returns permutation)

#include <algorithm>
#include <cmath>
#include <limits>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cctype>
#include <string>
#include <vector>
#include <algorithm>
#include <numeric>

namespace {

struct Coo {
  int64_t rows = 0, cols = 0;
  std::vector<int32_t> ri, ci;
  std::vector<float> vals;
  std::string error;
};

// Buffered character source over a FILE*.
class Reader {
 public:
  explicit Reader(FILE* f) : f_(f) {}
  int peek() {
    if (pos_ == len_ && !fill()) return -1;
    return buf_[pos_];
  }
  int get() {
    if (pos_ == len_ && !fill()) return -1;
    return buf_[pos_++];
  }
  void skip_ws_line() {  // skip spaces/tabs (not newline)
    int c;
    while ((c = peek()) == ' ' || c == '\t' || c == '\r') get();
  }
  void skip_to_eol() {
    int c;
    while ((c = get()) != -1 && c != '\n') {}
  }
  bool read_int(int64_t* out) {
    skip_ws();
    int c = peek();
    bool neg = false;
    if (c == '-' || c == '+') { neg = (c == '-'); get(); c = peek(); }
    if (c < '0' || c > '9') return false;
    int64_t v = 0;
    while ((c = peek()) >= '0' && c <= '9') { v = v * 10 + (c - '0'); get(); }
    *out = neg ? -v : v;
    return true;
  }
  bool read_double(double* out) {
    skip_ws();
    // Collect a token and strtod it (handles exponents etc.).
    char tok[64];
    size_t i = 0;
    int c;
    while ((c = peek()) != -1 && !isspace(c) && i + 1 < sizeof tok) {
      tok[i++] = static_cast<char>(get());
    }
    tok[i] = 0;
    if (i == 0) return false;
    char* end = nullptr;
    *out = strtod(tok, &end);
    return end != tok;
  }
  void skip_ws() {
    int c;
    while ((c = peek()) != -1 && isspace(c)) get();
  }

 private:
  bool fill() {
    len_ = fread(buf_, 1, sizeof buf_, f_);
    pos_ = 0;
    return len_ > 0;
  }
  FILE* f_;
  char buf_[1 << 16];
  size_t pos_ = 0, len_ = 0;
};

// Row-major stable sort by (row, col). Uses index sort to keep vals aligned.
void sort_coo(Coo& c) {
  const size_t n = c.ri.size();
  std::vector<uint32_t> idx(n);
  std::iota(idx.begin(), idx.end(), 0u);
  std::stable_sort(idx.begin(), idx.end(), [&](uint32_t a, uint32_t b) {
    if (c.ri[a] != c.ri[b]) return c.ri[a] < c.ri[b];
    return c.ci[a] < c.ci[b];
  });
  std::vector<int32_t> ri(n), ci(n);
  std::vector<float> v(n);
  for (size_t i = 0; i < n; ++i) {
    ri[i] = c.ri[idx[i]];
    ci[i] = c.ci[idx[i]];
    v[i] = c.vals[idx[i]];
  }
  c.ri.swap(ri);
  c.ci.swap(ci);
  c.vals.swap(v);
}

// Mirror off-diagonal entries, sort, drop self-loops (optional) and
// (row,col) duplicates keeping the FIRST occurrence — the same observable
// behavior as the Python reader (and the reference's makeSymmetric).
void symmetrize(Coo& c, bool remove_self_loops) {
  const size_t n0 = c.ri.size();
  for (size_t i = 0; i < n0; ++i) {
    if (c.ri[i] != c.ci[i]) {
      c.ri.push_back(c.ci[i]);
      c.ci.push_back(c.ri[i]);
      c.vals.push_back(c.vals[i]);
    }
  }
  sort_coo(c);
  size_t w = 0;
  int32_t last_r = -1, last_c = -1;
  for (size_t i = 0; i < c.ri.size(); ++i) {
    if (remove_self_loops && c.ri[i] == c.ci[i]) continue;
    if (w > 0 && c.ri[i] == last_r && c.ci[i] == last_c) continue;
    last_r = c.ri[i];
    last_c = c.ci[i];
    c.ri[w] = c.ri[i];
    c.ci[w] = c.ci[i];
    c.vals[w] = c.vals[i];
    ++w;
  }
  c.ri.resize(w);
  c.ci.resize(w);
  c.vals.resize(w);
}

}  // namespace

extern "C" {

// symmetrize_mode: 0 = follow banner, 1 = force on, 2 = force off
void* gio_read_mtx(const char* path, int symmetrize_mode,
                   int remove_self_loops) {
  auto* coo = new Coo();
  FILE* f = fopen(path, "r");
  if (!f) {
    coo->error = "cannot open file";
    return coo;
  }
  Reader r(f);

  // Banner: %%MatrixMarket matrix coordinate <field> <symmetry>
  std::string banner;
  int ch;
  while ((ch = r.get()) != -1 && ch != '\n') banner.push_back((char)ch);
  for (auto& c : banner) c = (char)tolower(c);
  auto has = [&](const char* s) { return banner.find(s) != std::string::npos; };
  if (banner.rfind("%%matrixmarket", 0) != 0 || !has(" matrix") ||
      !has(" coordinate")) {
    coo->error = "bad banner: " + banner;
    fclose(f);
    return coo;
  }
  bool pattern = has(" pattern");
  bool integer = has(" integer");
  bool real = has(" real");
  bool symmetric = has(" symmetric");
  if (!pattern && !integer && !real) {
    coo->error = "unsupported field in banner: " + banner;
    fclose(f);
    return coo;
  }
  if (!symmetric && !has(" general")) {
    coo->error = "unsupported symmetry in banner: " + banner;
    fclose(f);
    return coo;
  }

  // Comments, then size line.
  r.skip_ws();
  while (r.peek() == '%') r.skip_to_eol(), r.skip_ws();
  int64_t nrows, ncols, nnz;
  if (!r.read_int(&nrows) || !r.read_int(&ncols) || !r.read_int(&nnz)) {
    coo->error = "bad size line";
    fclose(f);
    return coo;
  }
  coo->rows = nrows;
  coo->cols = ncols;
  coo->ri.reserve(nnz);
  coo->ci.reserve(nnz);
  coo->vals.reserve(nnz);

  for (int64_t i = 0; i < nnz; ++i) {
    int64_t a, b;
    if (!r.read_int(&a) || !r.read_int(&b)) {
      coo->error = "not enough entries";
      fclose(f);
      return coo;
    }
    double v = 1.0;
    if (!pattern) {
      if (!r.read_double(&v)) {
        coo->error = "missing value";
        fclose(f);
        return coo;
      }
    }
    coo->ri.push_back((int32_t)(a - 1));  // 1-based -> 0-based
    coo->ci.push_back((int32_t)(b - 1));
    coo->vals.push_back((float)v);
  }
  fclose(f);

  bool do_sym = symmetrize_mode == 1 || (symmetrize_mode == 0 && symmetric);
  if (do_sym) {
    symmetrize(*coo, remove_self_loops != 0);
  } else {
    sort_coo(*coo);
  }
  return coo;
}

const char* gio_error(void* h) {
  auto* coo = static_cast<Coo*>(h);
  return coo->error.empty() ? nullptr : coo->error.c_str();
}

int64_t gio_nnz(void* h) { return (int64_t)static_cast<Coo*>(h)->ri.size(); }
int64_t gio_rows(void* h) { return static_cast<Coo*>(h)->rows; }
int64_t gio_cols(void* h) { return static_cast<Coo*>(h)->cols; }

void gio_copy_out(void* h, int32_t* ri, int32_t* ci, float* vals) {
  auto* coo = static_cast<Coo*>(h);
  const size_t n = coo->ri.size();
  memcpy(ri, coo->ri.data(), n * sizeof(int32_t));
  memcpy(ci, coo->ci.data(), n * sizeof(int32_t));
  memcpy(vals, coo->vals.data(), n * sizeof(float));
}

void gio_free(void* h) { delete static_cast<Coo*>(h); }

// Sorted COO rows -> CSR indptr (counting pass).
void gio_coo_to_csr(const int32_t* rows, int64_t nnz, int64_t m,
                    int32_t* indptr /* m+1 */) {
  memset(indptr, 0, (m + 1) * sizeof(int32_t));
  for (int64_t i = 0; i < nnz; ++i) indptr[rows[i] + 1]++;
  for (int64_t r = 0; r < m; ++r) indptr[r + 1] += indptr[r];
}

// CSR -> CSC via counting sort over columns.  perm maps CSC position ->
// CSR position (csc_vals[i] = csr_vals[perm[i]]), matching
// sparse/formats.csr_to_csc.
void gio_csr_to_csc(const int32_t* indptr, const int32_t* indices,
                    int64_t m, int64_t n, int32_t* out_colptr /* n+1 */,
                    int32_t* out_rows /* nnz */, int32_t* out_perm /* nnz */) {
  const int64_t nnz = indptr[m];
  memset(out_colptr, 0, (n + 1) * sizeof(int32_t));
  for (int64_t i = 0; i < nnz; ++i) out_colptr[indices[i] + 1]++;
  for (int64_t c = 0; c < n; ++c) out_colptr[c + 1] += out_colptr[c];
  std::vector<int32_t> next(out_colptr, out_colptr + n);
  for (int64_t r = 0; r < m; ++r) {
    for (int32_t i = indptr[r]; i < indptr[r + 1]; ++i) {
      const int32_t c = indices[i];
      const int32_t dst = next[c]++;
      out_rows[dst] = (int32_t)r;
      out_perm[dst] = i;
    }
  }
}

// Pack row-windowed chunks for the stream-reduce SpMM plan (the native
// counterpart of the per-tile packing walk in
// gespmm_tpu/sparse/partition.py::build_tiled_plan; cross-tested for exact
// equality in tests/test_native.py).
//
// Inputs are one part's edges sorted by (column tile, row): `rows` are
// part-relative row ids, `tiles` the column-tile id per edge.  A chunk is
// up to E consecutive edges of one tile whose rows fit a window of R rows
// starting at an 8-aligned row_start.  Returns the chunk count; when the
// out pointers are non-null they must hold C*E / C elements (size with a
// first null-output call — the walk is deterministic).
//
//   local_rows:  row - row_start per slot, sentinel R on padded slots
//   row_start:   8-aligned window start per chunk (<= m_pad - R)
//   slot_to_edge:index into the sorted edge order per slot (-1 on pads)
//   chunk_tile:  column-tile id per chunk
int64_t gio_pack_chunks(const int32_t* rows, const int32_t* tiles,
                        int64_t nnz, int32_t R, int32_t E, int32_t m_pad,
                        int32_t* local_rows, int32_t* row_start,
                        int32_t* slot_to_edge, int32_t* chunk_tile) {
  const bool fill = local_rows != nullptr;
  int64_t c = 0;
  int64_t i = 0;
  while (i < nnz) {
    const int32_t t = tiles[i];
    int32_t r0 = (rows[i] / 8) * 8;
    if (r0 > m_pad - R) r0 = m_pad - R;
    if (r0 < 0) r0 = 0;
    int64_t j = i;
    while (j < nnz && j - i < E && tiles[j] == t && rows[j] < r0 + R) ++j;
    if (fill) {
      const int64_t base = c * E;
      for (int64_t k = 0; k < E; ++k) {
        const int64_t e = i + k;
        if (e < j) {
          local_rows[base + k] = rows[e] - r0;
          slot_to_edge[base + k] = (int32_t)e;
        } else {
          local_rows[base + k] = R;
          slot_to_edge[base + k] = -1;
        }
      }
      row_start[c] = r0;
      chunk_tile[c] = t;
    }
    ++c;
    i = j;
  }
  return c;
}

// Streaming Fennel partition (restreamed) — the native fast path of
// sparse/reorder.fennel_partition (same algorithm: degree-descending
// stream order, greedy argmax of neighbors-in-shard minus the Fennel
// load penalty alpha*gamma*|S|^(gamma-1), capacity cap with slack,
// `passes` restreams).  Python's per-node loop is ~1e5 nodes/s; this
// runs the 1M-node rmat20 pre-pass in seconds.  Deterministic
// (lowest-shard tie-break; no RNG).
void gio_fennel_partition(const int32_t* indptr, const int32_t* indices,
                          int64_t m, int32_t P, double gamma,
                          int32_t passes, double slack,
                          int32_t* labels) {
  if (P <= 1) {
    for (int64_t i = 0; i < m; ++i) labels[i] = 0;
    return;
  }
  const int64_t nnz = indptr[m];
  const int64_t cap =
      (int64_t)(((m + P - 1) / P) * (1.0 + (slack > 0 ? slack : 0))) + 1;
  const double alpha =
      std::sqrt((double)P) * (double)nnz / std::pow((double)m, 1.5);

  // Degree-descending stream order (hubs pinned first).
  std::vector<int64_t> order(m);
  for (int64_t i = 0; i < m; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return (indptr[a + 1] - indptr[a]) > (indptr[b + 1] - indptr[b]);
  });

  std::vector<int64_t> sizes(P, 0);
  std::vector<double> counts(P, 0.0);
  std::vector<int32_t> touched;
  touched.reserve(256);
  for (int64_t i = 0; i < m; ++i) labels[i] = -1;

  const int sweeps = passes > 0 ? passes : 1;
  for (int sweep = 0; sweep < sweeps; ++sweep) {
    for (int64_t oi = 0; oi < m; ++oi) {
      const int64_t v = order[oi];
      const int32_t old = labels[v];
      if (old >= 0) sizes[old] -= 1;
      touched.clear();
      for (int64_t e = indptr[v]; e < indptr[v + 1]; ++e) {
        const int32_t lab = labels[indices[e]];
        if (lab >= 0) {
          if (counts[lab] == 0.0) touched.push_back(lab);
          counts[lab] += 1.0;
        }
      }
      double best = -std::numeric_limits<double>::infinity();
      int32_t bestp = 0;
      // Ascending scan with strict > replicates np.argmax's
      // lowest-index-wins tie-break EXACTLY.  That matters: scores tie
      // often (integer counts, equal sizes), and a consistent
      // lowest-shard preference clusters tied nodes together (measured
      // cut 894 vs 1950 on the shuffled-SBM test when a
      // discovery-order tie-break was used instead).  O(P) per node.
      for (int32_t q = 0; q < P; ++q) {
        if (sizes[q] >= cap) continue;
        const double sc =
            counts[q] - alpha * gamma *
                            std::pow((double)(sizes[q] > 0 ? sizes[q] : 0),
                                     gamma - 1.0);
        if (sc > best) { best = sc; bestp = q; }
      }
      for (int32_t t : touched) counts[t] = 0.0;
      labels[v] = bestp;
      sizes[bestp] += 1;
    }
  }
}

}  // extern "C"
