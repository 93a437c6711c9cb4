// Native host runtime for aligner-tpu.
//
// Implements the exact reference DP semantics (SURVEY.md §2.3 — single
// mutable gap-penalty state, top>left>diagonal tie-breaks with f64-epsilon
// compares, Beginning on exact zero in local mode, global border quirk) in
// scalar C++ for the host-side paths where a device launch is not worth it:
// single-pair alignment, golden-fixture generation, and the traceback walk
// over device-produced direction planes.  Mirrors
// aligner-core/src/simple/mod.rs and pwm/mod.rs operation-for-operation;
// results are bit-identical to the Python oracle (same IEEE-754 double ops
// in the same order), which tests enforce.
//
// Exposed as a plain C ABI for ctypes.  All matrices are row-major C
// doubles; direction planes are uint8 with TOP=0 LEFT=1 DIAG=2 BEG=3.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr uint8_t TOP = 0, LEFT = 1, DIAG = 2, BEG = 3;
constexpr double EPS = std::numeric_limits<double>::epsilon();

inline void direction(double top, double left, double diag, bool with_beg,
                      double* val, uint8_t* dir) {
  double m = top > left ? top : left;
  m = m > diag ? m : diag;
  uint8_t d;
  if (with_beg && m == 0.0) {
    d = BEG;
  } else if (std::abs(m - top) < EPS) {
    d = TOP;
  } else if (std::abs(m - left) < EPS) {
    d = LEFT;
  } else {
    d = DIAG;
  }
  *val = m;
  *dir = d;
}

}  // namespace

extern "C" {

// Local (SW-style) fill (simple/mod.rs:179-210).  plane: (tn+1)*(qn+1)
// doubles; dirs: same shape uint8.  Both must be zero/BEG-initialized by
// the caller.  Returns nothing; the caller scans for the argmax.
void an_fill_local(const int8_t* q, int64_t qn, const int8_t* t, int64_t tn,
                   const double* mat, int64_t vol, double del, double ext,
                   double* plane, uint8_t* dirs) {
  const int64_t W = qn + 1;
  double pen = del;
  for (int64_t x = 1; x <= qn; ++x) {
    const int64_t qc = q[x - 1];
    for (int64_t y = 1; y <= tn; ++y) {
      const double s = mat[t[y - 1] * vol + qc];
      double v;
      uint8_t d;
      direction(plane[(y - 1) * W + x] - pen, plane[y * W + x - 1] - pen,
                plane[(y - 1) * W + x - 1] + s, /*with_beg=*/true, &v, &d);
      pen = d != BEG ? ext : del;
      plane[y * W + x] = v;
      dirs[y * W + x] = d;
    }
  }
}

// Global (NW-style) fill with the border overwrite quirk
// (simple/mod.rs:53-97).
void an_fill_global(const int8_t* q, int64_t qn, const int8_t* t, int64_t tn,
                    const double* mat, int64_t vol, double del, double ext,
                    double* plane, uint8_t* dirs) {
  const int64_t W = qn + 1;
  for (int64_t x = 1; x <= qn; ++x) {
    plane[x] = -static_cast<double>(x) * del;
    dirs[x] = LEFT;
  }
  for (int64_t y = 1; y <= tn; ++y) {
    plane[y * W] = -static_cast<double>(y) * del;
    dirs[y * W] = TOP;
  }
  plane[qn] = -(static_cast<double>(qn) + 1.0) * del;
  plane[tn * W] = -(static_cast<double>(tn) + 1.0) * del;

  double pen = del;
  for (int64_t x = 1; x <= qn; ++x) {
    const int64_t qc = q[x - 1];
    for (int64_t y = 1; y <= tn; ++y) {
      const double s = mat[t[y - 1] * vol + qc];
      double v;
      uint8_t d;
      direction(plane[(y - 1) * W + x] - pen, plane[y * W + x - 1] - pen,
                plane[(y - 1) * W + x - 1] + s, /*with_beg=*/false, &v, &d);
      pen = d != BEG ? ext : del;  // never BEG here → ext after cell (1,1)
      plane[y * W + x] = v;
      dirs[y * W + x] = d;
    }
  }
}

// PWM fill (pwm/mod.rs:44-74): plane dims (qn+1, width+1), score =
// pwm[q[y-1], x-1] with pwm of shape (4, width).
void an_fill_pwm(const int8_t* q, int64_t qn, const double* pwm,
                 int64_t width, double del, double ext, double* plane,
                 uint8_t* dirs) {
  const int64_t W = width + 1;
  double pen = del;
  for (int64_t x = 1; x <= width; ++x) {
    for (int64_t y = 1; y <= qn; ++y) {
      const double s = pwm[q[y - 1] * width + (x - 1)];
      double v;
      uint8_t d;
      direction(plane[(y - 1) * W + x] - pen, plane[y * W + x - 1] - pen,
                plane[(y - 1) * W + x - 1] + s, /*with_beg=*/true, &v, &d);
      pen = d != BEG ? ext : del;
      plane[y * W + x] = v;
      dirs[y * W + x] = d;
    }
  }
}

// First maximum in row-major order over the full plane (ndarray argmax,
// simple/mod.rs:212).  Returns flat index.
int64_t an_argmax(const double* plane, int64_t n) {
  int64_t best = 0;
  double bv = plane[0];
  for (int64_t i = 1; i < n; ++i) {
    if (plane[i] > bv) {
      bv = plane[i];
      best = i;
    }
  }
  return best;
}

// Traceback walk (simple/mod.rs:107-127/220-242, pwm/mod.rs:81-103).
//
// dirs: (rows1 x cols1) uint8 plane.  Starts at (sy, sx); pushes into
// qa/ta (caller-allocated, capacity >= rows1 + cols1 + 1) in walk order
// (reversed alignment); returns the emitted length and writes the final
// (cy, cx) to end_y/end_x.  pwm_mode: ta receives numbered positions
// (0 = gap) and BLANK is 98.
int64_t an_traceback(const uint8_t* dirs, int64_t rows1, int64_t cols1,
                     int64_t sy, int64_t sx, const int8_t* q, const int8_t* t,
                     int pwm_mode, int16_t* qa, int16_t* ta, int64_t* end_y,
                     int64_t* end_x) {
  constexpr int16_t BLANK = 98;
  int64_t cy = sy, cx = sx, n = 0;
  for (;;) {
    const uint8_t d = dirs[cy * cols1 + cx];
    if (d == BEG) break;
    switch (d) {
      case TOP:
        if (pwm_mode) {
          ta[n] = 0;
          qa[n] = q[cy - 1];
        } else {
          qa[n] = BLANK;
          ta[n] = t[cy - 1];
        }
        --cy;
        break;
      case LEFT:
        if (pwm_mode) {
          ta[n] = static_cast<int16_t>(cx);
          qa[n] = BLANK;
        } else {
          qa[n] = q[cx - 1];
          ta[n] = BLANK;
        }
        --cx;
        break;
      default:  // DIAG
        if (pwm_mode) {
          ta[n] = static_cast<int16_t>(cx);
          qa[n] = q[cy - 1];
        } else {
          qa[n] = q[cx - 1];
          ta[n] = t[cy - 1];
        }
        --cx;
        --cy;
        break;
    }
    ++n;
  }
  *end_y = cy;
  *end_x = cx;
  return n;
}

// Batched traceback over a stack of direction planes (B, rows1, cols1):
// one call per device batch instead of a Python loop.  Outputs are packed
// back-to-back; offsets[b] gives the start of problem b's walk, lens[b]
// its length.  seq stride layouts: q (B, qmax), t (B, tmax).
void an_traceback_batch(const uint8_t* dirs, int64_t B, int64_t rows1,
                        int64_t cols1, const int64_t* sy, const int64_t* sx,
                        const int8_t* q, int64_t qmax, const int8_t* t,
                        int64_t tmax, int pwm_mode, int16_t* qa_buf,
                        int16_t* ta_buf, int64_t* offsets, int64_t* lens,
                        int64_t* end_y, int64_t* end_x) {
  const int64_t cap = rows1 + cols1 + 1;
  for (int64_t b = 0; b < B; ++b) {
    offsets[b] = b * cap;
    lens[b] = an_traceback(dirs + b * rows1 * cols1, rows1, cols1, sy[b],
                           sx[b], q + b * qmax, t + b * tmax, pwm_mode,
                           qa_buf + b * cap, ta_buf + b * cap, end_y + b,
                           end_x + b);
  }
}

// Sequence encoding (enums.rs from_u8_vec semantics): LUT maps byte →
// code or -1 for invalid.  Skips invalid characters; returns the kept
// length.  Also tallies per-code counts (counts has `vol` slots) and
// emits gap-compaction index records (coord, cumulative offset, local
// run length — enums.rs:325-363) into idx_* arrays (capacity n), with
// *n_idx set to the number of records (in ascending coord order; callers
// reverse for the engine's lookup order).
int64_t an_encode(const uint8_t* raw, int64_t n, const int16_t* lut256,
                  int64_t vol, int8_t* out, int64_t* counts,
                  int64_t* idx_coord, int64_t* idx_offset, int64_t* idx_local,
                  int64_t* n_idx) {
  int64_t kept = 0, skipped = 0, run = 0, records = 0;
  for (int64_t i = 0; i < n; ++i) {
    const int16_t code = lut256[raw[i]];
    if (code < 0) {
      ++skipped;
      ++run;
      continue;
    }
    if (run > 0) {
      idx_coord[records] = kept;
      idx_offset[records] = skipped;
      idx_local[records] = run;
      ++records;
      run = 0;
    }
    out[kept++] = static_cast<int8_t>(code);
    if (code < vol) ++counts[code];
  }
  *n_idx = records;
  return kept;
}

// ---------------------------------------------------------------------------
// Streaming local fill for huge pairs (memory-bounded exact SW).
//
// The reference (and the materializing fills above) hold the full
// (tn+1)x(qn+1) plane; a chromosome-scale local pair cannot.  The local
// fill is inherently serial — the gap-penalty state chains through every
// cell in fill order (simple/mod.rs:185-205, see SURVEY.md §2.3.3) — so
// the right memory-bounded engine is this scalar one: stream the fill
// column-by-column (the reference's fill order: query x outer, target y
// inner) keeping ONE live column, checkpoint the column every `cb`
// columns plus the penalty state entering the next column, and track the
// argmax online with first-in-row-major tie-breaking (ndarray argmax,
// simple/mod.rs:212).  The traceback then replays one cb-wide column
// block at a time.  Peak memory O(tn * (qn/cb + cb)) instead of
// O(qn * tn); results are bit-identical to an_fill_local + an_argmax +
// an_traceback (same IEEE-754 ops in the same order).

namespace {

// One column step of the local fill, shared by the streaming forward
// pass and the block replay so their FP op order cannot diverge.
// col[] holds the previous column on entry and the new column on exit
// (col[0] stays 0 — the y=0 border row).  dirs, when non-null, receives
// tn+1 entries for this column (dirs[0] = BEG, the border row).
inline void local_column_step(const int8_t* t, int64_t tn, const double* mat,
                              int64_t vol, int64_t qc, double del, double ext,
                              double* col, double* pen, uint8_t* dirs,
                              double* best_v, int64_t* best_y,
                              int64_t* best_x, int64_t x) {
  double diag = col[0];
  if (dirs) dirs[0] = BEG;
  for (int64_t y = 1; y <= tn; ++y) {
    const double s = mat[t[y - 1] * vol + qc];
    const double left = col[y];
    double v;
    uint8_t d;
    direction(col[y - 1] - *pen, left - *pen, diag + s,
              /*with_beg=*/true, &v, &d);
    *pen = d != BEG ? ext : del;
    diag = left;
    col[y] = v;
    if (dirs) dirs[y] = d;
    if (best_v &&
        (v > *best_v || (v == *best_v && y < *best_y))) {
      // column-major scan order reproduces row-major-first argmax:
      // strictly-greater wins; an equal value wins only with a smaller
      // row (equal rows imply a later column here, which loses)
      *best_v = v;
      *best_y = y;
      *best_x = x;
    }
  }
}

}  // namespace

// Forward pass.  ck_cols: (qn/cb + 1, tn+1) checkpoint slots — slot k
// stores DP column k*cb (slot 0 is the all-zero border column); ck_pen:
// matching penalty state entering column k*cb + 1.  best_* start at the
// border argmax (0, (0,0)) and end at the plane argmax in
// first-row-major order; a final (0,0) means no positive cell
// (ResultIsEmpty upstream, same as the materialized path).
void an_fill_local_stream(const int8_t* q, int64_t qn, const int8_t* t,
                          int64_t tn, const double* mat, int64_t vol,
                          double del, double ext, int64_t cb, double* ck_cols,
                          double* ck_pen, double* best_v, int64_t* best_y,
                          int64_t* best_x) {
  const int64_t W = tn + 1;
  std::vector<double> col(W, 0.0);
  double pen = del;
  std::memset(ck_cols, 0, sizeof(double) * W);
  ck_pen[0] = pen;
  *best_v = 0.0;
  *best_y = 0;
  *best_x = 0;
  for (int64_t x = 1; x <= qn; ++x) {
    local_column_step(t, tn, mat, vol, q[x - 1], del, ext, col.data(), &pen,
                      nullptr, best_v, best_y, best_x, x);
    if (x % cb == 0) {
      std::memcpy(ck_cols + (x / cb) * W, col.data(), sizeof(double) * W);
      ck_pen[x / cb] = pen;
    }
  }
}

// Replay columns x0+1 .. x0+nx from checkpoint state (col0 = DP column
// x0, pen0 = penalty entering cell (x0+1, 1)), emitting direction
// columns into dirs (nx, tn+1) — dirs[(x - x0 - 1)*(tn+1) + y].
void an_replay_local_block(const int8_t* q, const int8_t* t, int64_t tn,
                           const double* mat, int64_t vol, double del,
                           double ext, int64_t x0, int64_t nx,
                           const double* col0, double pen0, uint8_t* dirs) {
  const int64_t W = tn + 1;
  std::vector<double> col(col0, col0 + W);
  double pen = pen0;
  for (int64_t i = 0; i < nx; ++i) {
    local_column_step(t, tn, mat, vol, q[x0 + i], del, ext, col.data(), &pen,
                      dirs + i * W, nullptr, nullptr, nullptr, 0);
  }
}

// Walk within one replayed block.  Pushes (walk-order, reversed
// alignment) into qa/ta exactly like an_traceback's pairwise mode;
// returns 1 when the walk hit a BEG cell (done) and 0 when it left the
// block through its left edge (*cx == x0; the caller replays the
// previous block and continues).  cy/cx/n are in-out.
int an_walk_local_cols(const uint8_t* dirs, int64_t tn, int64_t x0,
                       int64_t nx, const int8_t* q, const int8_t* t,
                       int64_t* cy, int64_t* cx, int16_t* qa, int16_t* ta,
                       int64_t* n) {
  constexpr int16_t BLANK = 98;
  const int64_t W = tn + 1;
  int64_t y = *cy, x = *cx, k = *n;
  while (x > x0) {
    const uint8_t d = dirs[(x - x0 - 1) * W + y];
    if (d == BEG) {
      *cy = y;
      *cx = x;
      *n = k;
      return 1;
    }
    switch (d) {
      case TOP:
        qa[k] = BLANK;
        ta[k] = t[y - 1];
        --y;
        break;
      case LEFT:
        qa[k] = q[x - 1];
        ta[k] = BLANK;
        --x;
        break;
      default:  // DIAG
        qa[k] = q[x - 1];
        ta[k] = t[y - 1];
        --x;
        --y;
        break;
    }
    ++k;
  }
  *cy = y;
  *cx = x;
  *n = k;
  return x == 0;  // column 0 is all-BEG border: the walk is done there
}

// ---------------------------------------------------------------------------
// Statistics ML fit: the step-halving/doubling h-search
// (statistics/mod.rs:191-238), the measured cost center of
// calculate_p_value (a non-converging search burns MAXITER=10000
// iterations of ~12 NumPy array ops; here it is one C loop).
//
// Bit-exactness contract: the Python fallback in aligner_tpu/statistics.py
// stays the semantics oracle; this function must reproduce it EXACTLY.
// Three ingredients make that possible:
//   * the loop body is pure arithmetic — the transcendentals
//     (log(k·qlen·tl) and k·exp(-λ·scores)) are loop-invariant and are
//     computed by NumPy in the caller (np.exp/np.log are NOT
//     reproducible by libm — measured ~5% ULP mismatches);
//   * sums use numpy's exact pairwise-summation algorithm (below);
//   * the build disables FMA contraction (-ffp-contract=off in
//     native.py) so every double op rounds exactly like NumPy's
//     elementwise kernels.
// statistics.py additionally self-checks this path bit-for-bit against
// the Python loop on a probe dataset at first use and falls back if the
// platform ever diverges.

namespace {

// np.sum's pairwise summation (numpy/core/src/umath/loops.c.src,
// pairwise_sum_DOUBLE): sequential < 8, 8-accumulator unrolled <= 128,
// recursive halving above (split rounded down to a multiple of 8).
double pw_sum(const double* a, int64_t n) {
  if (n < 8) {
    double s = 0.0;
    for (int64_t i = 0; i < n; ++i) s += a[i];
    return s;
  }
  if (n <= 128) {
    double r[8];
    for (int j = 0; j < 8; ++j) r[j] = a[j];
    int64_t i = 8;
    for (; i < n - (n % 8); i += 8)
      for (int j = 0; j < 8; ++j) r[j] += a[i + j];
    double s = ((r[0] + r[1]) + (r[2] + r[3])) + ((r[4] + r[5]) + (r[6] + r[7]));
    for (; i < n; ++i) s += a[i];
    return s;
  }
  int64_t n2 = n / 2;
  n2 -= n2 % 8;
  return pw_sum(a, n2) + pw_sum(a + n2, n - n2);
}

}  // namespace

// h-search (statistics/mod.rs:191-238; Python oracle
// statistics._estimate_h).  log_kqt = np.log(k*qlen*tl), kexp =
// k*np.exp(-lam*scores), both precomputed by NumPy.  scratch holds
// 2*n doubles.  Expression structure mirrors the NumPy source line for
// line (same association, same parenthesization — see the oracle).
double an_estimate_h(const double* log_kqt, const double* kexp,
                     const double* tl, int64_t n, double qlen, double old_h,
                     int64_t maxiter, double threshold, double* scratch) {
  double h = old_h;
  double* s_g = scratch;
  double* s_gd = scratch + n;
  for (int64_t it = 0; it < maxiter + 1; ++it) {
    for (int64_t i = 0; i < n; ++i) {
      const double l = log_kqt[i] / h;
      const double nn = (qlen - l) * (tl[i] - l);
      const double a = (2.0 * l - qlen) - tl[i];
      const double b = 1.0 / nn - kexp[i];
      const double c = (-l) / h;
      s_g[i] = (a * b) * c;
      const double u = (a * c) / nn;
      s_gd[i] = ((2.0 * b) * (c * c) - u * u) - ((((2.0 * a) * b) * c) / h);
    }
    const double h_g = pw_sum(s_g, n);
    const double h_gd = pw_sum(s_gd, n);
    if (std::fabs(h_g) < threshold) return h;
    if (h_gd > 0.0) {
      h = (h_g > 0.0) ? h * 2.0 : h / 2.0;
    } else if (h_g <= 0.0) {
      h = h / 2.0;
    } else {
      h = h - h_g / h_gd;
    }
  }
  return h;
}

int an_abi_version() { return 3; }

}  // extern "C"
