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

int an_abi_version() { return 1; }

}  // extern "C"
