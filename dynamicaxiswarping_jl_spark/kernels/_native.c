/* Native DTW dynamic-programming kernels (SqEuclidean, 1-D series).
 *
 * Plain-C restatements of the NumPy DP sweeps in dtw.py — same
 * recurrence, same boundary rules, same early-abandon semantics
 * (reference src/dtw.jl:40-111,176-237; the DP itself is the public
 * textbook/UCR-suite algorithm). Compiled at first use with the system
 * gcc by native.py and loaded via ctypes; every entry point has a NumPy
 * fallback, so this file is an accelerator, not a dependency.
 *
 * Orientation notes (match dtw.py exactly):
 *  - full matrix D is (m, n) with rows indexing seq2, cols indexing seq1;
 *  - banded matrix uses 0-based per-column row windows lo[c]..hi[c];
 *  - dtw_cost rows index `a`, band columns index `b` (equal lengths);
 *  - transportcost tc multiplies the non-diagonal moves; first row/column
 *    boundary cells follow each function's documented exception.
 */

#include <math.h>
#include <stdlib.h>

#define INF INFINITY

static inline double dmin(double x, double y) { return x < y ? x : y; }

/* Full (m, n) cumulative cost matrix, rows = seq2, cols = seq1.
 * First row and first column are plain cumulative sums (no tc) —
 * src/dtw.jl:51-56. */
void dtw_full_sq(const double *s1, long n, const double *s2, long m,
                 double tc, double *D)
{
    double dv = s2[0] - s1[0];
    D[0] = dv * dv;
    for (long c = 1; c < n; c++) {
        dv = s2[0] - s1[c];
        D[c] = D[c - 1] + dv * dv;
    }
    for (long r = 1; r < m; r++) {
        dv = s2[r] - s1[0];
        D[r * n] = D[(r - 1) * n] + dv * dv;
    }
    for (long r = 1; r < m; r++) {
        const double *prev = D + (r - 1) * n;
        double *row = D + r * n;
        const double br = s2[r];
        double left = row[0];
        for (long c = 1; c < n; c++) {
            dv = br - s1[c];
            double best = dmin(dmin(tc * prev[c], prev[c - 1]), tc * left);
            left = best + dv * dv;
            row[c] = left;
        }
    }
}

/* Banded (m, n) matrix with 0-based per-column windows lo[c]..hi[c].
 * Caller pre-fills D with +inf. First column: cumsum over rows
 * 0..hi[0]; row 0 for c>=1 (when lo[c]==0): tc*left + local
 * (src/dtw.jl:96-107 as mirrored by banded_dtw_cost_matrix). */
void dtw_banded_sq(const double *s1, long n, const double *s2, long m,
                   const long *lo, const long *hi, double tc, double *D)
{
    double acc = 0.0;
    for (long r = 0; r <= hi[0]; r++) {
        double dv = s1[0] - s2[r];
        acc += dv * dv;
        D[r * n] = acc;
    }
    for (long c = 1; c < n; c++) {
        const long l = lo[c], h = hi[c];
        const long pl = lo[c - 1], ph = hi[c - 1];
        const double ac = s1[c];
        double up = INF;
        for (long r = l; r <= h; r++) {
            double dv = ac - s2[r];
            dv *= dv;
            double dg = (r - 1 >= pl && r - 1 <= ph)
                        ? D[(r - 1) * n + (c - 1)] : INF;
            double lf = (r >= pl && r <= ph) ? D[r * n + (c - 1)] : INF;
            double best = dmin(dmin(dg, tc * lf), tc * up);
            up = best + dv;
            D[r * n + c] = up;
        }
    }
}

/* O(r)-memory banded cost with early abandon — mirrors dtw_cost():
 * row 0 plain cumsum; column-0 cells take `up` without tc; left move
 * within a row is tc'd; abandon returns the partial lower bound
 * min_cost + cb[i+r] (src/dtw.jl:227-229). `buf` is caller scratch of
 * 2*(2r+1) doubles. */
double dtw_cost_band_sq(const double *a, const double *b, long m, long r,
                        double tc, double bsf, const double *cb,
                        double *buf)
{
    long w = 2 * r + 1;
    if (w > m) w = m;
    double *prev = buf, *cur = buf + w;
    long plo = 0, phi = -1;
    long lo = 0, hi = 0;
    for (long i = 0; i < m; i++) {
        lo = i - r > 0 ? i - r : 0;
        hi = i + r < m - 1 ? i + r : m - 1;
        const double ai = a[i];
        double min_cost;
        if (i == 0) {
            double s = 0.0;
            for (long j = lo; j <= hi; j++) {
                double dv = ai - b[j];
                s += dv * dv;
                cur[j - lo] = s;
            }
            min_cost = cur[0];
        } else {
            double acc = INF;
            min_cost = INF;
            for (long j = lo; j <= hi; j++) {
                double dv = ai - b[j];
                dv *= dv;
                double up = (j >= plo && j <= phi) ? prev[j - plo] : INF;
                double dg = (j - 1 >= plo && j - 1 <= phi)
                            ? prev[j - 1 - plo] : INF;
                double ups = (j == 0) ? up : tc * up;
                double best = dmin(ups, dg);
                double y = (j > lo) ? tc * acc : INF;
                if (y < best) best = y;
                acc = best + dv;
                if (acc < min_cost) min_cost = acc;
                cur[j - lo] = acc;
            }
        }
        if (i + r < m - 1 && min_cost + cb[i + r] >= bsf)
            return min_cost + cb[i + r];
        double *t = prev; prev = cur; cur = t;
        plo = lo; phi = hi;
    }
    return prev[hi - lo];  /* prev holds the last row after the swap */
}

/* Batched banded costs: q is (m,) when pairwise==0 (one query vs k
 * windows) or (k, m) when pairwise==1 (k independent pairs); W is (k, m).
 * No early abandon (batch semantics). */
#define BATCH_IMPL(NAME, T)                                              \
void NAME(const T *q, int pairwise, const T *W, long k, long m, long r,  \
          double tc_, T *out, T *buf)                                    \
{                                                                        \
    const T tc = (T)tc_;                                                 \
    long w0 = 2 * r + 1;                                                 \
    if (w0 > m) w0 = m;                                                  \
    T *prev_b = buf, *cur_b = buf + w0;                                  \
    for (long p = 0; p < k; p++) {                                       \
        const T *a = pairwise ? q + p * m : q;                           \
        const T *b = W + p * m;                                          \
        T *prev = prev_b, *cur = cur_b;                                  \
        long plo = 0, phi = -1, lo = 0, hi = 0;                          \
        for (long i = 0; i < m; i++) {                                   \
            lo = i - r > 0 ? i - r : 0;                                  \
            hi = i + r < m - 1 ? i + r : m - 1;                          \
            const T ai = a[i];                                           \
            if (i == 0) {                                                \
                T s = (T)0;                                              \
                for (long j = lo; j <= hi; j++) {                        \
                    T dv = ai - b[j];                                    \
                    s += dv * dv;                                        \
                    cur[j - lo] = s;                                     \
                }                                                        \
            } else {                                                     \
                T acc = (T)INF;                                          \
                for (long j = lo; j <= hi; j++) {                        \
                    T dv = ai - b[j];                                    \
                    dv *= dv;                                            \
                    T up = (j >= plo && j <= phi) ? prev[j - plo]        \
                                                  : (T)INF;              \
                    T dg = (j - 1 >= plo && j - 1 <= phi)                \
                           ? prev[j - 1 - plo] : (T)INF;                 \
                    T ups = (j == 0) ? up : tc * up;                     \
                    T best = ups < dg ? ups : dg;                        \
                    T y = (j > lo) ? tc * acc : (T)INF;                  \
                    if (y < best) best = y;                              \
                    acc = best + dv;                                     \
                    cur[j - lo] = acc;                                   \
                }                                                        \
            }                                                            \
            T *t = prev; prev = cur; cur = t;                            \
            plo = lo; phi = hi;                                          \
        }                                                                \
        out[p] = prev[hi - lo];                                          \
    }                                                                    \
}

BATCH_IMPL(dtw_cost_batch_sq_f64, double)
BATCH_IMPL(dtw_cost_batch_sq_f32, float)

/* LB_Keogh totals for a subset of window starts (mirrors
 * _lb_env_subset in dtwnn.py): per-step envelope excess
 * e = max(x-u_raw, 0) + max(l_raw - x, 0), rescaled by 1/sd under
 * z-normalization, squared for SqEuclidean. No window gather, no
 * temporaries — one streaming pass per candidate. */
#define LB_ENV_IMPL(NAME, T)                                             \
void NAME(const T *y, long m, const T *l, const T *u,                    \
          const T *mu, const T *sd, int use_norm, int squared,           \
          const long *cand, long k, T *out)                              \
{                                                                        \
    for (long p = 0; p < k; p++) {                                       \
        const long c = cand[p];                                          \
        const T *x = y + c;                                              \
        T acc = (T)0;                                                    \
        if (use_norm) {                                                  \
            const T scale = sd[c], off = mu[c];                          \
            const T inv = (T)1 / scale;                                  \
            for (long j = 0; j < m; j++) {                               \
                T ur = u[j] * scale + off;                               \
                T lr = l[j] * scale + off;                               \
                T e = x[j] > ur ? x[j] - ur                              \
                    : (lr > x[j] ? lr - x[j] : (T)0);                    \
                e *= inv;                                                \
                acc += squared ? e * e : e;                              \
            }                                                            \
        } else {                                                         \
            for (long j = 0; j < m; j++) {                               \
                T e = x[j] > u[j] ? x[j] - u[j]                          \
                    : (l[j] > x[j] ? l[j] - x[j] : (T)0);                \
                acc += squared ? e * e : e;                              \
            }                                                            \
        }                                                                \
        out[p] = acc;                                                    \
    }                                                                    \
}

LB_ENV_IMPL(lb_env_subset_f64, double)
LB_ENV_IMPL(lb_env_subset_f32, float)
