"""Core DTW kernels: cost matrices, trackback, O(r)-memory banded cost.

Semantics pinned to the reference (baggepinnen/DynamicAxisWarping.jl):

- Cost matrix ``D`` is (m, n): rows index ``seq2``, cols index ``seq1``
  (reference src/dtw.jl:40-49).
- DP recurrence ``D[r,c] += min(tc*D[r-1,c], D[r-1,c-1], tc*D[r,c-1])``
  (src/dtw.jl:61); default inner distance squared Euclidean (src/dtw.jl:40).
- Trackback ties prefer the diagonal: compare ``D[r-1,c-1] <= D[r-1,c]``
  then ``<= D[r,c-1]`` (src/dtw.jl:137 via src/utils.jl:1-15).
- Warp paths are 1-based inclusive index vectors (src/dtw.jl:123-152).
- Band limits ``i2min/i2max`` are 1-based, must satisfy ``i2min[0]==1`` and
  ``i2max[-1]==m`` (src/dtw.jl:84-89).

The DP sweeps are vectorized along anti-diagonals (every cell on diagonal k
depends only on diagonals k-1 and k-2), so the Python-level loop is O(n+m)
with NumPy vector ops — no per-cell Python. ``dtw_cost`` uses a min-plus
prefix-scan to vectorize each band row.

Known deviation, documented: reference ``dtw_cost`` (src/dtw.jl:213-215)
multiplies ``transportcost`` onto the *diagonal* and the advance-``a`` move,
leaving advance-``b`` free — inconsistent with ``dtw_cost_matrix``
(src/dtw.jl:61, both non-diagonal moves penalized, diagonal free). No
reference golden value pins that placement (runtests.jl:100-102 is
insensitive: the optimal path there is zero-cost except the final cell), so
this implementation uses the ``dtw_cost_matrix`` placement consistently;
``dtw_cost(a,b,r=len) == dtw(a,b).cost`` then holds for every
``transportcost``, matching the reference's own equality tests at tc=1.
"""

from __future__ import annotations

import numpy as np

from .distances import BUILTIN_NAMES, get_dist

__all__ = [
    "dtw",
    "dtw_cost_matrix",
    "banded_dtw_cost_matrix",
    "trackback",
    "dtw_cost",
    "radiuslimits",
]

_INF = np.inf


def _lastlen(x: np.ndarray) -> int:
    return np.asarray(x).shape[-1]


def dtw_cost_matrix(seq1, seq2, dist=None, transportcost: float = 1.0,
                    postprocess=None) -> np.ndarray:
    """Full O(nm) cumulative DTW cost matrix (reference src/dtw.jl:40-71).

    Returns the (m, n) matrix with m = len(seq2), n = len(seq1).
    """
    d = get_dist(dist)
    seq1 = np.asarray(seq1, dtype=np.float64)
    seq2 = np.asarray(seq2, dtype=np.float64)
    m, n = _lastlen(seq2), _lastlen(seq1)
    # native gate requires BOTH operands 1-D: a mixed 1-D/2-D call must
    # keep the NumPy path's broadcasting semantics, not read raw memory
    if (seq1.ndim == 1 and seq2.ndim == 1 and m > 0 and n > 0
            and d.name == "sqeuclidean"):
        from . import native
        if native.available():
            D = native.full_matrix(seq1, seq2, float(transportcost))
            return D if postprocess is None else postprocess(D)
    D = d.pairwise(seq2, seq1)  # (m, n): rows=seq2, cols=seq1
    D[1:, 0] = np.cumsum(D[:, 0])[1:]
    D[0, 1:] = np.cumsum(D[0, :])[1:]
    tc = float(transportcost)
    # Anti-diagonal sweep over zero-copy strided views (an anti-diagonal of
    # a C-contiguous matrix is a constant-stride walk). Bit-exactness
    # contract: each cell is exactly `local + min(tc*up, diag, tc*left)` —
    # one fp add after exact mins (and tc*x is exact for tc == 1) — so this
    # fallback is bit-identical to the scalar oracle (scripts/naive_dtw.py)
    # and to the C kernel, including trackback tie plateaus. A row-major
    # cumsum/running-min scan is ~2x faster but reassociates the sums,
    # which flips tie-sensitive integer outputs (align delays, NN loc) on
    # the zero plateaus gap-filled series are full of. Do not "optimize"
    # this back into a prefix scan.
    sr, sc = D.strides
    step = sr - sc
    base = np.lib.stride_tricks.as_strided
    for k in range(2, m + n - 1):
        r0 = max(1, k - n + 1)
        r1 = min(m - 1, k - 1)
        if r0 > r1:
            continue
        ln = r1 - r0 + 1
        c0 = k - r0
        cur = base(D[r0:, c0:], shape=(ln,), strides=(step,))
        up = base(D[r0 - 1:, c0:], shape=(ln,), strides=(step,))
        left = base(D[r0:, c0 - 1:], shape=(ln,), strides=(step,))
        dg = base(D[r0 - 1:, c0 - 1:], shape=(ln,), strides=(step,))
        cur += np.minimum(np.minimum(tc * up, dg), tc * left)
    if postprocess is not None:
        D = postprocess(D)
    return D


def _validate_band(i2min, i2max, n: int, m: int):
    """Shared window validation (reference src/dtw.jl:84-89 endpoints plus
    full-range checks): the C band kernels write D cells for every lo..hi
    unchecked, and the NumPy paths would silently wrap negative indices —
    reject out-of-range windows for every execution path."""
    i2min = np.asarray(i2min, dtype=np.int64)
    i2max = np.asarray(i2max, dtype=np.int64)
    if len(i2min) != n or len(i2max) != n:
        raise ValueError("i2min/i2max must match length of seq1")
    if i2min[0] != 1:
        raise ValueError("i2min must start at 1")
    if i2max[-1] != m:
        raise ValueError(
            f"i2max must end at length(seq2), was {i2max[-1]} != {m}")
    if (i2min < 1).any() or (i2max > m).any() or (i2min > i2max).any():
        raise ValueError(
            "i2min/i2max must satisfy 1 <= i2min[c] <= i2max[c] <= len(seq2)")
    return i2min, i2max


def banded_dtw_cost_matrix(seq1, seq2, dist=None, i2min=None, i2max=None,
                           transportcost: float = 1.0) -> np.ndarray:
    """Windowed DTW cost matrix (reference src/dtw.jl:74-111).

    ``i2min``/``i2max`` are 1-based inclusive per-column row windows of
    length n (reference convention, preserved so golden fixtures apply
    verbatim). Cells outside the window are +inf, mirroring WindowedMatrix
    reads (src/windowed_matrix.jl:59-66). Returns a dense (m, n) matrix.
    """
    d = get_dist(dist)
    seq1 = np.asarray(seq1, dtype=np.float64)
    seq2 = np.asarray(seq2, dtype=np.float64)
    m, n = _lastlen(seq2), _lastlen(seq1)
    i2min, i2max = _validate_band(i2min, i2max, n, m)
    tc = float(transportcost)
    lo0 = i2min - 1  # 0-based inclusive lower rows per column
    hi0 = i2max - 1
    if (seq1.ndim == 1 and seq2.ndim == 1 and m > 0 and n > 0
            and d.name == "sqeuclidean"):
        from . import native
        if native.available():
            return native.banded_matrix(seq1, seq2, lo0, hi0, tc)
    D = np.full((m, n), _INF)
    top = int(i2max[0])
    widths = i2max - i2min + 1
    # the scalar path's dv computation assumes the built-in family ((x-y)^2
    # or |x-y| on scalars); custom metrics take the generic pairwise sweep
    if (seq1.ndim == 1 and widths.max() <= 64
            and d.name in BUILTIN_NAMES):
        # Narrow band: scalar DP over per-column band segments only — a
        # 1000-col band of width 21 is ~21k python float ops, far cheaper
        # than thousands of numpy dispatches. One numpy write per column
        # scatters the segment into the dense output.
        sq = d.name == "sqeuclidean"
        al = seq1.tolist()
        bl = seq2.tolist()
        inf = _INF
        lo_l = lo0.tolist()
        hi_l = hi0.tolist()
        # first column: cumulative within [1, i2max[0]] (src/dtw.jl:96-100)
        a0 = al[0]
        acc = 0.0
        prev_seg = []
        for rr in range(top):
            dv = a0 - bl[rr]
            acc += dv * dv if sq else abs(dv)
            prev_seg.append(acc)
        D[:top, 0] = prev_seg
        plo = 0
        phi = top - 1
        for c in range(1, n):
            lo = lo_l[c]
            hi = hi_l[c]
            ac = al[c]
            cur = []
            up = inf
            for rr in range(lo, hi + 1):
                dv = ac - bl[rr]
                dv = dv * dv if sq else abs(dv)
                j = rr - 1 - plo
                dg = prev_seg[j] if 0 <= j <= phi - plo else inf
                lf = prev_seg[j + 1] if 0 <= j + 1 <= phi - plo else inf
                best = dg
                if tc == 1.0:
                    if lf < best:
                        best = lf
                    if up < best:
                        best = up
                else:
                    if tc * lf < best:
                        best = tc * lf
                    if tc * up < best:
                        best = tc * up
                up = best + dv
                cur.append(up)
            D[lo:hi + 1, c] = cur
            prev_seg, plo, phi = cur, lo, hi
        return D
    # wide/irregular windows: anti-diagonal fancy-index sweep
    L = d.pairwise(seq2, seq1)  # local costs (m, n)
    D[:top, 0] = np.cumsum(L[:top, 0])
    # row 0 for columns >= 1: only the left move exists (reference handles
    # these inside its c-loop via the Inf out-of-window reads, src/dtw.jl:103-107)
    for c in range(1, n):
        if lo0[c] == 0:
            D[0, c] = tc * D[0, c - 1] + L[0, c]
    for k in range(2, m + n - 1):
        r0 = max(1, k - n + 1)
        r1 = min(m - 1, k - 1)
        if r0 > r1:
            continue
        r = np.arange(r0, r1 + 1)
        c = k - r
        in_band = (r >= lo0[c]) & (r <= hi0[c])
        if not in_band.any():
            continue
        r, c = r[in_band], c[in_band]
        up = D[r - 1, c]
        diag = D[r - 1, c - 1]
        left = D[r, c - 1]
        D[r, c] = np.minimum(np.minimum(tc * up, diag), tc * left) + L[r, c]
    return D


def trackback(D: np.ndarray):
    """Optimal path by backtracking from D[-1,-1] (reference src/dtw.jl:123-152).

    Returns ``(cost, cols, rows)`` — 1-based index arrays; ``cols`` walks
    seq1, ``rows`` walks seq2. Tie-break order: diagonal, up, left
    (src/utils.jl:1-15).
    """
    m, n = D.shape
    if (m > 0 and n > 0 and D.dtype == np.float64
            and D.flags["C_CONTIGUOUS"]):
        from . import native
        if native.available():
            cost, cols, rows = native.trackback(D)
            return cost, cols, rows
    r, c = m - 1, n - 1  # 0-based
    rows = [r + 1]
    cols = [c + 1]
    while r > 0 and c > 0:
        a = D[r - 1, c - 1]
        b = D[r - 1, c]
        cc = D[r, c - 1]
        if a <= b:
            if a <= cc:
                r -= 1
                c -= 1
            else:
                c -= 1
        else:
            if b <= cc:
                r -= 1
            else:
                c -= 1
        rows.append(r + 1)
        cols.append(c + 1)
    while r > 0:
        r -= 1
        rows.append(r + 1)
        cols.append(1)
    while c > 0:
        c -= 1
        cols.append(c + 1)
        rows.append(1)
    return float(D[-1, -1]), np.array(cols[::-1], dtype=np.int64), np.array(rows[::-1], dtype=np.int64)


def dtw(seq1, seq2, dist=None, i2min=None, i2max=None,
        transportcost: float = 1.0, postprocess=None):
    """Full DTW: ``(cost, i1, i2)`` with 1-based warp paths
    (reference src/dtw.jl:25-28). Banded when ``i2min/i2max`` given."""
    if i2min is not None or i2max is not None:
        d = get_dist(dist)
        s1 = np.asarray(seq1, dtype=np.float64)
        s2 = np.asarray(seq2, dtype=np.float64)
        if (s1.ndim == 1 and s2.ndim == 1 and len(s1) and len(s2)
                and d.name == "sqeuclidean"):
            from . import native
            if native.available():
                # compact-band DP + in-band trackback: O(band) memory,
                # no dense (m, n) inf-fill; bit-identical costs/paths
                imin, imax = _validate_band(i2min, i2max, len(s1), len(s2))
                return native.banded_path(s1, s2, imin - 1, imax - 1,
                                          float(transportcost))
        D = banded_dtw_cost_matrix(seq1, seq2, dist, i2min, i2max,
                                   transportcost=transportcost)
    else:
        D = dtw_cost_matrix(seq1, seq2, dist, transportcost=transportcost,
                            postprocess=postprocess)
    return trackback(D)


def radiuslimits(r: int, n, m=None):
    """Sakoe-Chiba band for possibly unequal lengths
    (reference src/utils.jl:22-33). Accepts ``(r, n, m)`` ints or
    ``(r, seq1, seq2)``. Returns 1-based ``(imin, imax)`` of length n."""
    if m is None or not np.isscalar(n):
        n, m = _lastlen(n), _lastlen(m)
    n, m = int(n), int(m)
    d = abs(m - n)
    idx = np.arange(1, n + 1, dtype=np.int64)
    if m >= n:
        imin = np.maximum(idx - r, 1)
        imax = np.minimum(idx + (r + d), m)
    else:
        imin = np.maximum(idx - (r + d), 1)
        imax = np.minimum(idx + r, m)
    return imin, imax


def _slice_profile(d, a, i: int, b, lo: int, hi: int) -> np.ndarray:
    """Vectorized local costs d(a[..,i], b[..,j]) for j in [lo, hi]."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.ndim == 1:
        nm = d.name
        if nm == "sqeuclidean":
            seg = b[lo:hi + 1] - a[i]
            return seg * seg
        if nm in ("euclidean", "cityblock", "chebyshev"):
            return np.abs(b[lo:hi + 1] - a[i])
        # custom metric: one pairwise call on (length-1 slice, segment)
        return d.pairwise(a[i:i + 1], b[lo:hi + 1])[0]
    # multichannel: time last axis
    nm = d.name
    if nm not in BUILTIN_NAMES:
        return d.pairwise(a[:, i:i + 1], b[:, lo:hi + 1])[0]
    diff = b[:, lo:hi + 1] - a[:, i][:, None]
    if nm == "sqeuclidean":
        return np.einsum("cj,cj->j", diff, diff)
    if nm == "euclidean":
        return np.sqrt(np.einsum("cj,cj->j", diff, diff))
    if nm == "cityblock":
        return np.abs(diff).sum(axis=0)
    return np.abs(diff).max(axis=0)  # chebyshev


def _dtw_cost_scalar(a: np.ndarray, b: np.ndarray, r: int,
                     cb: np.ndarray, best_so_far: float) -> float:
    """Scalar-python banded DP (SqEuclidean, tc=1) — the dtw_cost fast path.

    Identical recurrence and early-abandon behavior to the vectorized
    branch; exists because numpy per-row dispatch costs more than the whole
    band when 2r+1 is small.
    """
    m = len(a)
    al = a.tolist()
    bl = b.tolist()
    cbl = cb.tolist()
    inf = float("inf")
    prev = None
    plo = 0
    cur = None
    for i in range(m):
        lo = 0 if i < r else i - r
        hi = m - 1 if i + r >= m else i + r
        ai = al[i]
        cur = []
        if i == 0:
            s = 0.0
            for j in range(lo, hi + 1):
                dv = ai - bl[j]
                s += dv * dv
                cur.append(s)
            min_cost = cur[0]
        else:
            phi = plo + len(prev) - 1
            acc = inf
            min_cost = inf
            for j in range(lo, hi + 1):
                dv = ai - bl[j]
                dv *= dv
                up = prev[j - plo] if plo <= j <= phi else inf
                dg = prev[j - 1 - plo] if plo <= j - 1 <= phi else inf
                best = up if up < dg else dg
                if acc < best:
                    best = acc
                acc = best + dv
                if acc < min_cost:
                    min_cost = acc
                cur.append(acc)
        if (i + r) < (m - 1) and min_cost + cbl[i + r] >= best_so_far:
            return float(min_cost + cbl[i + r])
        prev, plo = cur, lo
    return float(cur[-1])


def dtw_cost_batch(q: np.ndarray, W: np.ndarray, r: int,
                   transportcost: float = 1.0) -> np.ndarray:
    """Banded DTW costs of a query against MANY equal-length windows.

    ``W`` is (k, m); ``q`` is (m,) — one query vs k windows — or (k, m) —
    k independent pairs. Returns (k,) exact banded costs (no early abandon;
    the batch amortizes the DP across rows instead — callers prune with
    lower bounds first). Same recurrence/boundary semantics as dtw_cost.
    SqEuclidean only (the NN-search hot path).
    """
    # dtype-preserving: float32 inputs compute in float32 (reference
    # documents Float32 as ~2x faster, README.md:148); anything else
    # promotes to float64
    _q, _W = np.asarray(q), np.asarray(W)
    if int(r) < 0:
        raise ValueError(f"radius must be >= 0, got {r}")
    # native gate: shapes must be exactly valid (1-D q of length m, or
    # (k, m) pairwise q) — anything else keeps the NumPy path's error
    # behavior instead of reading out of bounds in C
    if (_W.ndim == 2 and _W.shape[1] > 0
            and ((_q.ndim == 1 and _q.shape[0] == _W.shape[1])
                 or (_q.ndim == 2 and _q.shape == _W.shape))):
        from . import native
        if native.available():
            return native.cost_batch(q, W, r, float(transportcost))
    if np.asarray(q).dtype == np.float32 and np.asarray(W).dtype == np.float32:
        dt = np.float32
    else:
        dt = np.float64
    q = np.asarray(q, dtype=dt)
    W = np.asarray(W, dtype=dt)
    k, m = W.shape
    pairwise_q = q.ndim == 2
    tc = float(transportcost)
    r = int(r)
    prev = None
    plo = phi = 0
    cur = None
    lo = hi = 0
    for i in range(m):
        lo = max(0, i - r)
        hi = min(m - 1, i + r)
        w = hi - lo + 1
        qi = q[:, i][:, None] if pairwise_q else q[i]
        dloc = W[:, lo:hi + 1] - qi
        dloc *= dloc  # (k, w)
        if i == 0:
            cur = np.cumsum(dloc, axis=1)
        else:
            pw = phi - plo + 1
            up = np.full((k, w), _INF, dtype=dt)
            diag = np.full((k, w), _INF, dtype=dt)
            # prev covers columns [plo, phi]; current row wants j in [lo, hi]
            s = max(lo, plo)
            e = min(hi, phi)
            if s <= e:
                up[:, s - lo:e - lo + 1] = prev[:, s - plo:e - plo + 1]
            s2 = max(lo, plo + 1)
            e2 = min(hi, phi + 1)
            if s2 <= e2:
                diag[:, s2 - lo:e2 - lo + 1] = prev[:, s2 - 1 - plo:e2 - plo]
            if tc == 1.0:
                if lo == 0:
                    bvec = np.minimum(up, diag)
                else:
                    bvec = np.minimum(tc * up, diag)
            else:
                up_s = tc * up
                if lo == 0:
                    up_s[:, 0] = up[:, 0]
                bvec = np.minimum(up_s, diag)
            # Per-column running-min loop, NOT a cumsum prefix scan: each
            # cell is exactly `min(tc*left, bvec) + local` (tc*x is exact
            # for tc == 1), keeping this fallback bit-identical to the
            # scalar oracle and the C kernel — a scan reassociates the
            # sums and flips tie-sensitive NN locs on zero plateaus.
            cur = np.empty((k, w), dtype=dt)
            acc = np.full(k, _INF, dtype=dt)
            for j in range(w):
                y = tc * acc if j > 0 else np.full(k, _INF, dtype=dt)
                acc = np.minimum(y, bvec[:, j]) + dloc[:, j]
                cur[:, j] = acc
        prev, plo, phi = cur, lo, hi
    return cur[:, -1]


def dtw_cost_batch_indexed(A: np.ndarray, B: np.ndarray, ia: np.ndarray,
                           ib: np.ndarray, r: int,
                           transportcost: float = 1.0) -> np.ndarray:
    """Banded DTW costs of row pairs ``(A[ia[p]], B[ib[p]])`` taken
    straight from two stacked equal-width blocks.

    Semantically identical to ``dtw_cost_batch(A[ia], B[ib], r, tc)``
    (same DP body in C, same NumPy fallback expression) but skips the
    2×m×8-byte per-pair gather copy — the tiled k-NN pair evaluation is
    memory-bandwidth bound at full parallelism, where that copy costs as
    much as the DP itself.
    """
    A = np.ascontiguousarray(A, dtype=np.float64) \
        if np.asarray(A).dtype != np.float32 else np.ascontiguousarray(A)
    B = np.ascontiguousarray(B, dtype=np.float64) \
        if np.asarray(B).dtype != np.float32 else np.ascontiguousarray(B)
    ia = np.asarray(ia, dtype=np.int64)
    ib = np.asarray(ib, dtype=np.int64)
    if int(r) < 0:
        raise ValueError(f"radius must be >= 0, got {r}")
    if A.ndim != 2 or B.ndim != 2 or A.shape[1] != B.shape[1] \
            or A.shape[1] == 0:
        raise ValueError("A and B must be (·, m) blocks of equal width")
    if ia.shape != ib.shape or ia.ndim != 1:
        raise ValueError("ia/ib must be equal-length 1-D index arrays")
    if len(ia) == 0:
        return np.empty(0, dtype=A.dtype if A.dtype == B.dtype
                        else np.float64)
    # non-negative in-range indices only, checked up front: NumPy fancy
    # indexing would silently WRAP negatives where the C path cannot, and
    # results must never depend on which path ran
    if (ia.min() < 0 or ia.max() >= A.shape[0]
            or ib.min() < 0 or ib.max() >= B.shape[0]):
        raise IndexError("ia/ib must be in [0, len(block)) — negative "
                         "(wrapping) indices are not accepted")
    from . import native
    if native.available():
        return native.cost_batch_indexed(A, B, ia, ib, int(r),
                                         float(transportcost))
    return dtw_cost_batch(A[ia], B[ib], int(r), transportcost)


def _dtw_cost_ref_placement(d, a, b, r: int, tc: float, cb,
                            best_so_far: float) -> float:
    """O(r)-memory banded DTW cost with the REFERENCE's ``dtw_cost``
    transportcost placement (src/dtw.jl:213-215): ``tc`` multiplies the
    advance-``a`` (up) and diagonal moves, leaving advance-``b`` (left)
    free — i.e. ``D[i,j] = min(tc*D[i-1,j], D[i,j-1], tc*D[i-1,j-1]) +
    d(a_i, b_j)``. Boundary and early-abandon semantics mirror the
    reference loop exactly: cell (0,0) is the bare local cost, row 0 is a
    plain left-move cumsum (the reference's typemax guards), and column 0
    takes only the tc-scaled up move. Compat path — scalar DP, no native
    kernel (``transportcost_placement='reference'`` exists for numerical
    parity with Julia, not for throughput; at tc == 1 the placements
    coincide and callers never reach this function)."""
    m = _lastlen(a)
    cbl = np.asarray(cb, dtype=np.float64).tolist()
    inf = _INF
    prev = None
    plo = phi = 0
    cur = None
    for i in range(m):
        lo = max(0, i - r)
        hi = min(m - 1, i + r)
        dloc = _slice_profile(d, a, i, b, lo, hi).tolist()
        cur = []
        min_cost = inf
        if i == 0:
            s = 0.0
            for w, dv in enumerate(dloc):
                s = dv if w == 0 else s + dv  # left-only cumsum, no tc
                cur.append(s)
                if s < min_cost:
                    min_cost = s
        else:
            left = inf
            for w, dv in enumerate(dloc):
                j = lo + w
                up = prev[j - plo] if plo <= j <= phi else inf
                dg = prev[j - 1 - plo] if plo <= j - 1 <= phi else inf
                best = tc * up
                if left < best:
                    best = left
                if tc * dg < best:
                    best = tc * dg
                left = best + dv
                cur.append(left)
                if left < min_cost:
                    min_cost = left
        if (i + r) < (m - 1) and min_cost + cbl[i + r] >= best_so_far:
            return float(min_cost + cbl[i + r])
        prev, plo, phi = cur, lo, hi
    return float(cur[-1])


def dtw_cost(a, b, dist=None, r: int = 0, transportcost: float = 1.0,
             best_so_far: float = _INF, cumulative_bound=None,
             transportcost_placement: str = "matrix") -> float:
    """O(r)-memory banded DTW cost with early abandon
    (reference src/dtw.jl:176-237, UCR-suite style).

    KNOWN DEVIATION (user-facing, see README "Known deviations"): with
    ``transportcost != 1`` this function by default penalizes the two
    NON-diagonal moves (the reference's own ``dtw_cost_matrix`` placement,
    src/dtw.jl:61), whereas the reference's ``dtw_cost`` penalizes the
    diagonal + advance-``a`` moves (src/dtw.jl:213-215) — the reference is
    internally inconsistent and no golden pins its placement. Here
    ``dtw_cost(a, b, r=len(a), transportcost=tc) == dtw(a, b,
    transportcost=tc).cost`` holds for every tc (pinned by
    tests/test_kernels_dtw.py::TestTransportcostPlacement).
    ``transportcost_placement='reference'`` opts into the Julia
    ``dtw_cost`` cost model instead (tc on the up + diagonal moves, left
    free) for users who need bit-compatible numbers with reference
    ``dtw_cost(a, b, dist, r; transportcost=tc)`` calls; the two
    placements coincide at tc == 1.

    Requires equal lengths (src/dtw.jl:195). ``cumulative_bound`` is the
    reverse-cumulative LB_Keogh bound consumed by the abandon test
    (src/dtw.jl:227-229): when the running row minimum plus the remaining
    bound already exceeds ``best_so_far``, that partial sum is returned (a
    lower bound on the true cost, matching reference behavior exactly).
    Caveat, shared with the reference: with ``transportcost < 1``
    (permitted — README.md:224) a later cell can undercut the current
    row minimum (``tc*x < x``), so the abandoned partial sum is NOT a
    lower bound there. For exact tc<1 costs call ``dtw_cost`` directly
    with the default ``best_so_far=inf`` (or use ``dtw()``); pruned
    searches (``dtwnn``, ``dtw_dist``'s unequal-length path) keep the
    reference's semantics, whose LB gates and abandon assume tc >= 1 —
    tc < 1 there can over-prune exactly as in Julia. The engine's own
    operators only ever abandon at tc == 1.

    All fallback paths (scalar small-band, vectorized wide-band) compute
    each cell as exactly ``min(...) + local`` so they are bit-identical to
    the C kernel and the scalar second-source oracle (scripts/naive_dtw.py)
    — including trackback-tie and NN-loc outcomes on tied plateaus.
    """
    d = get_dist(dist)
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    m = _lastlen(a)
    if _lastlen(b) != m:
        raise ValueError(
            f"a and b must have the same length, got {m} and {_lastlen(b)}; "
            "use dtw() for different lengths")
    r = int(r)
    if r < 0:
        raise ValueError(f"radius must be >= 0, got {r}")
    cb = np.zeros(m) if cumulative_bound is None else np.asarray(cumulative_bound, dtype=np.float64)
    if len(cb) != m:
        raise ValueError("cumulative_bound and a must have the same length")
    tc = float(transportcost)
    if transportcost_placement not in ("matrix", "reference"):
        raise ValueError(
            "transportcost_placement must be 'matrix' or 'reference', got "
            f"{transportcost_placement!r}")
    if transportcost_placement == "reference" and tc != 1.0 and m > 0:
        return _dtw_cost_ref_placement(d, a, b, r, tc, cb,
                                       float(best_so_far))

    if (a.ndim == 1 and b.ndim == 1 and m > 0
            and d.name == "sqeuclidean"):
        from . import native
        if native.available():
            return float(native.cost_band(a, b, r, tc,
                                          float(best_so_far), cb))
    # Small-band fast path: for narrow bands the per-row NumPy dispatch
    # overhead dominates; a scalar DP over python floats is ~20x faster
    # (same recurrence, same abandon semantics).
    if (a.ndim == 1 and tc == 1.0 and 2 * r + 1 <= 32
            and d.name == "sqeuclidean"):
        return _dtw_cost_scalar(a, b, r, cb, float(best_so_far))

    prev = None          # cost array of previous row
    plo = phi = -1       # its 0-based band bounds
    cost = None
    lo = hi = 0
    for i in range(m):
        lo = max(0, i - r)
        hi = min(m - 1, i + r)
        w = hi - lo + 1
        dloc = _slice_profile(d, a, i, b, lo, hi)
        if i == 0:
            # boundary row: plain cumsum, no tc (matches the full matrix's
            # first-row initialization, src/dtw.jl:54-56)
            cost = np.cumsum(dloc)
        else:
            # bvec[j] = min(tc*up, diag):  up = (i-1, j) tc'd, diag free.
            # Boundary column j==0 mirrors the full matrix's first-column
            # cumsum: up without tc (src/dtw.jl:51-53).
            j_idx = np.arange(lo, hi + 1)
            up = np.full(w, _INF)
            diag = np.full(w, _INF)
            sel = (j_idx >= plo) & (j_idx <= phi)
            up[sel] = prev[j_idx[sel] - plo]
            sel = (j_idx - 1 >= plo) & (j_idx - 1 <= phi)
            diag[sel] = prev[j_idx[sel] - 1 - plo]
            up_scaled = tc * up
            if lo == 0:
                up_scaled[0] = up[0]
            bvec = np.minimum(up_scaled, diag)
            # per-cell running min, not a prefix scan — bit-identical to
            # the scalar oracle / C kernel (see dtw_cost_batch note)
            cost = np.empty(w)
            acc = _INF
            for j in range(w):
                y = tc * acc if j > 0 else _INF  # left move (i, j-1)
                acc = min(y, bvec[j]) + dloc[j]
                cost[j] = acc
        min_cost = cost.min()
        # early abandon (src/dtw.jl:227-229)
        if (i + r) < (m - 1) and min_cost + cb[i + r] >= best_so_far:
            return float(min_cost + cb[i + r])
        prev, plo, phi = cost, lo, hi
    return float(cost[-1])
