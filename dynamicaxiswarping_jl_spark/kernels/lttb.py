"""Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013).

Engine-added downsample primitive for the tier cascade's visual /
representative path: pick ``m`` of ``n`` points so the drawn line keeps
the series' shape. Complements the two existing downsample notions —
time-bucket averaging (``operators/rollup.cascade``) and the
reference's resolution-halving ``compress2`` (`src/fastdtw.jl:97-105`,
``kernels/fastdtw.py``) — LTTB preserves extremes those two smooth
away.

Algorithm (pinned semantics, mirrored bitwise by the golden oracle in
``scripts/make_goldens.py``):

- point 0 and point n-1 are always kept;
- the interior ``n - 2`` points split into ``m - 2`` equal-width float
  buckets: bucket k covers indices ``1 + floor(k*(n-2)/(m-2)) ..
  1 + floor((k+1)*(n-2)/(m-2)) - 1``;
- scanning left to right, from each bucket keep the point with the
  LARGEST triangle area formed with the previously kept point ``a``
  and the centroid ``c`` of the NEXT bucket (the last bucket pairs
  with the final point);
- area ties keep the EARLIEST index (NumPy argmax first-max rule);
- x-coordinates are the integer sample indices (uniform tier grid), so
  the cross product is evaluated as
  ``(xa - cx)*(y - ya) - (xa - x)*(cy - ya)`` per candidate — this
  exact operand order is part of the contract;
- the next-bucket centroid uses ``float(np.mean(...))`` over the
  C-contiguous float64 slice (NumPy pairwise summation — association
  order is part of the contract).
"""

from __future__ import annotations

import numpy as np

__all__ = ["lttb_indices", "lttb"]


def _bucket_bounds(n: int, m: int) -> np.ndarray:
    """m-1 boundaries: interior points 1..n-2 into m-2 equal float spans."""
    # floor(k * (n-2) / (m-2)) computed in float64 like the published
    # algorithm; exact for every n, m that fits an int (n-2 < 2^52)
    k = np.arange(m - 1, dtype=np.float64)
    return 1 + np.floor(k * ((n - 2) / (m - 2))).astype(np.int64)


def lttb_indices(y: np.ndarray, m: int) -> np.ndarray:
    """Indices (sorted, unique) of the m points LTTB keeps from y."""
    y = np.ascontiguousarray(y, dtype=np.float64)
    n = y.shape[0]
    if m < 3:
        raise ValueError(f"m must be >= 3, got {m}")
    if n <= m:
        return np.arange(n, dtype=np.int64)
    bounds = _bucket_bounds(n, m)
    out = np.empty(m, dtype=np.int64)
    out[0] = 0
    out[-1] = n - 1
    a = 0  # previously selected index
    for k in range(m - 2):
        lo = int(bounds[k])
        hi = int(bounds[k + 1]) if k + 1 < m - 2 else n - 1
        # centroid of the NEXT bucket (or the final point)
        if k + 1 < m - 2:
            nlo = int(bounds[k + 1])
            nhi = int(bounds[k + 2]) if k + 2 < m - 2 else n - 1
        else:
            nlo, nhi = n - 1, n
        cx = float(np.mean(np.arange(nlo, nhi, dtype=np.float64)))
        cy = float(np.mean(y[nlo:nhi]))
        xs = np.arange(lo, hi, dtype=np.float64)
        ys = y[lo:hi]
        xa, ya = float(a), float(y[a])
        area = np.abs((xa - cx) * (ys - ya) - (xa - xs) * (cy - ya))
        a = lo + int(np.argmax(area))
        out[k + 1] = a
    return out


def lttb(y: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray]:
    """(indices, values) of the LTTB-downsampled series."""
    idx = lttb_indices(y, m)
    y = np.ascontiguousarray(y, dtype=np.float64)
    return idx, y[idx]
