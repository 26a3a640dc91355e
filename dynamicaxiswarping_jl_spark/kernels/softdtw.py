"""Soft-DTW (differentiable DTW) kernels.

Reference: src/dtw.jl:245-328 (soft_dtw_cost_matrix, soft_dtw_cost, softmin);
paper: Cuturi & Blondel, "Soft-DTW: a Differentiable Loss Function for
Time-Series" (arXiv:1703.01541). The γ→0 limit approaches standard DTW
(reference runtests.jl:93,107,118) and values can be negative.
"""

from __future__ import annotations

import numpy as np

from .distances import get_dist

__all__ = ["softmin", "soft_dtw_cost_matrix", "soft_dtw_cost",
           "soft_dtw_cost_exact"]


def softmin(a, b, c, gamma: float):
    """Numerically-stabilized soft minimum of three values
    (reference src/dtw.jl:311-317). Vectorized over array inputs."""
    g = -float(gamma)
    a = np.asarray(a, dtype=np.float64) / g
    b = np.asarray(b, dtype=np.float64) / g
    c = np.asarray(c, dtype=np.float64) / g
    maxv = np.maximum(np.maximum(a, b), c)
    s = np.exp(a - maxv) + np.exp(b - maxv) + np.exp(c - maxv)
    return g * (np.log(s) + maxv)


def soft_dtw_cost_matrix(seq1, seq2, dist=None, gamma: float = 1.0,
                         transportcost: float = 1.0, radius=None) -> np.ndarray:
    """Soft-DTW DP matrix (reference src/dtw.jl:245-282).

    With ``radius`` set, cells with |c-r| > radius get a crude +1/γ penalty
    *before* the softmin update (reference src/dtw.jl:270-278 — note the
    reference adds the penalty and still performs the update; replicated).
    Anti-diagonal vectorized like the hard-DTW sweep.
    """
    d = get_dist(dist)
    seq1 = np.asarray(seq1, dtype=np.float64)
    seq2 = np.asarray(seq2, dtype=np.float64)
    D = d.pairwise(seq2, seq1)
    m, n = D.shape
    D[1:, 0] = np.cumsum(D[:, 0])[1:]
    D[0, 1:] = np.cumsum(D[0, :])[1:]
    tc = float(transportcost)
    inv_g = 1.0 / float(gamma)
    sr, sc = D.strides
    step = sr - sc
    strided = np.lib.stride_tricks.as_strided
    for k in range(2, m + n - 1):
        r0 = max(1, k - n + 1)
        r1 = min(m - 1, k - 1)
        if r0 > r1:
            continue
        ln = r1 - r0 + 1
        c0 = k - r0
        cur = strided(D[r0:, c0:], shape=(ln,), strides=(step,))
        up = strided(D[r0 - 1:, c0:], shape=(ln,), strides=(step,))
        left = strided(D[r0:, c0 - 1:], shape=(ln,), strides=(step,))
        dg = strided(D[r0 - 1:, c0 - 1:], shape=(ln,), strides=(step,))
        if radius is not None:
            r = np.arange(r0, r1 + 1)
            cur += np.where(np.abs((k - r) - r) > radius, inv_g, 0.0)
        cur += softmin(tc * up, dg, tc * left, float(gamma))
    return D


def soft_dtw_cost(seq1, seq2, dist=None, gamma: float = 1.0,
                  transportcost: float = 1.0, radius=None) -> float:
    """Bottom-right soft-DTW value (reference src/dtw.jl:305-308)."""
    D = soft_dtw_cost_matrix(seq1, seq2, dist, gamma=gamma,
                             transportcost=transportcost, radius=radius)
    return float(D[-1, -1])


def soft_dtw_cost_exact(seq1, seq2, dist=None, gamma: float = 1.0,
                        prec: int = 50,
                        transportcost: float = 1.0, radius=None):
    """Arbitrary-precision soft-DTW — the analog of the reference's
    BigFloat path (`SoftDTW(0.01)(big.(a), big.(b))`, test/runtests.jl:119),
    on ``decimal.Decimal`` at ``prec`` significant digits.

    Same recurrence as :func:`soft_dtw_cost_matrix`, evaluated scalar cell
    by cell in Decimal arithmetic: inputs convert EXACTLY from their
    binary-float values (``Decimal(float)`` is lossless), and Decimal's
    unbounded exponent range means ``exp(-x/gamma)`` never under- or
    overflows regardless of how small ``gamma`` is — the regime BigFloat
    exists for. O(n·m) scalar Decimal ops: a parity/verification path
    (oracle for the float64 kernel, tiny-gamma studies), not a throughput
    path. Returns a ``decimal.Decimal``.
    """
    from decimal import Decimal, localcontext

    s1 = np.asarray(seq1, dtype=np.float64)
    s2 = np.asarray(seq2, dtype=np.float64)
    if s1.ndim != 1 or s2.ndim != 1:
        raise ValueError("soft_dtw_cost_exact supports 1-D sequences only "
                         "(the reference's BigFloat test is 1-D; use the "
                         "float64 soft_dtw_cost for multichannel)")
    a = [Decimal(float(v)) for v in s1]
    b = [Decimal(float(v)) for v in s2]
    if not a or not b:
        raise ValueError("sequences must be non-empty")
    name = "sqeuclidean" if dist is None else (
        dist if isinstance(dist, str) else get_dist(dist).name)
    if name == "sqeuclidean":
        def cell(x, y):
            return (x - y) * (x - y)
    elif name in ("euclidean", "cityblock"):  # identical on scalars
        def cell(x, y):
            return abs(x - y)
    else:
        raise ValueError(f"unsupported distance for exact path: {name}")

    with localcontext() as ctx:
        ctx.prec = int(prec)
        g = -Decimal(float(gamma))
        tc = Decimal(float(transportcost))
        inv_g = Decimal(1) / -g

        def smin(u, v, w):
            # same max-shifted form as the float softmin (src/dtw.jl:311-317)
            xs = (u / g, v / g, w / g)
            mx = max(xs)
            s = sum((x - mx).exp() for x in xs)
            return g * (s.ln() + mx)

        n, m = len(a), len(b)  # columns follow seq1, rows seq2 (D[r][c])
        D = [[None] * n for _ in range(m)]
        D[0][0] = cell(b[0], a[0])
        for r in range(1, m):
            D[r][0] = D[r - 1][0] + cell(b[r], a[0])
        for c in range(1, n):
            D[0][c] = D[0][c - 1] + cell(b[0], a[c])
        for r in range(1, m):
            for c in range(1, n):
                v = cell(b[r], a[c])
                if radius is not None and abs(c - r) > radius:
                    v += inv_g  # crude band penalty, src/dtw.jl:270-278
                D[r][c] = v + smin(tc * D[r - 1][c], D[r - 1][c - 1],
                                   tc * D[r][c - 1])
        return +D[m - 1][n - 1]  # unary + rounds to the context precision
