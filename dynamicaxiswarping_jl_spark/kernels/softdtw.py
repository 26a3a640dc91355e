"""Soft-DTW (differentiable DTW) kernels.

Reference: src/dtw.jl:245-328 (soft_dtw_cost_matrix, soft_dtw_cost, softmin);
paper: Cuturi & Blondel, "Soft-DTW: a Differentiable Loss Function for
Time-Series" (arXiv:1703.01541). The γ→0 limit approaches standard DTW
(reference runtests.jl:93,107,118) and values can be negative.
"""

from __future__ import annotations

import numpy as np

from .distances import get_dist

__all__ = ["softmin", "soft_dtw_cost_matrix", "soft_dtw_cost"]


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
