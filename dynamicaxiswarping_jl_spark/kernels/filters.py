"""Cost-matrix smoothing filters (reference src/filters.jl).

``imfilter``: square-kernel 2-D convolution with borders copied from the
input (src/filters.jl:1-11) — used as a dtw ``postprocess`` to penalize
small-scale warping. ``gaussian``/``gaussian2``: normalized kernels on a
[-2, 2] grid (src/filters.jl:14-25).
"""

from __future__ import annotations

import numpy as np

__all__ = ["gaussian", "gaussian2", "imfilter"]


def gaussian(n: int) -> np.ndarray:
    """Normalized 1-D Gaussian sampled on linspace(-2, 2, n)."""
    t = np.linspace(-2.0, 2.0, n)
    k = np.exp(-0.5 * t * t)
    return k / k.sum()


def gaussian2(n: int) -> np.ndarray:
    """Normalized 2-D Gaussian kernel (outer product of gaussian(n))."""
    g = gaussian(n)
    k = np.outer(g, g)
    return k / k.sum()


def imfilter(A: np.ndarray, kern: np.ndarray) -> np.ndarray:
    """'same'-size 2-D convolution; the border band (half the kernel width)
    is copied from the input, matching reference src/filters.jl:1-11."""
    A = np.asarray(A, dtype=np.float64)
    kern = np.asarray(kern, dtype=np.float64)
    kh, kw = kern.shape
    assert kh == kw and kh % 2 == 1, "kernel must be square with odd size"
    h = kh // 2
    out = A.copy()
    m, n = A.shape
    if m <= 2 * h or n <= 2 * h:
        return out
    # valid convolution via stride tricks (flip kernel for true convolution)
    win = np.lib.stride_tricks.sliding_window_view(A, (kh, kw))
    out[h:m - h, h:n - h] = np.einsum("ijkl,kl->ij", win, kern[::-1, ::-1])
    return out
