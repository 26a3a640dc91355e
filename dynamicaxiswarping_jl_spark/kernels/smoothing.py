"""Series smoothing kernels (engine-added; the reference's smoothing is
the cost-matrix ``imfilter`` family, `src/filters.jl` → ``filters.py``).

``ewma``: exponentially weighted moving average, the standard
monitoring-tier smoother —

    s[0] = y[0];  s[t] = alpha*y[t] + (1-alpha)*s[t-1]

The recurrence order is the contract: the golden oracle re-derives it
with the same left-to-right scalar loop, so results are bitwise
reproducible (each step is one fma-free multiply-add chain in float64).
"""

from __future__ import annotations

import numpy as np

__all__ = ["ewma"]


def ewma(y: np.ndarray, alpha: float) -> np.ndarray:
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    y = np.ascontiguousarray(y, dtype=np.float64)
    out = np.empty_like(y)
    if len(y) == 0:
        return out
    beta = 1.0 - alpha
    s = y[0]
    out[0] = s
    for t in range(1, len(y)):
        s = alpha * y[t] + beta * s
        out[t] = s
    return out
