"""Linear interpolation gap-fill (kernel side).

Matches the reference's ``LinearInterpolation`` semantics
(src/gdtw.jl:374-399): linear between knots. Distributively, gap-fill is a
time-spine join (operators/gapfill.py); this kernel is the in-UDF math.
"""

from __future__ import annotations

import numpy as np

__all__ = ["linear_interp_fill"]


def linear_interp_fill(values: np.ndarray, *, fill_edges: str = "hold") -> np.ndarray:
    """Fill NaN runs by linear interpolation between the surrounding
    observed points.

    ``fill_edges``: 'hold' extends the first/last observation outward;
    'zero' fills leading/trailing NaNs with 0.0 (rate-series policy).
    All-NaN input returns zeros.
    """
    v = np.asarray(values, dtype=np.float64).copy()
    obs = ~np.isnan(v)
    if not obs.any():
        return np.zeros_like(v)
    idx = np.arange(len(v))
    v[~obs] = np.interp(idx[~obs], idx[obs], v[obs])
    if fill_edges == "zero":
        first, last = idx[obs][0], idx[obs][-1]
        v[:first] = 0.0
        v[last + 1:] = 0.0
    return v
