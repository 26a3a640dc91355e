"""Deterministic synthetic series generators (test/bench fixtures).

``fakedata_gaussian`` mirrors reference src/datasets/fake_datasets.jl:16-46
(Gaussian bumps, amplitude grid, integer labels). The transcript-table
generator lives in sources/transcripts.py.
"""

from __future__ import annotations

import numpy as np

__all__ = ["fakedata_gaussian"]


def fakedata_gaussian(pts_per_clust: int = 10, nclust: int = 2,
                      xmin: float = 0.0, xmax: float = None,
                      nx: int = None, sigma: float = 1.0):
    """Returns (data, labels): data is (nx, npts) — one series per column,
    like the reference — labels are 1-based cluster ids."""
    if xmax is None:
        xmax = nclust * 7.0
    if nx is None:
        nx = int(round((xmax - xmin) * 10))
    x = np.linspace(xmin, xmax, nx)
    mu = np.linspace(xmin, xmax, nclust + 2)[1:-1]
    amp = np.linspace(xmin, xmax, pts_per_clust + 2)[1:-1]
    npts = pts_per_clust * nclust
    data = np.zeros((nx, npts))
    labels = np.zeros(npts, dtype=np.int64)
    i = 0
    for c in range(nclust):
        for n in range(pts_per_clust):
            data[:, i] = amp[n] * np.exp(-((x - mu[c]) ** 2) / (2 * sigma ** 2))
            labels[i] = c + 1
            i += 1
    return data, labels
