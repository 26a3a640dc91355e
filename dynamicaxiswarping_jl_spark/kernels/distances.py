"""Inner (per-time-slice) distances.

Matches the pluggable inner metrics of the reference
(Distances.jl SqEuclidean/Euclidean/Cityblock/Chebyshev, exercised at
reference test/runtests.jl:153-163). Series use **time as the last axis**
(reference README.md:11): 1-D ``(n,)`` is univariate, 2-D ``(channels, n)``
is multivariate; a time slice is ``x[..., i]``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["SqEuclidean", "Euclidean", "Cityblock", "Chebyshev", "get_dist"]


def _as2d(x: np.ndarray) -> np.ndarray:
    """View a series as (channels, n) with time last."""
    x = np.asarray(x, dtype=np.float64)
    return x[None, :] if x.ndim == 1 else x


class _Dist:
    """Base: subclasses define elementwise + pairwise forms, all vectorized."""

    name = "base"

    def __call__(self, a, b):
        """Distance between two time slices (scalars or channel vectors)."""
        raise NotImplementedError

    def pairwise(self, s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
        """All-pairs local-cost matrix, shape (lastlen(s1), lastlen(s2)).

        Mirrors ``Distances.pairwise`` overloads at reference src/dtw.jl:34-38
        (broadcast for vectors, per-slice for multichannel) but fully
        vectorized in NumPy.
        """
        raise NotImplementedError

    def profile(self, s1: np.ndarray, s2: np.ndarray) -> np.ndarray:
        """Aligned per-timestep distances d(s1[..,i], s2[..,i]) (vectorized)."""
        raise NotImplementedError


class SqEuclidean(_Dist):
    """Squared Euclidean — the reference default (src/dtw.jl:40)."""

    name = "sqeuclidean"

    def __call__(self, a, b):
        d = np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)
        return float(np.sum(d * d))

    def pairwise(self, s1, s2):
        a, b = _as2d(s1), _as2d(s2)
        # (n1, n2) = sum over channels of (a_i - b_j)^2
        diff = a[:, :, None] - b[:, None, :]
        return np.einsum("cij,cij->ij", diff, diff)

    def profile(self, s1, s2):
        a, b = _as2d(s1), _as2d(s2)
        d = a - b
        return np.einsum("ci,ci->i", d, d)


class Euclidean(_Dist):
    name = "euclidean"

    def __call__(self, a, b):
        d = np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64)
        return float(np.sqrt(np.sum(d * d)))

    def pairwise(self, s1, s2):
        return np.sqrt(SqEuclidean().pairwise(s1, s2))

    def profile(self, s1, s2):
        return np.sqrt(SqEuclidean().profile(s1, s2))


class Cityblock(_Dist):
    name = "cityblock"

    def __call__(self, a, b):
        return float(np.sum(np.abs(np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64))))

    def pairwise(self, s1, s2):
        a, b = _as2d(s1), _as2d(s2)
        return np.abs(a[:, :, None] - b[:, None, :]).sum(axis=0)

    def profile(self, s1, s2):
        a, b = _as2d(s1), _as2d(s2)
        return np.abs(a - b).sum(axis=0)


class Chebyshev(_Dist):
    name = "chebyshev"

    def __call__(self, a, b):
        return float(np.max(np.abs(np.asarray(a, dtype=np.float64) - np.asarray(b, dtype=np.float64))))

    def pairwise(self, s1, s2):
        a, b = _as2d(s1), _as2d(s2)
        return np.abs(a[:, :, None] - b[:, None, :]).max(axis=0)

    def profile(self, s1, s2):
        a, b = _as2d(s1), _as2d(s2)
        return np.abs(a - b).max(axis=0)


_REGISTRY = {
    "sqeuclidean": SqEuclidean,
    "euclidean": Euclidean,
    "cityblock": Cityblock,
    "chebyshev": Chebyshev,
}


def get_dist(dist) -> _Dist:
    """Resolve a distance spec (name | instance | None→SqEuclidean)."""
    if dist is None:
        return SqEuclidean()
    if isinstance(dist, _Dist):
        return dist
    if isinstance(dist, str):
        return _REGISTRY[dist.lower()]()
    raise TypeError(f"unknown distance spec: {dist!r}")
