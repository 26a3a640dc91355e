"""FastDTW: recursive coarse-to-fine approximate DTW.

Reference: src/fastdtw.jl (Salvador & Chan 2007). Goldens:
runtests.jl:340-351 (compress2), :354-448 (computewindow), :452-471
(FastDTW ≈ DTW on smooth signals).
"""

from __future__ import annotations

import numpy as np

from .dtw import dtw

__all__ = ["fastdtw", "compress2", "expandpath", "computewindow"]


def compress2(seq: np.ndarray) -> np.ndarray:
    """Halve resolution: mean of adjacent pairs, odd tail kept verbatim
    (reference src/fastdtw.jl:97-105). Also reusable as a plain downsample
    primitive alongside the time-bucket rollups."""
    seq = np.asarray(seq, dtype=np.float64)
    n = seq.shape[-1]
    even = 0.5 * (seq[..., 0:n - 1:2] + seq[..., 1:n:2])
    if n % 2 == 1:
        tail = seq[..., n - 1:n]
        return np.concatenate((even, tail), axis=-1)
    return even


def expandpath(lowrescol, lowresrow, Ncol: int, Nrow: int):
    """Upsample a low-res warp path 2x (reference src/fastdtw.jl:47-92).

    Paths are 1-based index vectors, matching the reference convention.
    """
    lowrescol = np.asarray(lowrescol, dtype=np.int64)
    lowresrow = np.asarray(lowresrow, dtype=np.int64)
    assert (Ncol + 1) // 2 == lowrescol[-1]
    assert (Nrow + 1) // 2 == lowresrow[-1]
    Np = len(lowrescol)
    assert Np == len(lowresrow)
    hirescol = np.zeros(2 * Np, dtype=np.int64)
    hiresrow = np.zeros(2 * Np, dtype=np.int64)
    c = r = 1
    hirescol[0] = hiresrow[0] = 1
    for i in range(Np - 1):
        if lowrescol[i + 1] == lowrescol[i]:  # up
            r += 1
            hirescol[2 * i + 1], hiresrow[2 * i + 1] = c, r
            r += 1
            hirescol[2 * i + 2], hiresrow[2 * i + 2] = c, r
        elif lowresrow[i + 1] == lowresrow[i]:  # sideways
            c += 1
            hirescol[2 * i + 1], hiresrow[2 * i + 1] = c, r
            c += 1
            hirescol[2 * i + 2], hiresrow[2 * i + 2] = c, r
        else:  # diagonal
            c += 1
            r += 1
            hirescol[2 * i + 1], hiresrow[2 * i + 1] = c, r
            c += 1
            r += 1
            hirescol[2 * i + 2], hiresrow[2 * i + 2] = c, r
    hirescol[-1] = Ncol
    hiresrow[-1] = Nrow
    if hirescol[-1] == hirescol[-2] and hiresrow[-1] == hiresrow[-2]:
        hirescol = hirescol[:-1]
        hiresrow = hiresrow[:-1]
    return hirescol, hiresrow


def computewindow(pathcols, pathrows, radius: int):
    """Per-column [rowmin, rowmax] window of given radius around a path
    (reference src/fastdtw.jl:114-148). 1-based in and out."""
    pathcols = np.asarray(pathcols, dtype=np.int64)
    pathrows = np.asarray(pathrows, dtype=np.int64)
    Np = len(pathcols)
    assert Np == len(pathrows)
    Ncol = int(pathcols[-1])
    Nrow = int(pathrows[-1])
    pathmin = np.zeros(Ncol, dtype=np.int64)
    pathmax = np.zeros(Ncol, dtype=np.int64)
    for i in range(Np):
        c, r = pathcols[i], pathrows[i]
        pathmax[c - 1] = r
        if pathmin[c - 1] == 0:
            pathmin[c - 1] = r
    if radius < Ncol - 1 and radius < Nrow - 1:
        rowmin = np.concatenate((np.ones(radius, dtype=np.int64),
                                 pathmin[:Ncol - radius] - radius))
        rowmax = np.concatenate((pathmax[radius:] + radius,
                                 np.full(radius, Nrow, dtype=np.int64)))
        np.clip(rowmin, 1, None, out=rowmin)
        np.clip(rowmax, None, Nrow, out=rowmax)
    else:
        rowmin = np.ones(Ncol, dtype=np.int64)
        rowmax = np.full(Ncol, Nrow, dtype=np.int64)
    return rowmin, rowmax


def fastdtw(seq1, seq2, dist=None, radius: int = 1,
            transportcost: float = 1.0):
    """FastDTW approximation (reference src/fastdtw.jl:12-36).

    Returns ``(cost, i1, i2)`` with 1-based paths like ``dtw``.
    """
    seq1 = np.asarray(seq1, dtype=np.float64)
    seq2 = np.asarray(seq2, dtype=np.float64)
    min_size = max(radius + 2, 10)
    n1 = seq1.shape[-1]
    n2 = seq2.shape[-1]
    if n1 <= min_size or n2 <= min_size:
        return dtw(seq1, seq2, dist, transportcost=transportcost)
    comp1 = compress2(seq1)
    comp2 = compress2(seq2)
    _cost, lowrescol, lowresrow = fastdtw(comp1, comp2, dist, radius,
                                          transportcost=transportcost)
    hirescol, hiresrow = expandpath(lowrescol, lowresrow, n1, n2)
    i2min, i2max = computewindow(hirescol, hiresrow, radius)
    return dtw(seq1, seq2, dist, i2min=i2min, i2max=i2max,
               transportcost=transportcost)
