"""DTW Barycenter Averaging (DBA).

Reference: src/dba.jl. Golden value pinned by runtests.jl:473-488:
``dba([x,y,z], DTW(5), init_center=z) == [1.0, 1.75, 2.75, 4.0]`` (and the
same per-row for multichannel input).

Key reference behaviors preserved:
- ``distpath`` for a DTW distance is the **unconstrained** full dtw
  (src/distance_interface.jl:91-94) unless explicit ``i2min/i2max`` windows
  are passed through (src/dba.jl:131-136).
- Convergence: ``Δ = (cost - newcost)/newcost < rtol`` (src/dba.jl:78-80);
  the freshly computed ``newavg`` is returned even on the converging
  iteration (src/dba.jl:101).
- Accumulation ``counts[i1[j]] += 1; newavg[i1[j]] += seq[i2[j]]`` then an
  unconditional divide (src/dba.jl:140-149) — vectorized via np.add.at.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from .dtw import dtw

__all__ = ["DBAResult", "dba", "dba_iteration"]


@dataclass
class DBAResult:
    """Mirror of reference src/dba.jl:8-13."""
    cost: float
    converged: bool
    iterations: int
    cost_trace: List[float] = field(default_factory=list)


def dba_iteration(oldavg: np.ndarray, sequences, dist=None,
                  transportcost: float = 1.0, i2min=None, i2max=None):
    """One DBA iteration (reference src/dba.jl:111-152).

    Returns ``(newavg, total_cost)`` — cost is of the *previous* estimate.
    Sequences are consumed in the given order; callers wanting deterministic
    float summation should sort members by a stable key first.
    """
    oldavg = np.asarray(oldavg, dtype=np.float64)
    L = oldavg.shape[-1]
    counts = np.zeros(L, dtype=np.int64)
    newavg = np.zeros_like(oldavg)
    total_cost = 0.0
    for seq in sequences:
        seq = np.asarray(seq, dtype=np.float64)
        cost, i1, i2 = dtw(oldavg, seq, dist, i2min=i2min, i2max=i2max,
                           transportcost=transportcost)
        total_cost += cost
        np.add.at(counts, i1 - 1, 1)
        if oldavg.ndim == 1:
            np.add.at(newavg, i1 - 1, seq[i2 - 1])
        else:
            np.add.at(newavg.T, i1 - 1, seq.T[i2 - 1])
    newavg = newavg / counts  # unconditional divide (src/dba.jl:147-149)
    return newavg, total_cost


def dba(sequences, dist=None, init_center=None, iterations: int = 1000,
        rtol: float = 1e-5, store_trace: bool = False,
        transportcost: float = 1.0, i2min=None, i2max=None):
    """DTW Barycenter Averaging (reference src/dba.jl:28-102).

    ``init_center`` defaults to the first sequence (the reference uses a
    random sample; we pin it for determinism — its own tests do the same,
    runtests.jl:479).
    """
    seqs = [np.asarray(s, dtype=np.float64) for s in sequences]
    center = np.array(seqs[0] if init_center is None else init_center,
                      dtype=np.float64, copy=True)
    converged = False
    it = 0
    cost = np.inf
    newcost = np.inf
    trace: List[float] = []
    newavg = center
    while not converged and it < iterations:
        newavg, newcost = dba_iteration(center, seqs, dist,
                                        transportcost=transportcost,
                                        i2min=i2min, i2max=i2max)
        it += 1
        if store_trace:
            trace.append(newcost)
        delta = (cost - newcost) / newcost if newcost > 0 else 0.0
        if delta < rtol:
            converged = True
        else:
            cost = newcost
            center = newavg
    return newavg, DBAResult(float(newcost), converged, it, trace)
