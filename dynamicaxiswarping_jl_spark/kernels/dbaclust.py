"""DBA k-means clustering under DTW distance.

Reference: src/dbaclust.jl (dbaclust 58-107, dbaclust_single 123-357,
kmeans++ seeding dbaclust_initial_centers 366-406). The reference's only
behavioral test is statistical — recovery of planted shifted clusters
(runtests.jl:582-630) — so RNG streams are not golden; determinism here
comes from an explicit ``seed``.

Structure preserved from the reference:
- kmeans++ seeding: next center sampled ∝ squared min-DTW-cost to the
  already-chosen centers.
- assignment via full-dtw cost (``distpath``), warp-aligned accumulation,
  empty clusters reseeded from the worst-assigned sequence (sequential,
  src/dbaclust.jl:260-284), then ``inner_iterations`` of DBA per cluster.
- multi-restart wrapper keeps the lowest-cost run.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np

from .dtw import dtw
from .dba import dba_iteration

__all__ = ["DBAClustResult", "dbaclust", "dbaclust_initial_centers"]


@dataclass
class DBAClustResult:
    """Mirror of reference src/dbaclust.jl:7-13."""
    centers: List[np.ndarray]
    clustids: np.ndarray
    converged: bool
    iterations: int
    cost: float


def _dtw_cost_to(center, seq, dist, transportcost):
    return dtw(center, seq, dist, transportcost=transportcost)[0]


def dbaclust_initial_centers(sequences, nclust: int, dist=None,
                             transportcost: float = 1.0, rng=None):
    """kmeans++ seeding under DTW cost (reference src/dbaclust.jl:366-406)."""
    rng = np.random.default_rng(rng)
    seqs = [np.asarray(s, dtype=np.float64) for s in sequences]
    n = len(seqs)
    first = int(rng.integers(n))
    chosen = [first]
    mind = np.array([_dtw_cost_to(seqs[first], s, dist, transportcost)
                     for s in seqs])
    while len(chosen) < nclust:
        w = mind ** 2
        tot = w.sum()
        if tot <= 0:
            # all remaining identical to a center: pick uniformly at random
            cand = [i for i in range(n) if i not in chosen]
            nxt = int(rng.choice(cand))
        else:
            nxt = int(rng.choice(n, p=w / tot))
        chosen.append(nxt)
        dnew = np.array([_dtw_cost_to(seqs[nxt], s, dist, transportcost)
                         for s in seqs])
        mind = np.minimum(mind, dnew)
    return [seqs[i].copy() for i in chosen]


def dbaclust_single(sequences, nclust: int, dist=None, init_centers=None,
                    iterations: int = 100, inner_iterations: int = 10,
                    rtol: float = 1e-4, rtol_inner: float = None,
                    transportcost: float = 1.0, rng=None) -> DBAClustResult:
    """One k-means-with-DTW run (reference src/dbaclust.jl:123-357)."""
    rtol_inner = rtol if rtol_inner is None else rtol_inner
    seqs = [np.asarray(s, dtype=np.float64) for s in sequences]
    n = len(seqs)
    if init_centers is None:
        init_centers = dbaclust_initial_centers(seqs, nclust, dist,
                                                transportcost, rng)
    centers = [np.array(c, dtype=np.float64, copy=True) for c in init_centers]
    clustids = np.zeros(n, dtype=np.int64)
    total_cost = np.inf
    converged = False
    it = 0
    while not converged and it < iterations:
        it += 1
        # --- assignment: argmin DTW cost over centers ---
        costs = np.empty((n, nclust))
        for i, s in enumerate(seqs):
            for c, ctr in enumerate(centers):
                costs[i, c] = _dtw_cost_to(ctr, s, dist, transportcost)
        clustids = costs.argmin(axis=1)
        assigned_cost = costs[np.arange(n), clustids]
        # --- reseed empty clusters from worst-assigned sequences ---
        # (sequential, reference src/dbaclust.jl:260-284)
        for c in range(nclust):
            if not (clustids == c).any():
                worst = int(assigned_cost.argmax())
                centers[c] = seqs[worst].copy()
                clustids[worst] = c
                assigned_cost[worst] = 0.0
        # --- per-cluster DBA refinement ---
        newcost = 0.0
        for c in range(nclust):
            members = [seqs[i] for i in np.flatnonzero(clustids == c)]
            ctr = centers[c]
            ccost = np.inf
            for _ in range(inner_iterations):
                newctr, icost = dba_iteration(ctr, members, dist,
                                              transportcost=transportcost)
                delta = (ccost - icost) / icost if icost > 0 else 0.0
                ctr = newctr
                if delta < rtol_inner:
                    break
                ccost = icost
            centers[c] = ctr
            newcost += ccost if np.isfinite(ccost) else icost
        delta = (total_cost - newcost) / newcost if newcost > 0 else 0.0
        if delta < rtol:
            converged = True
        total_cost = newcost
    return DBAClustResult(centers, clustids, converged, it, float(total_cost))


def dbaclust(sequences, nclust: int, dist=None, n_init: int = 1,
             iterations: int = 100, inner_iterations: int = 10,
             rtol: float = 1e-4, rtol_inner: float = None,
             transportcost: float = 1.0, seed: int = 0) -> DBAClustResult:
    """Multi-restart wrapper keeping the lowest-cost run
    (reference src/dbaclust.jl:58-107). Restarts map to independent seeded
    runs; distributed the same runs become parallel Spark groups keyed by
    init_id."""
    best = None
    for i in range(n_init):
        res = dbaclust_single(sequences, nclust, dist,
                              iterations=iterations,
                              inner_iterations=inner_iterations,
                              rtol=rtol, rtol_inner=rtol_inner,
                              transportcost=transportcost,
                              rng=np.random.default_rng(seed + i))
        if best is None or res.cost < best.cost:
            best = res
    return best
