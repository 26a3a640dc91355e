"""Pruned subsequence nearest-neighbor search (the reference "query engine").

Reproduces reference src/dtwnn.jl semantics:

- 3-stage cascade per sliding window: O(1) endpoint lower bound
  (src/dtwnn.jl:99-119) → LB_Keogh envelope bound filling the per-step
  cumulative bound (src/dtwnn.jl:121-143) → exact banded ``dtw_cost`` with
  early abandon vs best-so-far (src/dtw.jl:227-229).
- ``loc`` is the **1-based** start index of the best window
  (src/dtwnn.jl:183,234; README.md:119-120 uses ``res.loc-1`` as 0-based).
- Windows are processed in ascending position with strict improvement
  (``newdist < best_so_far``), so ties keep the earliest location.
- ``saveall`` disables pruning and records the dense profile
  (src/dtwnn.jl:159); pruned positions otherwise hold +inf.
- Envelope pruning only applies to 1-D data (src/dtwnn.jl:125,187-188).

Vectorization strategy (Spark-first, per input_hint "no per-row Python"):
both lower bounds are precomputed for *all* windows at once with sliding
cumulative sums / sliding_window_view (chunked to bound memory), then a
sequential pass mirrors the reference's best-so-far threading exactly —
only surviving windows pay the exact DP kernel.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from .distances import BUILTIN_NAMES, get_dist
from .dtw import dtw_cost
from .normalizers import znorm, sliding_znorm_stats, lower_upper_envs

__all__ = ["DTWSearchResult", "dtwnn", "sparse_distmat", "distance_profile",
           "matrix_profile"]

_INF = np.inf
_CHUNK = 1 << 14  # windows per vectorized LB block


@dataclass
class DTWSearchResult:
    """Mirror of reference src/dtwnn.jl:28-34."""
    cost: float
    loc: int  # 1-based best window start
    prune_end: int
    prune_env: int
    dists: Optional[np.ndarray] = field(default=None, repr=False)


def _elem_dist(dist_name: str, x, y):
    d = np.subtract(x, y)
    if dist_name == "sqeuclidean":
        return d * d
    return np.abs(d)  # euclidean == cityblock == chebyshev for scalars


def _lb_endpoints_all(dist_name: str, q: np.ndarray, y: np.ndarray, m: int,
                      mu: Optional[np.ndarray], sd: Optional[np.ndarray]) -> np.ndarray:
    """Vectorized endpoint lower bound for every window start (1-D only).

    Full (non-early-out) sum of the reference's refinement terms
    (src/dtwnn.jl:99-119); the early-outs there only shortcut already-pruned
    windows, so the prune decision is identical. Short-m soundness fix as
    in ``lb_endpoints``: m == 1 uses the single exact term, refinements
    only for m >= 4 (the reference's formula overshoots at m == 1 and
    m == 3, which made the LB prune true nearest neighbors).
    """
    n = len(y)
    nw = n - m + 1

    def norm_at(off):
        v = y[off:off + nw]  # contiguous view — fancy-indexing would copy
        if mu is None:
            return v
        return (v - mu) / sd

    x1 = norm_at(0)
    if m == 1:
        return _elem_dist(dist_name, q[0], x1)
    y1 = norm_at(m - 1)
    lb = _elem_dist(dist_name, q[0], x1) + _elem_dist(dist_name, q[m - 1], y1)
    if m > 3:
        x2 = norm_at(1)
        lb += np.minimum(np.minimum(
            _elem_dist(dist_name, x2, q[0]),
            _elem_dist(dist_name, x1, q[1])),
            _elem_dist(dist_name, x2, q[1]))
        y2 = norm_at(m - 2)
        lb += np.minimum(np.minimum(
            _elem_dist(dist_name, y2, q[m - 1]),
            _elem_dist(dist_name, y1, q[m - 2])),
            _elem_dist(dist_name, y2, q[m - 2]))
    return lb


def _lb_env_window(dist_name: str, x: np.ndarray, l: np.ndarray, u: np.ndarray) -> np.ndarray:
    """Per-step LB_Keogh contributions for one (normalized) window
    (reference src/dtwnn.jl:121-137)."""
    above = x > u
    below = x < l
    d = np.zeros_like(x)
    d[above] = _elem_dist(dist_name, x[above], u[above])
    d[below] = _elem_dist(dist_name, x[below], l[below])
    return d


def _lb_env_all(dist_name: str, y: np.ndarray, m: int, l: np.ndarray,
                u: np.ndarray, mu: Optional[np.ndarray],
                sd: Optional[np.ndarray]) -> np.ndarray:
    """LB_Keogh totals for all windows, chunked sliding-window vectorization.

    The per-step excess is ``e = max(x-u, 0) + max(l-x, 0)`` (at most one
    term non-zero), so the bound is Σe² (sqeuclidean) or Σe — two clips and
    a reduction instead of masks+where. With z-normalization the comparison
    is done in RAW space against per-window scaled envelopes
    (x_norm > u ⟺ x > u·sd + mu), then rescaled — avoids materializing the
    normalized window block.
    """
    n = len(y)
    nw = n - m + 1
    out = np.zeros(nw)
    # Sum per query-offset j over the CONTIGUOUS slice y[j : j+nw] instead
    # of materializing the (nw, m) strided window matrix — same flops,
    # cache-friendly streams, m vector passes total.
    t1 = np.empty(nw)
    t2 = np.empty(nw)
    inv_sd = None if sd is None else 1.0 / sd
    for j in range(m):
        seg = y[j:j + nw]
        if mu is not None:
            # x_norm > u[j]  ⟺  x > u[j]*sd + mu   (work in raw space)
            np.multiply(sd, u[j], out=t1)
            t1 += mu
            np.subtract(seg, t1, out=t1)          # x - u_raw
            np.maximum(t1, 0.0, out=t1)
            np.multiply(sd, l[j], out=t2)
            t2 += mu
            np.subtract(t2, seg, out=t2)          # l_raw - x
            np.maximum(t2, 0.0, out=t2)
            t1 += t2
            t1 *= inv_sd
        else:
            np.subtract(seg, u[j], out=t1)
            np.maximum(t1, 0.0, out=t1)
            np.subtract(l[j], seg, out=t2)
            np.maximum(t2, 0.0, out=t2)
            t1 += t2
        if dist_name == "sqeuclidean":
            t1 *= t1
        out += t1
    return out


def _lb_env_subset(dist_name: str, y: np.ndarray, m: int, l: np.ndarray,
                   u: np.ndarray, mu: Optional[np.ndarray],
                   sd: Optional[np.ndarray],
                   cand: np.ndarray) -> np.ndarray:
    """LB_Keogh totals for a SUBSET of window starts (same math as
    ``_lb_env_all``): gathers the candidate windows and vectorizes over
    them, bounded-memory via chunks. This is the lazy-evaluation analog of
    the reference's per-window ``lb_env!`` after endpoint pruning
    (src/dtwnn.jl:203-213) — the full O(n·m) sweep is only worth paying
    when endpoints prune nothing."""
    if y.ndim == 1 and dist_name in ("sqeuclidean", "euclidean",
                                     "cityblock"):
        from . import native
        if native.available():
            return native.lb_env_subset(y, m, l, u, mu, sd,
                                        dist_name == "sqeuclidean", cand)
    out = np.empty(len(cand))
    windows = np.lib.stride_tricks.sliding_window_view(y, m)
    B = 1 << 16
    for s in range(0, len(cand), B):
        c = cand[s:s + B]
        X = windows[c]  # gather-copy (b, m)
        if mu is not None:
            scale = sd[c, None]
            off = mu[c, None]
            e = (np.maximum(X - (u[None, :] * scale + off), 0.0)
                 + np.maximum((l[None, :] * scale + off) - X, 0.0))
            e /= scale
        else:
            e = (np.maximum(X - u[None, :], 0.0)
                 + np.maximum(l[None, :] - X, 0.0))
        if dist_name == "sqeuclidean":
            e *= e
        out[s:s + B] = e.sum(axis=1)
    return out


def _avoid_mask(avoid, nw: int) -> Optional[np.ndarray]:
    """1-based avoided locations → boolean mask over window starts."""
    if avoid is None:
        return None
    mask = np.zeros(nw, dtype=bool)
    if isinstance(avoid, tuple) and len(avoid) == 2:
        lo, hi = avoid
        lo = max(1, int(lo))
        hi = min(nw, int(hi))
        if lo <= hi:
            mask[lo - 1:hi] = True
    else:
        for a in avoid:
            if 1 <= int(a) <= nw:
                mask[int(a) - 1] = True
    return mask


def dtwnn(q, y, dist=None, rad: int = 5, normalizer: Optional[str] = None, *,
          prune_endpoints: bool = True, prune_envelope: bool = True,
          saveall: bool = False, bsf_multiplier: float = 1.0,
          transportcost: float = 1.0, avoid=None,
          initial_bsf: float = _INF, dtype=np.float64,
          envs=None) -> DTWSearchResult:
    """Nearest neighbor to ``q`` among all length-|q| windows of ``y``
    (reference src/dtwnn.jl:162-238).

    ``initial_bsf`` seeds the best-so-far threshold (default Inf = the
    reference's cold start). Callers searching *many* series for one query
    thread the running global minimum through it, so later series prune
    against a real bound; if every window's LB exceeds the seed, the
    result cost is Inf (no window computed — caller keeps its prior best).

    ``envs``: precomputed ``lower_upper_envs(znorm?(q), rad)`` — the
    envelopes depend only on the (normalized) query, so callers searching
    MANY series with one query pass them once instead of recomputing per
    series (result-identical; the short-query/many-series workload is
    dispatch-bound).
    """
    if bsf_multiplier < 1:
        raise ValueError("bsf_multiplier must be >= 1")
    if int(rad) < 0:
        # validated before ANY path: the C cascade would otherwise read an
        # empty band's scratch out of bounds where the NumPy path raises
        raise ValueError(f"radius must be >= 0, got {rad}")
    d = get_dist(dist)
    if d.name not in BUILTIN_NAMES:
        # the LB cascade's _elem_dist and envelope bounds assume the
        # built-in scalar family — a custom metric would silently get
        # |x-y| bounds that may over-prune; reject loudly (the reference
        # carries the matching validity caveat at src/dtwnn.jl:125).
        # Custom metrics are supported in dtw/dtw_cost_matrix/dtw_cost/
        # soft_dtw_cost/dtw_pairs (see distances.CustomDist).
        raise ValueError(
            f"dtwnn supports built-in metrics only, got {d.name!r}")
    # dtype=np.float32 runs the whole cascade in reduced precision
    # (reference README.md:148: "up to twice as fast"); default float64
    q = np.asarray(q, dtype=dtype)
    y = np.asarray(y, dtype=dtype)
    onedim = q.ndim == 1
    m = q.shape[-1]
    n = y.shape[-1]
    if n < m:
        raise ValueError("q must be shorter than y, swap inputs")
    nw = n - m + 1

    use_znorm = normalizer in ("znorm", "z", "ZNormalizer")
    if normalizer not in (None, "znorm", "z", "ZNormalizer"):
        raise ValueError(f"unsupported normalizer {normalizer!r}")
    if use_znorm and not onedim:
        raise ValueError("znorm search supports 1-D series only")

    qn = znorm(q).astype(dtype) if use_znorm else q
    mu = sd = None
    if use_znorm:
        mu, sd = sliding_znorm_stats(y, m)
        sd = np.where(sd == 0.0, 1.0, sd)
        mu = mu.astype(dtype)
        sd = sd.astype(dtype)

    # ---- whole-cascade C fast path ----
    # One C call runs endpoint LB + LB_Keogh + full band DP for the whole
    # series: cost/loc are identical to the batched path below (every
    # window tying the final minimum survives any sound LB filter and the
    # DP loop is the same BATCH_IMPL recurrence — see nn_search_sq in
    # _native.c); prune counters keep the final-threshold rule but may
    # differ in value from the chunk-ordered scan (metrics, not goldens).
    # saveall needs the dense profile and multichannel/other metrics need
    # the generic paths, so those fall through.
    if (onedim and not saveall and d.name == "sqeuclidean"
            and transportcost == 1.0
            and (avoid is None or (isinstance(avoid, tuple)
                                   and len(avoid) == 2))):
        from . import native
        if native.available():
            if prune_envelope:
                l_env, u_env = (envs if envs is not None
                                else lower_upper_envs(qn, rad))
            else:
                l_env = u_env = qn  # unused by C when use_env == 0
            a_lo = a_hi = 0
            if avoid is not None:
                a_lo = max(1, int(avoid[0]))
                a_hi = min(nw, int(avoid[1]))
                if a_lo > a_hi:
                    a_lo = a_hi = 0
            got = native.nn_search(qn, y, int(rad), l_env, u_env, mu, sd,
                                   float(initial_bsf), float(bsf_multiplier),
                                   a_lo, a_hi, prune_endpoints,
                                   prune_envelope)
            if got is not None:
                cost, loc, pe, pv = got
                return DTWSearchResult(cost, loc, pe, pv, None)

    # ---- stage-1/2 lower bounds, vectorized over all windows ----
    lb_end = None
    if prune_endpoints and not saveall and onedim:
        lb_end = _lb_endpoints_all(d.name, qn, y, m, mu, sd)
    lb_env = None
    l_env = u_env = None
    defer_env = False
    if prune_envelope and not saveall and onedim:
        l_env, u_env = envs if envs is not None else lower_upper_envs(qn, rad)
        if prune_endpoints and lb_end is not None:
            # lazy: LB_Keogh only for endpoint-surviving windows, after a
            # bootstrap chunk establishes best-so-far (below)
            defer_env = True
        else:
            lb_env = _lb_env_all(d.name, y, m, l_env, u_env, mu, sd)

    mask = _avoid_mask(avoid, nw)
    X = np.lib.stride_tricks.sliding_window_view(y, m) if onedim else None
    dists = np.full(nw, _INF)

    # ---- exact stage ----
    # Batched strategy (result-identical to the reference's sequential scan,
    # SURVEY §2.3): sort candidate windows by their lower bound ascending,
    # compute exact banded costs in vectorized chunks (dtw_cost_batch
    # amortizes the DP across windows — the batch analog of the reference's
    # workspace reuse), stop when the next chunk's smallest LB already
    # exceeds bsf_multiplier * best-so-far. Prune counters are evaluated
    # against the final threshold: same metrics role as the reference's
    # (src/dtwnn.jl:191-193), deterministic instead of scan-order-dependent.
    if onedim:
        from .dtw import dtw_cost_batch

        lbe = lb_end if lb_end is not None else np.zeros(nw)
        lbv = lb_env if lb_env is not None else np.zeros(nw)
        cand = np.arange(nw) if mask is None else np.flatnonzero(~mask)
        best_so_far = float(initial_bsf) if not saveall else _INF
        CH = 512
        if defer_env and not saveall:
            # LB_Keogh only for endpoint survivors — avoids the O(n·m)
            # full-envelope sweep when endpoints already prune almost
            # everything. With no usable best-so-far yet, a small
            # bootstrap of lowest-endpoint-LB windows establishes one
            # first (zero-heavy series make the endpoint LB weak, so the
            # envelope filter right after is what actually prunes).
            # argpartition, not argsort: the bootstrap only needs the BOOT
            # smallest endpoint-LBs, and an O(n log n) sort of ~10⁶ window
            # LBs was the single largest cost of the whole search (the
            # survivors get properly sorted below, where the set is small)
            if np.isfinite(best_so_far):
                rest = cand  # seeded by the caller: skip the bootstrap
            else:
                BOOT = min(64, len(cand))
                if BOOT:
                    lc = lbe[cand]
                    part = (np.argpartition(lc, BOOT - 1)[:BOOT]
                            if len(cand) > BOOT else np.arange(len(cand)))
                    part = part[np.argsort(lc[part], kind="stable")]
                    boot = cand[part]
                    W = X[boot]
                    if use_znorm:
                        W = (W - mu[boot, None]) / sd[boot, None]
                    costs = dtw_cost_batch(qn, W, rad,
                                           transportcost=transportcost)
                    dists[boot] = costs
                    cmin = costs.min()
                    if cmin < best_so_far:
                        best_so_far = cmin
                    keep = np.ones(len(cand), dtype=bool)
                    keep[part] = False
                    rest = cand[keep]
                else:
                    rest = cand
            rest = rest[lbe[rest] <= bsf_multiplier * best_so_far]
            from . import native as _nat
            subset_native = (_nat.available()
                             and d.name in ("sqeuclidean", "euclidean",
                                            "cityblock"))
            if len(rest) > nw // 4 and not subset_native:
                # weak endpoint pruning WITHOUT the C subset kernel (no
                # compiler, or a metric it doesn't cover): the gather-based
                # NumPy subset sweep materializes ~(|rest|, m) window
                # copies; the streamed full sweep (m contiguous passes, no
                # gather) is cheaper once most windows survive. (The C
                # subset path streams per candidate and beats both.)
                lbv = _lb_env_all(d.name, y, m, l_env, u_env, mu, sd)
            elif len(rest):
                lbv[rest] = _lb_env_subset(d.name, y, m, l_env, u_env,
                                           mu, sd, rest)
            cand = rest
        lb = np.maximum(lbe, lbv)
        order = cand[np.argsort(lb[cand], kind="stable")]
        pos = 0
        while pos < len(order):
            chunk = order[pos:pos + CH]
            if not saveall:
                thresh = bsf_multiplier * best_so_far
                chunk = chunk[lb[chunk] <= thresh]
                if len(chunk) == 0:
                    break
            W = X[chunk]
            if use_znorm:
                W = (W - mu[chunk, None]) / sd[chunk, None]
            costs = dtw_cost_batch(qn, W, rad, transportcost=transportcost)
            dists[chunk] = costs
            cmin = costs.min()
            if cmin < best_so_far:
                best_so_far = cmin
            pos += CH
        computed = np.isfinite(dists)
        if computed.any():
            best_so_far = dists[computed].min()
            best_loc = int(np.flatnonzero(dists == best_so_far)[0]) + 1
        else:
            best_so_far, best_loc = _INF, 1
        thresh = bsf_multiplier * best_so_far
        pruned = ~computed
        if mask is not None:
            pruned &= ~mask
        prune_end = int((pruned & (lbe > thresh)).sum()) if lb_end is not None else 0
        if lb_env is not None or defer_env:
            # in the deferred path lb_env stays None but lbv carries the
            # LB_Keogh values computed for the endpoint-surviving subset —
            # count env-pruned windows from lbv either way (ADVICE r01:
            # keying on lb_env alone systematically reported 0)
            env_only = pruned & (lbv > thresh)
            if lb_end is not None:
                env_only &= ~(lbe > thresh)
            prune_env = int(env_only.sum())
        else:
            prune_env = 0
        return DTWSearchResult(float(best_so_far), best_loc, prune_end,
                               prune_env, dists)

    # ---- fallback: sequential scan (saveall or multichannel) ----
    best_so_far = float(initial_bsf) if not saveall else _INF
    best = _INF  # best within THIS series (seed only tightens pruning)
    best_loc = 1
    zeros_cb = np.zeros(m)
    for it in range(nw):
        if mask is not None and mask[it]:
            continue
        bsf = bsf_multiplier * best_so_far
        if onedim:
            w = X[it]
            if use_znorm:
                w = (w - mu[it]) / sd[it]
        else:
            w = y[..., it:it + m]
        newdist = dtw_cost(qn, w, d, rad,
                           transportcost=transportcost,
                           best_so_far=_INF if saveall else bsf,
                           cumulative_bound=zeros_cb)
        dists[it] = newdist
        # an early-abandoned dtw_cost returns a PARTIAL sum (a lower
        # bound >= bsf, reference src/dtw.jl:227-229) — only values that
        # beat the running threshold are guaranteed exact, so only those
        # may become the reported best (src/dtwnn.jl:231-234 semantics)
        if newdist < best_so_far:
            best_so_far = newdist
            best = newdist
            best_loc = it + 1
    return DTWSearchResult(float(best), best_loc, 0, 0, dists)


def lb_endpoints(dist, q, buf, best_so_far: float = _INF) -> float:
    """Scalar endpoint lower bound between two equal-length series
    (reference src/dtwnn.jl:99-119), with the reference's early-outs.

    KNOWN DEVIATION (soundness fix): the reference's formula is NOT a
    lower bound for m == 1 (first and last cell are the same cell, so its
    two-term sum double-counts it) or m == 3 (the two refinement terms
    both bound the single interior cell of the pure-diagonal path, so
    their sum overshoots it). Here m == 1 returns the single exact term
    and refinements only apply for m >= 4, where the start-adjacent and
    end-adjacent cell sets are provably disjoint. Pinned by
    tests/test_kernels_dtwnn.py::TestShortQuerySoundness."""
    d = get_dist(dist)
    q = np.asarray(q, dtype=np.float64)
    buf = np.asarray(buf, dtype=np.float64)
    m = q.shape[-1]
    q1, qm = q[..., 0], q[..., m - 1]
    x1, y1 = buf[..., 0], buf[..., m - 1]
    if m == 1:
        return float(d(q1, x1))
    lb = d(q1, x1) + d(qm, y1)
    if lb >= best_so_far or m <= 3:
        return float(lb)
    x2 = buf[..., 1]
    lb += min(d(x2, q1), d(x1, q[..., 1]), d(x2, q[..., 1]))
    if lb >= best_so_far:
        return float(lb)
    y2 = buf[..., m - 2]
    lb += min(d(y2, qm), d(y1, q[..., m - 2]), d(y2, q[..., m - 2]))
    return float(lb)


def sparse_distmat(series, k: int, dist=None, rad: int = 5,
                   transportcost: float = 1.0):
    """k nearest neighbors among N series: per-row max-heap frontier with
    endpoint-LB prescreen and early-abandoned dtw_cost
    (reference src/dtwnn.jl:261-297). Returns (DISTS, INDS) with 1-based
    neighbor indices, each row ascending by distance."""
    import heapq

    d = get_dist(dist)
    if d.name not in BUILTIN_NAMES:
        # same soundness boundary as dtwnn: lb_endpoints and the
        # best-so-far early abandon are lower bounds only for the
        # nonnegative built-in scalar family — a custom metric would
        # silently over-prune the heap frontier
        raise ValueError(
            f"sparse_distmat supports built-in metrics only, got {d.name!r}")
    ys = [np.asarray(s, dtype=np.float64) for s in series]
    N = len(ys)
    DISTS = np.zeros((N, k))
    INDS = np.zeros((N, k), dtype=np.int64)
    for i in range(N):
        bsf = _INF
        heap = []  # max-heap via negated dist: (-d, -j) so ties pop larger j first
        for j in range(N):
            if j == i:
                continue
            dd = lb_endpoints(d, ys[i], ys[j], bsf)
            if dd < bsf:
                dd = dtw_cost(ys[i], ys[j], d, rad, best_so_far=bsf,
                              transportcost=transportcost)
            heapq.heappush(heap, (-dd, -(j + 1)))
            if len(heap) > k:
                bsf = -heapq.heappop(heap)[0]
        for pos in range(k - 1, -1, -1):
            nd, nj = heapq.heappop(heap)
            DISTS[i, pos] = -nd
            INDS[i, pos] = -nj
    return DISTS, INDS


def distance_profile(q, T, dist=None, rad: int = 5, **kw) -> np.ndarray:
    """Dense profile of DTW distances of q vs every window of T
    (reference src/distance_interface.jl:103-110: dtwnn with saveall)."""
    return dtwnn(q, T, dist, rad, saveall=True, **kw).dists


def matrix_profile(T, m: int, rad: int = 5, dist=None,
                   transportcost: float = 1.0):
    """DTW matrix profile: per window, NN distance/index to any other window
    excluding the trivial band i-r:i+r (reference src/matrix_profile.jl:2-19).
    Returns (P, I) with 1-based I."""
    T = np.asarray(T, dtype=np.float64)
    n = T.shape[-1]
    l = n - m + 1
    P = np.empty(l)
    I = np.empty(l, dtype=np.int64)
    for i in range(l):
        res = dtwnn(T[i:i + m], T, dist, rad,
                    transportcost=transportcost,
                    avoid=(i + 1 - rad, i + 1 + rad))
        P[i] = res.cost
        I[i] = res.loc
    return P, I
