"""GDTW — continuous-time regularized warping (reference src/gdtw.jl,
paper: Deriso & Boyd 2019, arXiv:1905.12893).

Finds ϕ(s) minimizing

    ∫ metric(x(ϕ(s)), y(ψ(s))) + λinst·Rinst(ϕ′(s)) + λcum·Rcum(ϕ(s)−s) ds

with ψ = 2s − ϕ (symmetric) or ψ = s; the doubly-discretized (M values ×
N times) shortest-path problem is solved and then re-solved max_iters−1
times on an η-shrunk τ grid around the previous warp (src/gdtw.jl:255-295).

NumPy vectorization: the per-time DP step
``min_costs[j,t] = node[j,t] + min_k(min_costs[k,t-1] + edge[k,j,t])``
is one (M×M) matrix-min per time step (src/gdtw.jl:326-350's triple loop
collapsed); node weights evaluate the interpolants on the whole (M,N) τ
grid at once. Backpointers replace the reference's (M,M,N) cost tensor —
same argmin tie-breaking (first index), O(M·N) memory instead of O(M²·N).
"""

from __future__ import annotations

import numpy as np

__all__ = ["LinearInterpolation", "gdtw", "prepare_gdtw",
           "iterative_gdtw", "gdtw_warpings"]

_INF = np.inf


class LinearInterpolation:
    """Continuous view of a discrete series on [0,1]: linear between
    normalized knots, zero outside (reference src/gdtw.jl:374-399)."""

    def __init__(self, x, t=None):
        self.x = np.asarray(x, dtype=np.float64)
        n = self.x.shape[-1]
        t = np.arange(n, dtype=np.float64) if t is None else np.asarray(t, dtype=np.float64)
        if np.any(np.diff(t) < 0):
            raise ValueError("time knots must be sorted")
        self.t = (t - t[0]) / (t[-1] - t[0])

    def __call__(self, s):
        s = np.asarray(s, dtype=np.float64)
        out = np.interp(s, self.t, self.x)
        return np.where((s < 0) | (s > 1), 0.0, out)


def _initial_bounds(t, smin, smax, symmetric):
    """Feasibility bounds on ϕ(t) (reference src/gdtw.jl:40-69, incl. the
    0.99/1.01 float-slack loosening at :44-45)."""
    smin = 0.99 * smin
    smax = 1.01 * smax
    lower = np.maximum(smin * t, 1 - smax * (1 - t))
    upper = np.minimum(smax * t, 1 - smin * (1 - t))
    if symmetric:
        l = np.maximum(lower, 2 * t - upper)
        u = np.minimum(upper, 2 * t - lower)
        return l, u
    return lower, upper


def prepare_gdtw(x, y, *, symmetric: bool = True, M: int = 100, N: int = 100,
                 t=None, lambda_cum: float = 0.01, lambda_inst: float = 0.01,
                 eta: float = 1.0 / 8, max_iters: int = 3,
                 smin: float = 0.001, smax: float = 5.0,
                 metric=None) -> dict:
    """Build the GDTW workspace (reference ``prepare_gdtw``,
    src/gdtw.jl:159-231): interpolated signals, time grid, feasibility
    bounds, refinement state. Returned dict is consumed/updated by
    ``iterative_gdtw`` and read by ``gdtw_warpings``."""
    if not callable(x):
        x = LinearInterpolation(x)
    if not callable(y):
        y = LinearInterpolation(y)
    if metric is None:
        metric = lambda a, b: np.abs(a - b)
    if M <= 1:
        raise ValueError("M must be > 1")
    t = np.linspace(0.0, 1.0, N) if t is None else np.asarray(t, dtype=np.float64)
    l0, u0 = _initial_bounds(t, smin, smax, symmetric)
    return {
        "x": x, "y": y, "metric": metric, "t": t, "dt": np.diff(t),
        "symmetric": symmetric, "M": M,
        "lambda_cum": lambda_cum, "lambda_inst": lambda_inst,
        "eta": eta, "max_iters": max_iters, "smin": smin, "smax": smax,
        "l0": l0, "u0": u0, "l": l0.copy(), "u": u0.copy(),
        "warp": np.zeros(len(t)), "cost": _INF, "iters_done": 0,
    }


def iterative_gdtw(data: dict, max_iters: int | None = None) -> float:
    """Run refinement rounds on a prepared workspace (reference
    ``iterative_gdtw!``, src/gdtw.jl:255-295): each round solves the
    discretized shortest path on the current τ grid, then η-shrinks the
    bounds around the found warp. Callable repeatedly to refine further."""
    rounds = data["max_iters"] if max_iters is None else max_iters
    M = data["M"]
    j_frac = (np.arange(M) / (M - 1))[:, None]  # (M, 1)
    for _ in range(rounds):
        l, u = data["l"], data["u"]
        tau = l[None, :] + j_frac * (u[None, :] - l[None, :])  # (M, N)
        cost, warp = _single_gdtw(
            data["x"], data["y"], tau, data["t"], data["dt"],
            data["symmetric"], data["lambda_cum"], data["lambda_inst"],
            data["smin"], data["smax"], data["metric"])
        data["cost"], data["warp"] = cost, warp
        # η-shrink bounds around the found warp (src/gdtw.jl:30-37)
        delta = data["eta"] * (u - l) / 2
        data["l"] = np.maximum(warp - delta, data["l0"])
        data["u"] = np.minimum(warp + delta, data["u0"])
        data["iters_done"] += 1
    return float(data["cost"])


def gdtw_warpings(data: dict):
    """(phi, psi) LinearInterpolations from the current warp (reference
    ``gdtw_warpings``, src/gdtw.jl:304-313)."""
    t, warp = data["t"], data["warp"]
    phi = LinearInterpolation(warp, t)
    psi = (LinearInterpolation(2 * t - warp, t) if data["symmetric"]
           else LinearInterpolation(t, t))
    return phi, psi


def gdtw(x, y, **opts):
    """Returns ``(cost, phi, psi)`` where phi/psi are LinearInterpolations
    of the warp on the time grid (reference src/gdtw.jl:147-151) —
    prepare → iterate → warpings in one call.

    ``x``/``y`` may be arrays (wrapped in LinearInterpolation) or callables
    mapping s∈[0,1] → value (vectorized over NumPy arrays).
    """
    data = prepare_gdtw(x, y, **opts)
    cost = iterative_gdtw(data)
    phi, psi = gdtw_warpings(data)
    return cost, phi, psi


def _single_gdtw(x, y, tau, t, dt, symmetric, lam_cum, lam_inst,
                 smin, smax, metric):
    M, N = tau.shape
    # node weights on the whole grid (src/gdtw.jl:199-204)
    yval = 2 * t[None, :] - tau if symmetric else np.broadcast_to(t, tau.shape)
    node = metric(x(tau), y(yval)) + lam_cum * (tau - t[None, :]) ** 2
    node = node * np.concatenate((dt, [0.0]))[None, :]
    node[:, -1] = 0.0

    min_costs = node.copy()
    ptr = np.zeros((M, N), dtype=np.int64)
    for s in range(1, N):
        # edge weights k→j for the step s-1 → s (src/gdtw.jl:206-210)
        dphi = (tau[None, :, s] - tau[:, None, s - 1]) / dt[s - 1]  # (k, j)
        pen = (dphi - 1.0) ** 2
        ok = (dphi >= smin) & (dphi <= smax)
        if symmetric:
            ok &= (2 - dphi >= smin) & (2 - dphi <= smax)
        edge = np.where(ok, dt[s - 1] * lam_inst * pen, _INF)
        if s == 1:
            # reference special-cases t=2: only k=1 feeds it (src/gdtw.jl:333-336)
            tot = min_costs[0, 0] + edge[0, :]
            min_costs[:, 1] += tot
            ptr[:, 1] = 0
        else:
            cand = min_costs[:, s - 1][:, None] + edge  # (k, j)
            ptr[:, s] = np.argmin(cand, axis=0)
            min_costs[:, s] += cand[ptr[:, s], np.arange(M)]
    cost = min_costs[-1, -1]
    # trackback (src/gdtw.jl:352-364)
    warp = np.empty(N)
    c = M - 1
    for s in range(N - 1, 1, -1):
        warp[s] = tau[c, s]
        c = ptr[c, s]
    warp[1] = tau[c, 1]
    warp[0] = tau[0, 0]
    return cost, warp
