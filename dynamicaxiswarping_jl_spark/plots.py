"""Plot recipes mirroring the reference's plotting surface
(src/plots.jl:40-253: ``dtwplot``, ``matchplot``, ``matchplot2``, and the
``DTWSearchResult`` recipe).

Split the same way the reference splits recipe-from-renderer: the
``*_data`` functions compute everything a plot needs (cost matrix, warp
path, znormed overlay series, match segments) as plain NumPy — usable
from any frontend and fully testable headless. The ``dtwplot``/
``matchplot``/``matchplot2`` entry points render with matplotlib when it
is importable (``backend='mpl'``), fall back to a compact ASCII rendering
(``backend='ascii'``), and ``backend='data'`` returns the data object.

Note on normalization: the reference's matchplot znorm uses Julia's
``Statistics.std`` (ddof=1), unlike the engine's ZNormalizer (ddof=0,
SURVEY §1.3) — both are preserved faithfully in their own contexts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .kernels import dtw_cost_matrix, banded_dtw_cost_matrix, trackback, radiuslimits

__all__ = ["dtwplot", "matchplot", "matchplot2", "dtwplot_data",
           "matchplot_data", "matchplot2_data", "searchresult_data"]


def _handleargs(seq1, seq2, dist=None, D=None, i1=None, i2=None,
                i2min=None, i2max=None, transportcost: float = 1.0,
                postprocess=None):
    """Reference handleargs (src/plots.jl:17-36): compute whatever of
    (D, i1, i2) was not supplied."""
    seq1 = np.asarray(seq1, dtype=np.float64)
    seq2 = np.asarray(seq2, dtype=np.float64)
    if D is None:
        if i2min is not None or i2max is not None:
            D = banded_dtw_cost_matrix(seq1, seq2, dist, i2min, i2max,
                                       transportcost=transportcost)
        else:
            D = dtw_cost_matrix(seq1, seq2, dist,
                                transportcost=transportcost,
                                postprocess=postprocess)
    if i1 is None or i2 is None:
        _, i1, i2 = trackback(D)
    return seq1, seq2, np.asarray(D), np.asarray(i1), np.asarray(i2)


@dataclass
class DTWPlotData:
    """Everything dtwplot draws: the heatmap matrix, the warp path in
    matrix coordinates, the two marginal series, optional diagonal band."""
    seq1: np.ndarray
    seq2: np.ndarray
    D: np.ndarray
    i1: np.ndarray
    i2: np.ndarray
    clims: tuple = (0.0, 0.0)
    diagonal: np.ndarray | None = None  # (n, 2) [imin imax] or (n,) 1:n

    def ascii(self, width: int = 60, height: int = 24) -> str:
        """Downsampled character heatmap with the warp path overlaid."""
        m, n = self.D.shape
        h, w = min(height, m), min(width, n)
        ri = (np.arange(h) * m) // h
        ci = (np.arange(w) * n) // w
        sub = self.D[np.ix_(ri, ci)]
        finite = np.isfinite(sub)
        lo = sub[finite].min() if finite.any() else 0.0
        hi = max(self.clims[1], lo + 1e-12)
        shades = " .:-=+*#%@"
        idx = np.clip(((sub - lo) / (hi - lo) * (len(shades) - 1)), 0,
                      len(shades) - 1)
        grid = np.full((h, w), "?", dtype="<U1")
        grid[finite] = np.array(list(shades))[idx[finite].astype(int)]
        grid[~finite] = " "
        # overlay path: i1 indexes seq1 (cols), i2 indexes seq2 (rows)
        pr = np.clip((self.i2 - 1) * h // m, 0, h - 1)
        pc = np.clip((self.i1 - 1) * w // n, 0, w - 1)
        grid[pr, pc] = "o"
        return "\n".join("".join(row) for row in grid[::-1])


def dtwplot_data(seq1, seq2, dist=None, D=None, i1=None, i2=None,
                 i2min=None, i2max=None, transportcost: float = 1.0,
                 diagonal: bool = False, postprocess=None) -> DTWPlotData:
    seq1, seq2, D, i1, i2 = _handleargs(
        seq1, seq2, dist, D, i1, i2, i2min, i2max, transportcost,
        postprocess)
    n1, n2 = seq1.shape[-1], seq2.shape[-1]
    diag = None
    if diagonal:
        d = abs(n1 - n2)
        if d == 0:
            diag = np.arange(1, n1 + 1)
        else:
            imi, ima = radiuslimits(d, n1, n2)
            diag = np.stack([imi, ima], axis=1)
    # reference clims: (0, 3 * D[end, end]) (src/plots.jl:74)
    return DTWPlotData(seq1, seq2, D, i1, i2,
                       clims=(0.0, 3.0 * float(D[-1, -1])), diagonal=diag)


def _znorm1(x: np.ndarray) -> np.ndarray:
    x = x - x.mean()
    sd = x.std(ddof=1) if len(x) > 1 else 1.0
    return x / (sd if sd else 1.0)


@dataclass
class MatchPlotData:
    """matchplot: both series znormed and vertically separated, plus the
    match segments ((x0, y0), (x1, y1)) for every ds-th path step."""
    s1: np.ndarray
    s2: np.ndarray
    i1: np.ndarray
    i2: np.ndarray
    segments: list = field(default_factory=list)

    def ascii(self, width: int = 70, height: int = 16) -> str:
        n = max(len(self.s1), len(self.s2))
        xs = np.arange(n)
        lo = min(self.s1.min(), self.s2.min())
        hi = max(self.s1.max(), self.s2.max())
        grid = np.full((height, width), " ", dtype="<U1")

        def put(series, ch):
            c = np.clip(np.arange(len(series)) * width // n, 0, width - 1)
            r = np.clip(((series - lo) / (hi - lo + 1e-12)
                         * (height - 1)).astype(int), 0, height - 1)
            grid[r, c] = ch
        put(self.s1, "-")
        put(self.s2, "=")
        return "\n".join("".join(row) for row in grid[::-1])


def matchplot_data(x, y, dist=None, D=None, i1=None, i2=None,
                   transportcost: float = 1.0, separation: float = 2.0,
                   ds: int = 1, postprocess=None) -> MatchPlotData:
    x, y, D, i1, i2 = _handleargs(x, y, dist, D, i1, i2, None, None,
                                  transportcost, postprocess)
    s1 = _znorm1(x) - separation
    s2 = _znorm1(y) + separation
    segs = [((int(i1[k]), float(s1[i1[k] - 1])),
             (int(i2[k]), float(s2[i2[k] - 1])))
            for k in range(0, len(i1), ds)]
    return MatchPlotData(s1, s2, i1, i2, segs)


@dataclass
class MatchPlot2Data:
    """matchplot2: multichannel (channels × time) variant — both signals
    warped onto the common path, znormed per channel, separated in value
    space; segments connect warped sample k of s1 to sample k of s2."""
    s1: np.ndarray  # (c[, +1 index row], path_len)
    s2: np.ndarray
    segments: list = field(default_factory=list)

    def ascii(self, width: int = 70, height: int = 16) -> str:
        """Channel-0 overlay of both warped signals (same grid renderer
        as MatchPlotData — the multichannel geometry needs a real 2-D
        backend, so ASCII shows the leading channel)."""
        return MatchPlotData(self.s1[0], self.s2[0],
                             np.zeros(0), np.zeros(0)).ascii(width, height)


def matchplot2_data(x, y, dist=None, D=None, i1=None, i2=None,
                    transportcost: float = 1.0, separation: float = 0.5,
                    ds: int = 1, showindex: bool = False,
                    normalize: bool = True, postprocess=None) -> MatchPlot2Data:
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    y = np.atleast_2d(np.asarray(y, dtype=np.float64))
    _, _, D, i1, i2 = _handleargs(x, y, dist, D, i1, i2, None, None,
                                  transportcost, postprocess)
    if normalize:
        x = (x - x.mean(axis=1, keepdims=True)) / x.std(axis=1, ddof=1,
                                                        keepdims=True)
        y = (y - y.mean(axis=1, keepdims=True)) / y.std(axis=1, ddof=1,
                                                        keepdims=True)
    xw, yw = x[:, i1 - 1], y[:, i2 - 1]
    if showindex:
        xw = np.vstack([xw, i1[None, :]])
        yw = np.vstack([yw, i2[None, :]])
    s1 = xw - separation
    s2 = yw + separation
    segs = [(s1[:, k].tolist(), s2[:, k].tolist())
            for k in range(0, s1.shape[1], ds)]
    return MatchPlot2Data(s1, s2, segs)


def searchresult_data(result) -> dict:
    """DTWSearchResult recipe (src/plots.jl:224-253): the distance profile
    plus the argmin marker."""
    dists = np.asarray(result.dists, dtype=np.float64)
    return {"dists": dists, "loc": int(result.loc),
            "cost": float(result.cost),
            "title": "DTW-NN Search result"}


def _mpl():
    try:
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
        return plt
    except ImportError:
        return None


def dtwplot(seq1, seq2, dist=None, backend: str = "auto", **kw):
    """Reference dtwplot: cost-matrix heatmap + warp path + marginal
    series (src/plots.jl:40-135). backend: 'mpl' | 'ascii' | 'data' |
    'auto' (mpl if importable, else ascii)."""
    data = dtwplot_data(seq1, seq2, dist, **kw)
    plt = _mpl() if backend in ("auto", "mpl") else None
    if backend == "mpl" and plt is None:
        raise ImportError("matplotlib is required for backend='mpl'")
    if backend == "data":
        return data
    if plt is None:
        return data.ascii()
    fig = plt.figure(figsize=(7, 7))
    gs = fig.add_gridspec(2, 2, width_ratios=[1, 4], height_ratios=[4, 1])
    ax_l = fig.add_subplot(gs[0, 0])
    ax_m = fig.add_subplot(gs[0, 1])
    ax_b = fig.add_subplot(gs[1, 1])
    ax_m.imshow(data.D, origin="lower", aspect="auto",
                vmin=data.clims[0], vmax=data.clims[1])
    ax_m.plot(data.i1 - 1, data.i2 - 1, linewidth=3)
    if data.diagonal is not None:
        dg = np.atleast_2d(data.diagonal.T)
        for row in dg:
            ax_m.plot(np.arange(len(row)), row - 1)
    ax_l.plot(data.seq2, np.arange(len(data.seq2)))
    ax_b.plot(np.arange(len(data.seq1)), data.seq1)
    for ax in (ax_l, ax_m, ax_b):
        ax.set_xticks([]), ax.set_yticks([])
    return fig


def matchplot(x, y, dist=None, backend: str = "auto", **kw):
    """Reference matchplot: znormed series offset by ±separation with
    match segments (src/plots.jl:140-163)."""
    data = matchplot_data(x, y, dist, **kw)
    plt = _mpl() if backend in ("auto", "mpl") else None
    if backend == "mpl" and plt is None:
        raise ImportError("matplotlib is required for backend='mpl'")
    if backend == "data":
        return data
    if plt is None:
        return data.ascii()
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(np.arange(1, len(data.s1) + 1), data.s1)
    ax.plot(np.arange(1, len(data.s2) + 1), data.s2)
    for (x0, y0), (x1, y1) in data.segments:
        ax.plot([x0, x1], [y0, y1], color="black", alpha=0.2)
    return fig


def matchplot2(x, y, dist=None, backend: str = "auto", **kw):
    """Reference matchplot2: multichannel matchplot (src/plots.jl:165-222)."""
    data = matchplot2_data(x, y, dist, **kw)
    plt = _mpl() if backend in ("auto", "mpl") else None
    if backend == "mpl" and plt is None:
        raise ImportError("matplotlib is required for backend='mpl'")
    if backend == "data":
        return data
    if plt is None:
        return data.ascii()
    fig, ax = plt.subplots(figsize=(8, 5))
    if data.s1.shape[0] >= 2:
        ax.plot(data.s1[0], data.s1[1])
        ax.plot(data.s2[0], data.s2[1])
        for a, b in data.segments:
            ax.plot([a[0], b[0]], [a[1], b[1]], color="black", alpha=0.2)
    return fig
