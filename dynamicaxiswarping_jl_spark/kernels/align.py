"""Signal alignment to a master series.

Reference: src/utils.jl:46-80 (``align_signals``). DTW method: per-series
delay = round(median(i2 - i1)) from dtw(s_i, master); a common trimmed
window is derived from the max left/right paddings, and per-series index
ranges (or the trimmed signals) are returned. This is the engine's
turn-alignment operator for cross-conversation comparison.
"""

from __future__ import annotations

import numpy as np

from .dtw import dtw

__all__ = ["align_signals"]


def _finddelay(x: np.ndarray, y: np.ndarray) -> int:
    """Delay of ``y`` relative to ``x`` via cross-correlation argmax —
    the reference's ``DSP.finddelay`` (src/utils.jl:51-52), which it
    notes is "suboptimal because xcorr does not do exactly what we
    want" — kept for parity as the cheap method."""
    c = np.correlate(x, y, mode="full")
    return int(np.argmax(c)) - (len(y) - 1)


def align_signals(signals, master: int = None, output: str = "indices",
                  dist=None, postprocess=None, method: str = "dtw"):
    """Returns per-signal 0-based ``(start, stop)`` exclusive ranges (or the
    trimmed signals with ``output='signals'``), all of equal length, such
    that each slice is optimally aligned to the master.

    ``method='dtw'`` derives each delay from the warping path median
    (src/utils.jl:53-55); ``method='xcorr'`` uses cross-correlation
    (src/utils.jl:51-52). Indices are returned 0-based (Python
    convention; the reference returns 1-based ranges — the slices
    themselves are identical).
    """
    sigs = [np.asarray(s, dtype=np.float64) for s in signals]
    lens = np.array([s.shape[-1] for s in sigs])
    if master is None:
        master = int(lens.argmax())
    d = []
    for i, s in enumerate(sigs):
        if i == master:
            d.append(0)
            continue
        if method in ("xcorr", "crosscorr", "dsp"):
            if s.ndim != 1 or sigs[master].ndim != 1:
                raise ValueError(
                    "method='xcorr' supports 1-D signals only; use "
                    "method='dtw' for multichannel alignment")
            d.append(_finddelay(sigs[master], s))
        elif method in ("dtw", "DTW"):
            _, i1, i2 = dtw(s, sigs[master], dist, postprocess=postprocess)
            d.append(int(np.round(np.median(i2 - i1))))
        else:
            raise ValueError(f"unknown method {method!r}")
    d = np.array(d)
    lp = int(d.max())
    rp = int((lens[master] - (lens + d)).max())
    wl = int(lens[master]) - lp - rp
    ranges = []
    for i in range(len(sigs)):
        start = max(1, 1 + lp - d[i])           # 1-based like the reference
        stop = min(int(lens[i]), start + wl - 1)  # inclusive
        ranges.append((start - 1, stop))          # → 0-based half-open
    n0 = ranges[0][1] - ranges[0][0]
    assert all(b - a == n0 for a, b in ranges)
    if output == "indices":
        return ranges
    return [s[..., a:b] for s, (a, b) in zip(sigs, ranges)]
