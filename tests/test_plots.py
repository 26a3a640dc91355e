"""Plot-recipe surface (reference src/plots.jl:40-253) — data semantics
tested headless; rendering smoke-tested through the ASCII fallback (the
container has no matplotlib; the mpl branch is import-guarded)."""

import numpy as np
import pytest

from dynamicaxiswarping_jl_spark.plots import (
    dtwplot, matchplot, matchplot2, dtwplot_data, matchplot_data,
    matchplot2_data, searchresult_data,
)
from dynamicaxiswarping_jl_spark.kernels import dtw, dtwnn

# the B1 golden pair (runtests.jl:83-101 shapes)
A = np.array([1, 1, 1, 2, 4, 6, 5, 5, 5, 4, 4, 3, 1, 1, 1], dtype=float)
B = np.array([1, 1, 2, 4, 6, 6, 6, 5, 4, 4, 4, 3, 3, 3, 1], dtype=float)


class TestDtwPlot:
    def test_data_matches_dtw(self):
        d = dtwplot_data(A, B)
        cost, i1, i2 = dtw(A, B)
        assert d.D.shape == (len(B), len(A))
        assert d.D[-1, -1] == pytest.approx(cost)
        np.testing.assert_array_equal(d.i1, i1)
        np.testing.assert_array_equal(d.i2, i2)
        assert d.clims == (0.0, pytest.approx(3 * cost))

    def test_precomputed_path_skips_recompute(self):
        cost, i1, i2 = dtw(A, B)
        d = dtwplot_data(A, B, i1=i1, i2=i2)
        np.testing.assert_array_equal(d.i1, i1)

    def test_diagonal_band(self):
        d = dtwplot_data(A, B[:-2], diagonal=True)
        assert d.diagonal is not None
        assert d.diagonal.shape == (len(A), 2)

    def test_ascii_smoke(self):
        out = dtwplot(A, B)  # no matplotlib here → ascii fallback
        assert isinstance(out, str)
        assert "o" in out  # warp path overlay
        assert len(out.splitlines()) >= 10


class TestMatchPlot:
    def test_data_znorm_and_segments(self):
        d = matchplot_data(A, B, separation=2.0)
        # ddof=1 znorm, ±separation (src/plots.jl:142-148)
        assert d.s1.mean() == pytest.approx(-2.0)
        assert d.s2.mean() == pytest.approx(2.0)
        assert np.std(d.s1, ddof=1) == pytest.approx(1.0)
        _, i1, i2 = dtw(A, B)
        assert len(d.segments) == len(i1)
        (x0, y0), (x1, y1) = d.segments[0]
        assert (x0, x1) == (int(i1[0]), int(i2[0]))

    def test_ds_downsamples_segments(self):
        d1 = matchplot_data(A, B, ds=1)
        d3 = matchplot_data(A, B, ds=3)
        assert len(d3.segments) == (len(d1.segments) + 2) // 3

    def test_ascii_smoke(self):
        out = matchplot(A, B)
        assert isinstance(out, str) and len(out.splitlines()) >= 8


class TestMatchPlot2:
    def test_multichannel_warp(self):
        rng = np.random.default_rng(0)
        X = rng.normal(size=(2, 20))
        Y = rng.normal(size=(2, 24))
        d = matchplot2_data(X, Y, separation=0.5)
        # both signals warped onto the common path length
        assert d.s1.shape[1] == d.s2.shape[1] == len(d.segments)
        assert d.s1.shape[0] == 2

    def test_showindex_appends_row(self):
        X = np.vstack([A, A])
        d = matchplot2_data(X, X, showindex=True)
        assert d.s1.shape[0] == 3  # 2 channels + index row


class TestSearchResultRecipe:
    def test_profile_and_loc(self):
        q = A[3:9]
        res = dtwnn(q, B, None, 2, saveall=True)
        d = searchresult_data(res)
        assert d["loc"] == res.loc
        assert len(d["dists"]) == len(B) - len(q) + 1
