"""DBA / dbaclust / fastdtw / align / misc kernel tests — reference goldens."""

import numpy as np
import pytest

from dynamicaxiswarping_jl_spark.kernels import (
    dba, dbaclust, fastdtw, compress2, expandpath, computewindow,
    align_signals, fakedata_gaussian, linear_interp_fill,
    gaussian2, imfilter, dtw, SqEuclidean,
)

X = np.array([1.0, 2, 2, 3, 3, 4])
Y = np.array([1.0, 3, 4])
Z = np.array([1.0, 2, 2, 4])
GOLDEN_AVG = [1.0, 1.75, 2.75, 4.0]


class TestDBA:
    def test_golden_univariate(self):
        # runtests.jl:473-481: dba([x,y,z], DTW(5), init_center=z)
        avg, res = dba([X, Y, Z], SqEuclidean(), init_center=Z)
        np.testing.assert_allclose(avg, GOLDEN_AVG)
        assert res.converged

    def test_golden_multichannel(self):
        # runtests.jl:483-488: 3 identical channels → each row the golden avg
        seqs = [np.vstack([s, s, s]) for s in (X, Y, Z)]
        init = np.vstack([Z, Z, Z])
        avg, res = dba(seqs, SqEuclidean(), init_center=init)
        for row in avg:
            np.testing.assert_allclose(row, GOLDEN_AVG)

    def test_trace_and_iterations(self):
        avg, res = dba([X, Y, Z], SqEuclidean(), init_center=Z,
                       store_trace=True)
        assert res.iterations == len(res.cost_trace)
        assert res.iterations >= 1


class TestDBAClust:
    def test_recovers_planted_clusters(self):
        # runtests.jl:582-595: level-offset clusters randn(100) .+ 2(i÷5)
        rng = np.random.default_rng(3)
        seqs = [rng.normal(size=100) + 2 * (i // 5) for i in range(20)]
        res = dbaclust(seqs, 4, SqEuclidean(), n_init=10, iterations=10,
                       inner_iterations=5, seed=123)
        for g in range(4):
            members = res.clustids[g * 5:(g + 1) * 5]
            assert len(set(members.tolist())) == 1
        assert len(res.centers) == 4

    def test_reseed_fills_all_clusters(self):
        # runtests.jl:620-628: nclust=10 over 20 series → every id used
        rng = np.random.default_rng(4)
        seqs = [rng.normal(size=60) + 2 * (i // 5) for i in range(20)]
        res = dbaclust(seqs, 10, SqEuclidean(), n_init=5, iterations=10,
                       inner_iterations=3, seed=7)
        assert set(res.clustids.tolist()) == set(range(10))


class TestFastDTW:
    def test_compress2_goldens(self):
        # runtests.jl:340-351
        s = np.arange(0.0, 99.0, 2)  # 0:2:98
        np.testing.assert_allclose(compress2(s), np.arange(1.0, 98.0, 4))
        np.testing.assert_allclose(compress2(compress2(s)),
                                   np.concatenate((np.arange(3.0, 92.0, 8), [97.0])))
        np.testing.assert_allclose(compress2(np.array([1.0])), [1.0])

    def test_computewindow_golden(self):
        # runtests.jl:354-360: straight diagonal path, radius 1
        rmin, rmax = computewindow(np.arange(1, 9), np.arange(1, 9), 1)
        assert rmin.tolist() == [1, 1, 1, 2, 3, 4, 5, 6]
        assert rmax.tolist() == [3, 4, 5, 6, 7, 8, 8, 8]

    def test_computewindow_degenerate_radius(self):
        # radius >= path extent → full window (src/fastdtw.jl:143-146)
        rmin, rmax = computewindow(np.arange(1, 9), np.arange(1, 9), 10)
        assert rmin.tolist() == [1] * 8
        assert rmax.tolist() == [8] * 8

    def test_expandpath_roundtrip(self):
        cols, rows = expandpath(np.array([1, 2, 3, 4]), np.array([1, 2, 3, 4]), 8, 8)
        assert cols[0] == rows[0] == 1
        assert cols[-1] == rows[-1] == 8
        assert np.all(np.diff(cols) >= 0) and np.all(np.diff(rows) >= 0)

    def test_fastdtw_close_to_dtw_on_smooth_signal(self):
        # runtests.jl:452-471: 4-Gaussian-peak signal vs its downsample
        t = np.linspace(0, 1, 1600)
        x = sum(np.exp(-((t - c) ** 2) / 0.002) for c in (0.2, 0.4, 0.6, 0.8))
        y = x[::2]
        cost_f, _, _ = fastdtw(x, y, SqEuclidean(), 15)
        cost_e, _, _ = dtw(x, y, SqEuclidean())
        assert cost_f == pytest.approx(cost_e, rel=1e-6, abs=1e-9)


class TestAlignSignals:
    def test_shifted_copies_align(self):
        # runtests.jl:662-704 spirit: shifted copies of a bump align
        base = np.exp(-((np.linspace(-3, 3, 120)) ** 2))
        sigs = [np.roll(base, s) for s in (0, 5, -4)]
        aligned = align_signals(sigs, 0, output="signals")
        n = len(aligned[0])
        assert all(len(a) == n for a in aligned)
        for a in aligned[1:]:
            resid = np.linalg.norm(a - aligned[0])
            unaligned = np.linalg.norm(sigs[1][:n] - sigs[0][:n])
            assert resid <= unaligned + 1e-9


class TestMisc:
    def test_linear_interp_fill(self):
        v = np.array([np.nan, 1.0, np.nan, 3.0, np.nan])
        np.testing.assert_allclose(linear_interp_fill(v),
                                   [1.0, 1.0, 2.0, 3.0, 3.0])
        np.testing.assert_allclose(linear_interp_fill(v, fill_edges="zero"),
                                   [0.0, 1.0, 2.0, 3.0, 0.0])

    def test_imfilter_preserves_borders(self):
        rng = np.random.default_rng(5)
        A = rng.normal(size=(10, 12))
        out = imfilter(A, gaussian2(3))
        np.testing.assert_allclose(out[0, :], A[0, :])
        np.testing.assert_allclose(out[:, -1], A[:, -1])
        assert not np.allclose(out[1:-1, 1:-1], A[1:-1, 1:-1])

    def test_postprocess_smoothing(self):
        # README.md:216-225 spirit: filtered cost matrix changes the path
        rng = np.random.default_rng(9)
        a = rng.normal(size=30)
        b = rng.normal(size=30)
        c1, _, _ = dtw(a, b)
        c2, _, _ = dtw(a, b, postprocess=lambda D: imfilter(D, gaussian2(3)))
        assert np.isfinite(c2)
