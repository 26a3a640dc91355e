"""dtwnn / sparse_distmat / matrix_profile parity tests.

Oracle pattern copied from the reference (runtests.jl:491-659 and
test_matrixprofile.jl:5-16): the optimized pruned search must equal a
brute-force map of dtw_cost over every window, with and without
normalization and pruning flags.
"""

import numpy as np
import pytest

from dynamicaxiswarping_jl_spark.kernels import (
    dtwnn, dtw_cost, sparse_distmat, distance_profile, matrix_profile,
    znorm, SqEuclidean, lower_upper_envs,
)


def brute_force(q, y, rad, normalizer=None):
    """Reference-style naive NN: dtw_cost on every window."""
    qn = znorm(q) if normalizer else np.asarray(q, float)
    m = len(q)
    nw = len(y) - m + 1
    dists = np.empty(nw)
    for i in range(nw):
        w = np.asarray(y[i:i + m], float)
        if normalizer:
            w = znorm(w)
        dists[i] = dtw_cost(qn, w, SqEuclidean(), rad)
    loc = int(dists.argmin())
    return dists[loc], loc + 1, dists


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(42)
    y = np.sin(np.linspace(0, 20 * np.pi, 600)) + 0.1 * rng.normal(size=600)
    q = y[137:137 + 40].copy() + 0.01 * rng.normal(size=40)
    return q, y


class TestDtwnnParity:
    def test_self_distance_zero(self, data):
        # runtests.jl:51-58: query found in itself with ~0 cost
        _, y = data
        q = y[:50]
        for norm in (None, "znorm"):
            res = dtwnn(q, y, SqEuclidean(), 3, norm)
            assert res.cost < 1e-18
            assert res.loc == 1

    @pytest.mark.parametrize("norm", [None, "znorm"])
    @pytest.mark.parametrize("rad", [0, 3, 7])
    def test_matches_brute_force(self, data, norm, rad):
        # runtests.jl:491-541
        q, y = data
        res = dtwnn(q, y, SqEuclidean(), rad, norm)
        bcost, bloc, _ = brute_force(q, y, rad, norm)
        assert res.cost == pytest.approx(bcost, rel=1e-9)
        assert res.loc == bloc

    @pytest.mark.parametrize("pe,pv", [(True, True), (True, False),
                                       (False, True), (False, False)])
    def test_pruning_flags_do_not_change_result(self, data, pe, pv):
        # runtests.jl:543-559
        q, y = data
        ref = dtwnn(q, y, SqEuclidean(), 5, prune_endpoints=False,
                    prune_envelope=False)
        res = dtwnn(q, y, SqEuclidean(), 5, prune_endpoints=pe,
                    prune_envelope=pv)
        assert res.cost == pytest.approx(ref.cost, rel=1e-9)
        assert res.loc == ref.loc

    def test_prune_counters_positive_on_sine(self, data):
        # runtests.jl:543-559: pruning engages on sine data
        q, y = data
        res = dtwnn(q, y, SqEuclidean(), 5)
        assert res.prune_end + res.prune_env > 0

    def test_saveall_profile_matches_brute_force(self, data):
        q, y = data
        res = dtwnn(q, y, SqEuclidean(), 4, saveall=True)
        _, _, bdists = brute_force(q, y, 4)
        np.testing.assert_allclose(res.dists, bdists, rtol=1e-9)

    def test_znorm_window_semantics(self):
        # runtests.jl:523-531: windows have mean≈0, uncorrected std≈1
        rng = np.random.default_rng(7)
        w = znorm(rng.normal(2.0, 3.0, size=100))
        assert abs(w.mean()) < 1e-12
        assert abs(w.std(ddof=0) - 1) < 1e-12

    def test_avoid_region_excluded(self, data):
        q, y = data
        res_all = dtwnn(q, y, SqEuclidean(), 5)
        res = dtwnn(q, y, SqEuclidean(), 5,
                    avoid=(res_all.loc - 5, res_all.loc + 5))
        assert not (res_all.loc - 5 <= res.loc <= res_all.loc + 5)

    def test_bsf_multiplier_keeps_result(self, data):
        q, y = data
        r1 = dtwnn(q, y, SqEuclidean(), 5)
        r2 = dtwnn(q, y, SqEuclidean(), 5, bsf_multiplier=1.5)
        assert r2.cost == pytest.approx(r1.cost, rel=1e-9)
        assert r2.loc == r1.loc
        # looser pruning prunes fewer windows
        assert r2.prune_end + r2.prune_env <= r1.prune_end + r1.prune_env

    def test_envelopes(self):
        q = np.array([0.0, 1, 2, 1, 0, -1, 0])
        l, u = lower_upper_envs(q, 1)
        assert u.tolist() == [1, 2, 2, 2, 1, 0, 0]
        assert l.tolist() == [0, 0, 1, 0, -1, -1, -1]


class TestSparseDistmat:
    def test_matches_dense_topk(self):
        # runtests.jl:633-644
        rng = np.random.default_rng(11)
        N, L, k, rad = 12, 30, 4, 5
        ys = [np.cumsum(rng.normal(size=L)) for _ in range(N)]
        DISTS, INDS = sparse_distmat(ys, k, SqEuclidean(), rad)
        # dense pairwise oracle
        D = np.full((N, N), np.inf)
        for i in range(N):
            for j in range(N):
                if i != j:
                    D[i, j] = dtw_cost(ys[i], ys[j], SqEuclidean(), rad)
        for i in range(N):
            order = np.argsort(D[i])[:k]
            np.testing.assert_allclose(DISTS[i], D[i][order], rtol=1e-9)
            assert set(INDS[i]) == set(order + 1)


class TestProfiles:
    def test_distance_profile_matches_direct(self):
        # runtests.jl:651-659
        rng = np.random.default_rng(13)
        T = np.cumsum(rng.normal(size=120))
        Q = T[30:50].copy()
        prof = distance_profile(Q, T, SqEuclidean(), 4)
        assert len(prof) == len(T) - len(Q) + 1
        for i in (0, 17, 30, 77):
            direct = dtw_cost(Q, T[i:i + len(Q)], SqEuclidean(), 4)
            assert prof[i] == pytest.approx(direct, rel=1e-9)
        assert prof[30] < 1e-18

    def test_matrix_profile_matches_dense(self):
        # test_matrixprofile.jl:5-16
        rng = np.random.default_rng(17)
        T = np.cumsum(rng.normal(size=60))
        m, rad = 10, 3
        P, I = matrix_profile(T, m, rad, SqEuclidean())
        l = len(T) - m + 1
        D = np.full((l, l), np.inf)
        for i in range(l):
            for j in range(l):
                if abs(i - j) > rad:
                    D[i, j] = dtw_cost(T[i:i + m], T[j:j + m],
                                       SqEuclidean(), rad)
        for i in range(l):
            assert P[i] == pytest.approx(D[i].min(), rel=1e-9)
            assert I[i] == D[i].argmin() + 1


class TestDtwDistDispatch:
    def test_symmetric_swap_equality(self):
        # runtests.jl:509-510: DTW(radius=7)(a,b) == DTW(radius=7)(b,a)
        from dynamicaxiswarping_jl_spark.kernels import dtw_dist
        rng = np.random.default_rng(5)
        a = np.cumsum(rng.normal(size=40))
        b = np.cumsum(rng.normal(size=55))
        assert dtw_dist(a, b, radius=7) == pytest.approx(
            dtw_dist(b, a, radius=7), rel=1e-12)

    def test_equal_lengths_uses_dtw_cost(self):
        from dynamicaxiswarping_jl_spark.kernels import dtw_dist
        rng = np.random.default_rng(6)
        a = rng.normal(size=30)
        b = rng.normal(size=30)
        assert dtw_dist(a, b, radius=4) == pytest.approx(
            dtw_cost(a, b, SqEuclidean(), 4), rel=1e-12)

    def test_norm_normalizer(self):
        from dynamicaxiswarping_jl_spark.kernels import dtw_dist
        a = np.array([1.0, 2.0, 3.0])
        assert dtw_dist(a, 5 * a, radius=3, normalizer="norm") == pytest.approx(0.0, abs=1e-18)


class TestExtraNormalizers:
    def test_diagonal_znorm_per_channel(self):
        import numpy as np
        from dynamicaxiswarping_jl_spark.kernels import diagonal_znorm
        rng = np.random.default_rng(2)
        x = rng.normal(loc=[[5.0], [-3.0]], scale=[[2.0], [0.5]],
                       size=(2, 400))
        z = diagonal_znorm(x)
        np.testing.assert_allclose(z.mean(axis=-1), 0.0, atol=1e-12)
        np.testing.assert_allclose(z.std(axis=-1, ddof=0), 1.0, rtol=1e-12)
        # constant channel maps to zeros
        z2 = diagonal_znorm(np.vstack([np.full(10, 7.0), np.arange(10.0)]))
        assert (z2[0] == 0).all() and abs(z2[1].mean()) < 1e-12

    def test_norm_normalize_unit_norm(self):
        import numpy as np
        from dynamicaxiswarping_jl_spark.kernels import norm_normalize
        x = np.array([3.0, 4.0])
        np.testing.assert_allclose(np.linalg.norm(norm_normalize(x)), 1.0)
        assert (norm_normalize(np.zeros(5)) == 0).all()


class TestInitialBsfSeed:
    def test_seed_does_not_change_result_when_loose(self):
        import numpy as np
        from dynamicaxiswarping_jl_spark.kernels import dtwnn
        rng = np.random.default_rng(11)
        y = np.cumsum(rng.normal(size=4000))
        q = y[1500:1560].copy() + 0.01 * rng.normal(size=60)
        cold = dtwnn(q, y, "sqeuclidean", 5)
        seeded = dtwnn(q, y, "sqeuclidean", 5, initial_bsf=cold.cost * 10)
        assert seeded.cost == cold.cost and seeded.loc == cold.loc

    def test_tight_seed_prunes_everything_to_inf(self):
        import numpy as np
        from dynamicaxiswarping_jl_spark.kernels import dtwnn
        rng = np.random.default_rng(12)
        y = np.cumsum(rng.normal(size=2000)) + 100.0
        q = np.zeros(50)  # far from every window → large true cost
        res = dtwnn(q, y, "sqeuclidean", 5, initial_bsf=1e-12)
        assert np.isinf(res.cost)  # caller keeps its prior best

    def test_seed_between_best_and_second_keeps_best(self):
        """A seed tighter than every window except the true best must
        still find the true best (the best window is never prunable
        below its own cost)."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.kernels import dtwnn
        rng = np.random.default_rng(13)
        y = np.cumsum(rng.normal(size=3000))
        q = y[800:860].copy()  # exact match → best cost 0
        prof = dtwnn(q, y, "sqeuclidean", 5, saveall=True).dists
        second = np.partition(prof, 1)[1]
        res = dtwnn(q, y, "sqeuclidean", 5, initial_bsf=second * 0.5)
        assert res.cost == 0.0 and res.loc == 801


try:
    from hypothesis import given, settings, strategies as st
    HAVE_HYP = True
except ImportError:
    HAVE_HYP = False

if HAVE_HYP:
    import numpy as _np
    from dynamicaxiswarping_jl_spark.kernels import (
        dtw_cost as _dtw_cost, dtw_cost_batch as _dtw_cost_batch,
        dtwnn as _dtwnn)

    class TestKernelProperties:
        @settings(max_examples=40, deadline=None)
        @given(st.integers(0, 2**32 - 1), st.integers(8, 60),
               st.integers(0, 8))
        def test_batch_dp_equals_scalar_dp(self, seed, m, r):
            """dtw_cost_batch over k rows == per-pair dtw_cost for random
            shapes and radii (incl. r=0 pointwise degenerate case)."""
            rng = _np.random.default_rng(seed)
            k = int(rng.integers(1, 6))
            q = rng.normal(size=m)
            W = rng.normal(size=(k, m))
            batch = _dtw_cost_batch(q, W, r)
            for i in range(k):
                assert batch[i] == pytest.approx(
                    _dtw_cost(q, W[i], "sqeuclidean", r), rel=1e-12)

        @settings(max_examples=25, deadline=None)
        @given(st.integers(0, 2**32 - 1), st.integers(30, 200),
               st.integers(5, 20), st.integers(0, 6),
               st.booleans(), st.booleans())
        def test_dtwnn_equals_bruteforce(self, seed, n, m, r, pe, pv):
            """Pruned search == brute-force window scan for random series,
            window lengths, radii, and prune-flag combinations."""
            rng = _np.random.default_rng(seed)
            y = _np.cumsum(rng.normal(size=n))
            q = rng.normal(size=min(m, n - 1))
            res = _dtwnn(q, y, "sqeuclidean", r,
                         prune_endpoints=pe, prune_envelope=pv)
            mm = len(q)
            brute = _np.array([
                _dtw_cost(q, y[i:i + mm], "sqeuclidean", r)
                for i in range(n - mm + 1)])
            assert res.cost == pytest.approx(brute.min(), rel=1e-10)
            assert res.loc == int(brute.argmin()) + 1


class TestFallbackSeedContract:
    def test_multichannel_seeded_below_all_returns_inf(self):
        """Fallback (multichannel) path: a seed tighter than every window
        must yield Inf — an early-abandoned partial DP sum (a lower
        bound, not a window's true cost) must never be reported."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.kernels import dtwnn
        rng = np.random.default_rng(21)
        y = rng.normal(size=(2, 300)) + 50.0
        q = np.zeros((2, 40))
        res = dtwnn(q, y, "sqeuclidean", 5, initial_bsf=1e-9)
        assert np.isinf(res.cost)

    def test_multichannel_loose_seed_matches_cold(self):
        import numpy as np
        from dynamicaxiswarping_jl_spark.kernels import dtwnn
        rng = np.random.default_rng(22)
        y = rng.normal(size=(2, 200))
        q = y[:, 60:100].copy()
        cold = dtwnn(q, y, "sqeuclidean", 5)
        seeded = dtwnn(q, y, "sqeuclidean", 5,
                       initial_bsf=cold.cost + 100.0)
        assert seeded.cost == cold.cost and seeded.loc == cold.loc


class TestNativeCascadeParity:
    """nn_search_sq (the whole-cascade C fast path) must return cost/loc
    identical to the Python batched cascade backed by the same native
    dtw_cost_batch — across metrics of series shape, radius, znorm, bsf
    seeding, avoid ranges, and both dtypes."""

    def _py_dtwnn(self, *a, **kw):
        from dynamicaxiswarping_jl_spark.kernels import native
        real = native.nn_search
        native.nn_search = lambda *aa, **kk: None  # force the batched path
        try:
            return dtwnn(*a, **kw)
        finally:
            native.nn_search = real

    def test_cost_loc_parity_fuzz(self):
        from dynamicaxiswarping_jl_spark.kernels import native
        if not native.available():
            pytest.skip("no C compiler")
        rng = np.random.default_rng(42)
        for trial in range(40):
            m = int(rng.integers(8, 40))
            n = int(rng.integers(m + 1, 600))
            kind = trial % 3
            if kind == 0:
                y = rng.normal(size=n)
                q = rng.normal(size=m)
            elif kind == 1:  # integer grid: exact fp ties everywhere
                y = rng.integers(0, 3, size=n).astype(float)
                q = rng.integers(0, 3, size=m).astype(float)
            else:  # zero-heavy event-rate shape
                y = np.zeros(n)
                y[rng.integers(0, n, size=5)] = rng.normal(size=5)
                q = np.zeros(m)
            rad = int(rng.integers(0, 8))
            norm = "znorm" if (trial % 4 == 0 and kind == 0) else None
            bsf = float(rng.choice([np.inf, 0.5, 0.0, 3.0]))
            avoid = None
            if trial % 5 == 0:
                lo = int(rng.integers(1, max(2, n - m)))
                avoid = (lo, lo + int(rng.integers(0, 10)))
            for dt in (np.float64, np.float32):
                r1 = dtwnn(q, y, "sqeuclidean", rad, norm, initial_bsf=bsf,
                           avoid=avoid, dtype=dt)
                r2 = self._py_dtwnn(q, y, "sqeuclidean", rad, norm,
                                    initial_bsf=bsf, avoid=avoid, dtype=dt)
                assert r1.cost == r2.cost and r1.loc == r2.loc, (
                    trial, dt, m, n, rad, norm, bsf, avoid,
                    (r1.cost, r1.loc), (r2.cost, r2.loc))


class TestShortQuerySoundness:
    """Regression: the reference's endpoint LB (src/dtwnn.jl:99-119) is NOT
    a lower bound for m == 1 (the two-term sum double-counts the single
    shared cell) or m == 3 (both refinement terms can bound the diagonal
    path's one interior cell). Until fixed, the C cascade pruned TRUE
    nearest neighbors for length-1/3 queries — results depended on whether
    a compiler was present. The engine now uses the single exact term at
    m == 1 and applies refinements only for m >= 4, in lb_endpoints,
    _lb_endpoints_all, nn_search_sq (C), and the naive oracle alike."""

    @pytest.mark.parametrize("m", [1, 2, 3, 4])
    def test_dtwnn_matches_brute_force_short_m(self, m):
        rng = np.random.default_rng(2)
        for trial in range(300):
            q = rng.normal(size=m)
            y = rng.normal(size=m + int(rng.integers(3, 20)))
            rad = int(rng.integers(0, 4))
            res = dtwnn(q, y, SqEuclidean(), rad)
            bcost, bloc, _ = brute_force(q, y, rad)
            assert res.cost == pytest.approx(bcost, rel=1e-12), (m, trial)
            assert res.loc == bloc, (m, trial)

    @pytest.mark.parametrize("m", [1, 2, 3, 5])
    def test_lb_endpoints_is_a_lower_bound(self, m):
        from dynamicaxiswarping_jl_spark.kernels.dtwnn import lb_endpoints
        rng = np.random.default_rng(3)
        for _ in range(2000):
            a = rng.normal(size=m)
            b = rng.normal(size=m)
            lb = lb_endpoints("sqeuclidean", a, b)
            cost = dtw_cost(a, b, SqEuclidean(), r=m)  # unconstrained
            assert lb <= cost + 1e-12 * max(1.0, cost), (m, lb, cost)

    def test_vectorized_endpoint_lb_is_a_lower_bound(self):
        from dynamicaxiswarping_jl_spark.kernels.dtwnn import (
            _lb_endpoints_all)
        rng = np.random.default_rng(4)
        for m in (1, 2, 3, 4):
            q = rng.normal(size=m)
            y = rng.normal(size=60)
            lbs = _lb_endpoints_all("sqeuclidean", q, y, m, None, None)
            for i in range(len(y) - m + 1):
                cost = dtw_cost(q, y[i:i + m], SqEuclidean(), r=m)
                assert lbs[i] <= cost + 1e-12, (m, i)

    def test_residue_pairs_keep_cost_equal_to_tau(self):
        """knn_topk residue contract: a pair whose true cost EQUALS the
        seed (tau) must come back finite — LB gates compare with <=, so a
        sound LB never drops it (the unsound m==3 LB did)."""
        from dynamicaxiswarping_jl_spark.kernels import native
        if not native.available():
            pytest.skip("no C compiler")
        rng = np.random.default_rng(7)
        for trial in range(300):
            a = rng.normal(size=3)
            b = rng.normal(size=20)
            true = dtwnn(a, b, SqEuclidean(), 5).cost
            out = native.nn_search_pairs(
                a.copy(), np.array([0]), np.array([3]),
                b.copy(), np.array([0]), np.array([20]),
                np.array([0]), np.array([0]), 5, np.array([true]))
            assert out is not None
            assert np.isfinite(out[0]) and out[0] == pytest.approx(
                true, rel=1e-12), trial

    def test_negative_radius_raises_on_every_path(self):
        rng = np.random.default_rng(5)
        q, y = rng.normal(size=8), rng.normal(size=50)
        for pv in (True, False):
            with pytest.raises(ValueError, match="radius"):
                dtwnn(q, y, SqEuclidean(), -1, prune_envelope=pv)

    def test_naive_oracle_lb_matches_engine_short_m(self):
        import os
        import sys
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))), "scripts"))
        import naive_dtw as NV
        from dynamicaxiswarping_jl_spark.kernels.dtwnn import lb_endpoints
        rng = np.random.default_rng(6)
        for m in (1, 2, 3, 4, 7):
            for _ in range(200):
                a = rng.normal(size=m)
                b = rng.normal(size=m)
                assert NV.lb_endpoints("sqeuclidean", a, b) == pytest.approx(
                    lb_endpoints("sqeuclidean", a, b), rel=1e-12)


class TestBandSketchBoundSoundness:
    """The knn_topk residue's band-sketch bounds (window-core range and
    window-variance, operators/dtw_ops._band_sketch) re-derived
    INDEPENDENTLY here and checked against the true subsequence DTW cost
    on random mixed-length pairs — the bound must never exceed the cost
    for ANY valid band, or the residue silently drops true neighbors."""

    @staticmethod
    def _sketch(x, w):
        from numpy.lib.stride_tricks import sliding_window_view
        sw = sliding_window_view(x, w)
        wmax = sw.max(axis=1)
        wmin = sw.min(axis=1)
        return (float(sw.var(axis=1).min()), float(wmax.min()),
                float(wmin.max()), bool((wmax == wmin).any()))

    def test_bounds_never_exceed_subsequence_cost(self):
        rng = np.random.default_rng(42)
        checked = 0
        for trial in range(200):
            m = int(rng.integers(1, 20))
            n = int(rng.integers(m, 40))
            kind = trial % 4
            if kind == 0:   # wide container, narrow query (nested-range)
                l = 5.0 * np.sin(np.linspace(0, 3 * np.pi, n)) \
                    + 0.1 * rng.normal(size=n)
                s = 0.2 * rng.normal(size=m)
            elif kind == 1:  # both random walks
                l = np.cumsum(rng.normal(size=n))
                s = np.cumsum(rng.normal(size=m))
            elif kind == 2:  # near-duplicate (bound must be ~0)
                start = int(rng.integers(0, n - m + 1))
                l = np.cumsum(rng.normal(size=n))
                s = l[start:start + m] + 1e-3 * rng.normal(size=m)
            else:           # constant container windows (constw path)
                l = np.repeat(rng.normal(size=-(-n // 5)), 5)[:n]
                s = rng.normal(size=m)
            true = dtwnn(s, l, SqEuclidean(), 4,
                         prune_endpoints=False,
                         prune_envelope=False).cost
            smin, smax = float(s.min()), float(s.max())
            W = smax - smin
            for b in range(m.bit_length()):  # every band with 2^b <= m
                w = 1 << b
                minvar, coremax, coremin, constw = self._sketch(l, w)
                c1 = max(coremax - smax, 0.0)
                c2 = max(smin - coremin, 0.0)
                core = max(c1 * c1, c2 * c2) if constw \
                    else c1 * c1 + c2 * c2
                var_lb = 0.5 * w * max(minvar - 0.5 * W * W, 0.0)
                tol = 1e-9 * max(1.0, true)
                assert core <= true + tol, (trial, w, core, true)
                assert var_lb <= true + tol, (trial, w, var_lb, true)
                checked += 1
        assert checked > 500

    def test_band_stats_chunked_matches_unchunked_bitwise(self):
        """_band_stats caps the sliding-var temporary by chunking the
        window axis (r04 review: ~2 GB/series at w=256 unchunked); the
        per-window numbers must stay bitwise identical — min/max/any
        reductions commute with the chunk split and each window's var
        only sees its own elements."""
        from dynamicaxiswarping_jl_spark.operators import dtw_ops
        rng = np.random.default_rng(17)
        orig = dtw_ops._SKETCH_CHUNK
        try:
            for n in (1, 2, 7, 33, 100, 257):
                x = np.cumsum(rng.normal(size=n))
                for b in range(n.bit_length()):
                    w = 1 << b
                    ref = self._sketch(x, w)
                    for chunk in (1, 2, 3, w, 5 * w, orig):
                        dtw_ops._SKETCH_CHUNK = chunk
                        cx, cn, cw, mv = dtw_ops._band_stats(x, w)
                        assert (mv, cx, cn, cw) == ref, (n, w, chunk)
        finally:
            dtw_ops._SKETCH_CHUNK = orig

    def test_equal_length_variance_bound_sound(self):
        # phase-2 form: full-length variance vs the other side's range
        rng = np.random.default_rng(9)
        for trial in range(300):
            m = int(rng.integers(1, 24))
            a = np.cumsum(rng.normal(size=m)) * rng.uniform(0.1, 3.0)
            b = np.cumsum(rng.normal(size=m)) * rng.uniform(0.1, 3.0)
            true = dtw_cost(a, b, SqEuclidean(), r=4)
            for x, y in ((a, b), (b, a)):
                wy = float(y.max() - y.min())
                lb = 0.5 * m * max(float(x.var()) - 0.5 * wy * wy, 0.0)
                assert lb <= true + 1e-9 * max(1.0, true), trial
