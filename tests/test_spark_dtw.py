"""DTW analytics through Spark: bit-identical to the local NumPy kernels
(SURVEY.md §5 test plan item b)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamicaxiswarping_jl_spark.kernels import (
    dtw, dtw_cost, dtwnn, dba, SqEuclidean)
from dynamicaxiswarping_jl_spark.operators import (
    dtw_pairs, drift_scores, dtwnn_search, knn_topk, dba_per_group,
    rollup_turns, cascade, gapfill, assemble_series)
from dynamicaxiswarping_jl_spark.operators.dba_ops import dba_distributed
from dynamicaxiswarping_jl_spark.sources import transcripts_df

SERIES_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("points", T.ArrayType(T.DoubleType())),
])


@pytest.fixture(scope="module")
def series(spark):
    rng = np.random.default_rng(21)
    rows = [("s%02d" % i, np.cumsum(rng.normal(size=40)).tolist())
            for i in range(10)]
    return spark.createDataFrame(rows, SERIES_SCHEMA).cache()


class TestDtwPairs:
    def test_matches_kernel(self, spark, series):
        pdf = series.toPandas()
        pairs = spark.createDataFrame(
            [(pdf.conv_id[i], [float(v) for v in pdf.points[i]], pdf.conv_id[j], [float(v) for v in pdf.points[j]])
             for i in range(4) for j in range(4) if i != j],
            "id_a string, a array<double>, id_b string, b array<double>")
        got = dtw_pairs(pairs, keep_paths=True).toPandas().set_index(["id_a", "id_b"])
        for i in range(4):
            for j in range(4):
                if i == j:
                    continue
                cost, i1, i2 = dtw(np.array(pdf.points[i]), np.array(pdf.points[j]))
                row = got.loc[(pdf.conv_id[i], pdf.conv_id[j])]
                assert row["cost"] == pytest.approx(cost, rel=1e-12)
                assert list(row["i1"]) == i1.tolist()
                assert list(row["i2"]) == i2.tolist()

    def test_banded_radius(self, spark, series):
        pdf = series.toPandas()
        pairs = spark.createDataFrame(
            [(pdf.conv_id[0], [float(v) for v in pdf.points[0]], pdf.conv_id[1], [float(v) for v in pdf.points[1]])],
            "id_a string, a array<double>, id_b string, b array<double>")
        got = dtw_pairs(pairs, radius=5).first()["cost"]
        from dynamicaxiswarping_jl_spark.kernels import radiuslimits
        imin, imax = radiuslimits(5, 40, 40)
        want, _, _ = dtw(np.array(pdf.points[0]), np.array(pdf.points[1]),
                         i2min=imin, i2max=imax)
        assert got == pytest.approx(want, rel=1e-12)


class TestDtwnnSearch:
    def test_matches_kernel_global_min(self, spark, series):
        pdf = series.toPandas()
        q = np.array(pdf.points[3][10:25])
        queries = spark.createDataFrame([("q0", q.tolist())],
                                        "query_id string, q array<double>")
        got = dtwnn_search(queries, series, radius=3).first()
        # oracle: kernel dtwnn per series, global argmin (ties → min conv_id
        # is not guaranteed by min_by; assert on cost and that loc matches)
        best = None
        for row in pdf.itertuples(index=False):
            res = dtwnn(q, np.array(row.points), SqEuclidean(), 3)
            if best is None or res.cost < best[0]:
                best = (res.cost, row.conv_id, res.loc)
        assert got["cost"] == pytest.approx(best[0], rel=1e-9)
        assert got["conv_id"] == best[1]
        assert got["loc"] == best[2]
        assert got["prune_end"] + got["prune_env"] >= 0

    def test_seeded_bsf_identical_under_exact_ties(self, spark):
        # The global bsf seed must not change cost/conv_id/loc even when
        # several series tie EXACTLY at the seeded value (the knife-edge:
        # a series whose optimum equals the seed must still report, since
        # every LB gate compares with <=). Zero plateaus + duplicated
        # series make exact cross-series ties certain, including cost 0
        # at the seed itself.
        base = [0.0] * 8 + [1.0, 3.0, 1.0] + [0.0] * 9
        rng = np.random.default_rng(7)
        rows = [("t%02d" % i, list(base)) for i in range(4)]  # 4 exact copies
        rows += [("u%02d" % i,
                  [float(v) for v in
                   np.round(np.cumsum(rng.integers(-1, 2, size=20)))]
                  ) for i in range(8)]
        series = spark.createDataFrame(rows, SERIES_SCHEMA)
        queries = spark.createDataFrame(
            [("q0", base[4:16]), ("q1", [0.0] * 9),
             ("q2", [float(v) for v in rows[6][1][2:14]])],
            "query_id string, q array<double>")
        cols = ["query_id", "cost", "conv_id", "loc"]
        unseeded = (dtwnn_search(queries, series, radius=3, seed_sample=0)
                    .select(*cols).toPandas()
                    .sort_values("query_id").reset_index(drop=True))
        seeded = (dtwnn_search(queries, series, radius=3, seed_sample=8)
                  .select(*cols).toPandas()
                  .sort_values("query_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(unseeded, seeded)
        # the duplicated-series queries must land on the lexicographically
        # smallest copy with cost exactly 0 — a tie AT the seed value
        for qid in ("q0", "q1"):
            row = seeded[seeded.query_id == qid].iloc[0]
            assert row["cost"] == 0.0
            assert row["conv_id"] == "t00"

    def test_blocked_large_query_path_matches_closure_path(self, spark,
                                                           series):
        """VERDICT r03 #2: past max_closure_queries the query set must
        never ride the driver (no collect + closure, no driver seed
        DPs). Force the blocked cogroup path with max_closure_queries=0
        and assert cost/conv_id/loc identical to the closure plan —
        including exact cross-series ties and queries longer than some
        series — under both seeded and unseeded modes."""
        pdf = series.toPandas()
        rng = np.random.default_rng(31)
        qrows = []
        for i in range(24):
            src = pdf.points[int(rng.integers(0, len(pdf)))]
            a = int(rng.integers(0, max(1, len(src) - 6)))
            m = int(rng.integers(4, 14))
            q = list(src[a:a + m])
            if rng.random() < 0.3:  # perturb so not all are exact hits
                q = [v + 0.1 for v in q]
            qrows.append((f"q{i:02d}", [float(v) for v in q]))
        queries = spark.createDataFrame(
            qrows, "query_id string, q array<double>")
        cols = ["query_id", "cost", "conv_id", "loc"]
        for seed in (0, 4):
            closure = (dtwnn_search(queries, series, radius=3,
                                    seed_sample=seed)
                       .select(*cols).toPandas()
                       .sort_values("query_id").reset_index(drop=True))
            blocked = (dtwnn_search(queries, series, radius=3,
                                    seed_sample=seed,
                                    max_closure_queries=0)
                       .select(*cols).toPandas()
                       .sort_values("query_id").reset_index(drop=True))
            pd.testing.assert_frame_equal(closure, blocked)

    def test_n_queries_hint_routes_without_a_probe_job(self, spark,
                                                       series):
        """The caller-size hint must pick the path by itself (no
        count()/maxRows probe) and both routings must stay exact: a
        hint above the closure cap forces the blocked plan, a hint at
        the true size keeps the closure plan, results identical."""
        pdf = series.toPandas()
        q = [float(v) for v in pdf.points[0][:8]]
        queries = spark.createDataFrame([("q0", q)],
                                        "query_id string, q array<double>")
        cols = ["query_id", "cost", "conv_id", "loc"]
        via_closure = (dtwnn_search(queries, series, radius=3,
                                    n_queries=1)
                       .select(*cols).toPandas())
        via_blocked = (dtwnn_search(queries, series, radius=3,
                                    n_queries=10_000)
                       .select(*cols).toPandas())
        pd.testing.assert_frame_equal(via_closure, via_blocked)


class TestKnn:
    def test_matches_dense_topk(self, spark, series):
        pdf = series.toPandas()
        got = knn_topk(series, k=3, radius=5).toPandas()  # default grid path
        pts = {r.conv_id: np.array(r.points) for r in pdf.itertuples(index=False)}
        ids = sorted(pts)
        for cid in ids:
            want = sorted(
                (dtw_cost(pts[cid], pts[o], SqEuclidean(), 5), o)
                for o in ids if o != cid)[:3]
            sub = got[got.id_a == cid].sort_values("rk")
            np.testing.assert_allclose(sub["cost"], [w[0] for w in want],
                                       rtol=1e-9)


class TestDriftScores:
    def test_pipeline_drift(self, spark):
        turns = transcripts_df(spark, 5, seed=3, mean_turns=60, slices=2)
        t1m = gapfill(rollup_turns(turns, "1m"), 60, policy="zero")
        t1h = gapfill(cascade(t1m, "1h"), 3600, policy="zero")
        fine = assemble_series(t1m, "turn_rate", step_s=60)
        coarse = assemble_series(t1h, "turn_rate", step_s=3600)
        d = drift_scores(fine, coarse, radius=3).toPandas()
        assert len(d) == 5
        assert (d["cost"] >= 0).all()
        assert set(d.columns) >= {"cost", "n_fine", "n_coarse", "pruned_lb"}


class TestDBASpark:
    def test_golden_through_spark(self, spark):
        # the runtests.jl:473-481 golden value via applyInPandas:
        # members sorted by conv_id → init_center must be the first (= z)
        rows = [("a_z", [1.0, 2.0, 2.0, 4.0], "g"),   # sorts first → init = z
                ("b_x", [1.0, 2.0, 2.0, 3.0, 3.0, 4.0], "g"),
                ("c_y", [1.0, 3.0, 4.0], "g")]
        df = spark.createDataFrame(rows, "conv_id string, points array<double>, group_id string")
        got = dba_per_group(df, "group_id").first()
        np.testing.assert_allclose(got["center"], [1.0, 1.75, 2.75, 4.0])
        assert got["converged"]
        assert got["n_members"] == 3

    def test_distributed_matches_local(self, spark, series):
        pdf = series.toPandas()
        seqs = [np.array(p) for p in pdf.points]
        init = seqs[0]
        want_avg, want_res = dba(seqs, SqEuclidean(), init_center=init,
                                 iterations=5, rtol=1e-9)
        got_avg, got_cost, got_it, _ = dba_distributed(
            spark, series, init, iterations=5, rtol=1e-9)
        np.testing.assert_allclose(got_avg, want_avg, rtol=1e-9)
        assert got_it == want_res.iterations
        assert got_cost == pytest.approx(want_res.cost, rel=1e-9)

    def test_reps_distributed_matches_per_group(self, spark):
        """The group-parallel distributed plan returns the same
        representatives as the single-task-per-group plan (up to float
        reassociation from per-partition partial sums)."""
        from dynamicaxiswarping_jl_spark.operators import (
            dba_reps_distributed)
        rng = np.random.default_rng(7)
        rows = []
        for i in range(18):
            g = str(i % 3)
            pts = np.cumsum(rng.normal(size=24)).tolist()
            rows.append(("s%02d" % i, [float(v) for v in pts], g))
        df = spark.createDataFrame(
            rows, "conv_id string, points array<double>, group_id string")
        want = {r["group_id"]: r
                for r in dba_per_group(df, "group_id").collect()}
        got = {r["group_id"]: r
               for r in dba_reps_distributed(df, "group_id").collect()}
        assert sorted(got) == sorted(want) == ["0", "1", "2"]
        for g in want:
            np.testing.assert_allclose(got[g]["center"], want[g]["center"],
                                       rtol=1e-9)
            assert got[g]["cost"] == pytest.approx(want[g]["cost"], rel=1e-9)
            assert got[g]["n_members"] == want[g]["n_members"]
            assert got[g]["iterations"] == want[g]["iterations"]
            assert got[g]["converged"] == want[g]["converged"]


class TestMultichannelPairs:
    def test_multichannel_dtw_pairs_matches_local(self, spark):
        """ARRAY<ARRAY<DOUBLE>> series (channels × time, time last —
        reference README.md:11, multichannel regression runtests.jl:60-74)
        flow through dtw_pairs with exact cost + path parity."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import dtw_pairs
        from dynamicaxiswarping_jl_spark.kernels import dtw
        rng = np.random.default_rng(1)
        A = rng.normal(size=(3, 20))
        B = rng.normal(size=(3, 24))
        pairs = spark.createDataFrame(
            [("a", [[float(x) for x in ch] for ch in A],
              "b", [[float(x) for x in ch] for ch in B])],
            "id_a string, a array<array<double>>, "
            "id_b string, b array<array<double>>")
        got = dtw_pairs(pairs, keep_paths=True).collect()[0]
        want, i1, i2 = dtw(A, B)
        assert got.cost == pytest.approx(want, rel=1e-12)
        assert got.i1 == i1.tolist() and got.i2 == i2.tolist()


class TestKnnLbPrefilter:
    def test_prefilter_matches_bruteforce(self, spark):
        """Two-phase LB-pruned k-NN returns the same per-key cost profile
        as the all-pairs version (result-identical guarantee)."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(5)
        rows = []
        for i in range(24):
            n = 40 if i % 5 else 30  # mix of lengths: LB path + exact path
            base = np.sin(np.linspace(0, 3, n)) * (1 + i % 7)
            rows.append((f"s{i:02d}",
                         [float(v) for v in base + 0.1 * rng.normal(size=n)]))
        series = spark.createDataFrame(rows, "conv_id string, points array<double>")
        brute = knn_topk(series, k=3, radius=5, lb_prefilter=False).toPandas()
        fast = knn_topk(series, k=3, radius=5, lb_prefilter=True,
                        oversample=2).toPandas()
        for key in sorted(brute.id_a.unique()):
            bc = sorted(round(c, 9) for c in brute[brute.id_a == key].cost)
            fc = sorted(round(c, 9) for c in fast[fast.id_a == key].cost)
            assert bc == fc, key

    def test_grid_path_degenerate_lengths(self, spark):
        """Length-1 series have no valid endpoint LB (first==last would
        double-count, ADVICE r01) — they must route through the exhaustive
        residue and still return the exact top-k."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(11)
        rows = [("one0", [2.0]), ("one1", [2.05])]  # near pair of singletons
        for i in range(14):
            v = np.sin(np.linspace(0, 2, 20)) * (1 + i % 4) \
                + 0.1 * rng.normal(size=20)
            rows.append((f"s{i:02d}", [float(x) for x in v]))
        series = spark.createDataFrame(
            rows, "conv_id string, points array<double>")
        brute = knn_topk(series, k=2, radius=3, lb_prefilter=False).toPandas()
        fast = knn_topk(series, k=2, radius=3).toPandas()
        for key in sorted(brute.id_a.unique()):
            bc = sorted(round(c, 9) for c in brute[brute.id_a == key].cost)
            fc = sorted(round(c, 9) for c in fast[fast.id_a == key].cost)
            assert bc == fc, key

    def test_grid_path_randomized_exactness(self, spark):
        """Randomized adversarial corpora for the grid path: duplicate
        series (exact-zero ties), clustered + outlier values (grid-cell
        skew), mixed lengths, and tiny grids — the neighbor multiset must
        equal brute force in every configuration."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(99)
        for trial, (n, k) in enumerate([(18, 2), (25, 4), (40, 3)]):
            rows = []
            for i in range(n):
                L = rng.choice([16, 16, 16, 24]) if trial == 2 else 16
                if i % 7 == 0 and i > 0:
                    rows.append((f"t{trial}s{i:02d}", rows[-1][1]))  # dup
                    continue
                base = rng.choice([0.0, 0.0, 50.0])  # clustered + outliers
                v = base + np.round(rng.normal(size=L), 1)
                rows.append((f"t{trial}s{i:02d}", [float(x) for x in v]))
            series = spark.createDataFrame(
                rows, "conv_id string, points array<double>")
            brute = knn_topk(series, k=k, radius=4,
                             lb_prefilter=False).toPandas()
            fast = knn_topk(series, k=k, radius=4, oversample=2,
                            grid_cells=3).toPandas()
            for key in sorted(brute.id_a.unique()):
                bc = sorted(round(c, 9) for c in brute[brute.id_a == key].cost)
                fc = sorted(round(c, 9) for c in fast[fast.id_a == key].cost)
                assert bc == fc, (trial, key)

    def test_residue_minmax_bound_prunes_peaky_pairs_exactly(self, spark):
        """The residue's min/max scalar bound fires exactly when a shorter
        series has a mid-series excursion OUTSIDE the longer side's value
        range with calm endpoints (the case the endpoint-vs-range bound is
        blind to). The pruned plan must still equal brute force, and the
        admitted residue pair count must drop below the all-cross-length
        count — i.e. the bound actually fires on this corpus."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(77)
        rows = []
        # 12 calm long series in [-1, 1], length 30
        for i in range(12):
            v = np.sin(np.linspace(0, 3, 30)) + 0.05 * rng.normal(size=30)
            rows.append((f"calm{i:02d}", [float(x) for x in v]))
        # 8 short series: calm endpoints in range, huge mid-series peak
        # far outside every long series' [min, max]
        for i in range(8):
            v = 0.05 * rng.normal(size=20)
            v[10] = 100.0 + i  # the excursion
            rows.append((f"peak{i:02d}", [float(x) for x in v]))
        series = spark.createDataFrame(
            rows, "conv_id string, points array<double>")
        stats = {}
        fast = knn_topk(series, k=3, radius=4, oversample=2,
                        stats_out=stats).toPandas()
        brute = knn_topk(series, k=3, radius=4,
                         lb_prefilter=False).toPandas()
        for key in sorted(brute.id_a.unique()):
            bc = sorted(round(c, 9) for c in brute[brute.id_a == key].cost)
            fc = sorted(round(c, 9) for c in fast[fast.id_a == key].cost)
            assert bc == fc, key
        # every (calm, peak) cross-length pair has endpoint-bound 0 (calm
        # endpoints inside every range) but minmax-bound ~1e4 >> every τ
        # (τ is seeded by within-band boot pairs on both sides) — so ALL
        # 2·12·8=192 cross-length pairs outside the boot set must be
        # pruned before any DP
        assert stats["residue_pairs"] == 0

    def test_residue_sketch_bounds_prune_range_nested_pairs_exactly(
            self, spark):
        """Round-3 residue hole: a narrow-range short series NESTED inside
        a wide-swing long series' value range passes every endpoint /
        extrema scalar bound (all its values are inside the long side's
        [min, max]), yet its true subsequence cost is huge — a wide-swing
        window can't flatten itself. The band-sketch bounds (window-core
        range + window-variance, _band_sketch) must prune every such
        cross pair before any DP, and the plan must stay exactly equal to
        brute force."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(55)
        rows = []
        # 10 wide-swing long series: amp-5 sine, range ~[-5, 5], len 40
        for i in range(10):
            v = 5.0 * np.sin(np.linspace(0, 4 * np.pi, 40)) \
                + 0.05 * rng.normal(size=40)
            rows.append((f"wide{i:02d}", [float(x) for x in v]))
        # 8 narrow short series: range ~[-0.3, 0.3] — strictly nested
        for i in range(8):
            v = 0.1 * rng.normal(size=24)
            rows.append((f"narr{i:02d}", [float(x) for x in v]))
        series = spark.createDataFrame(
            rows, "conv_id string, points array<double>")
        stats = {}
        fast = knn_topk(series, k=3, radius=4, oversample=2,
                        stats_out=stats).toPandas()
        brute = knn_topk(series, k=3, radius=4,
                         lb_prefilter=False).toPandas()
        for key in sorted(brute.id_a.unique()):
            bc = sorted(round(c, 9) for c in brute[brute.id_a == key].cost)
            fc = sorted(round(c, 9) for c in fast[fast.id_a == key].cost)
            assert bc == fc, key
        # every cross-length (wide, narr) pair is range-nested with
        # near-zero endpoint AND extrema bounds, but any 16-pt window of
        # an amp-5 sine has window-max >= ~3 and window-variance >= ~8,
        # so core/variance bounds >> every τ (τ comes from the
        # equal-length grid: wide-wide and narr-narr) → zero DP'd
        # residue pairs
        assert stats["residue_pairs"] == 0

    def test_grid_path_uniform_length_no_selfjoin(self, spark):
        """Uniform-length corpus: exact parity, and the physical plan of the
        scale path must not contain a full array self-join (cartesian /
        non-equi BNLJ over the series table)."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(7)
        rows = [(f"s{i:02d}",
                 [float(v) for v in np.cumsum(rng.normal(size=32))])
                for i in range(30)]
        series = spark.createDataFrame(
            rows, "conv_id string, points array<double>")
        brute = knn_topk(series, k=3, radius=4, lb_prefilter=False).toPandas()
        fast_df = knn_topk(series, k=3, radius=4)
        fast = fast_df.toPandas()
        for key in sorted(brute.id_a.unique()):
            bc = sorted(round(c, 9) for c in brute[brute.id_a == key].cost)
            fc = sorted(round(c, 9) for c in fast[fast.id_a == key].cost)
            assert bc == fc, key
        plan = fast_df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_residue_all_cross_length_matches_bruteforce(self, spark):
        """Every pair cross-length (all-distinct lengths): the τ-bounded
        residue path must equal brute force, including exact-τ ties —
        two long series both containing the query series verbatim (cost
        0 twice) must both survive the nextafter(τ) seeding."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(23)
        probe = np.sin(np.linspace(0, 4, 12))
        rows = [("probe", [float(v) for v in probe])]
        # two containers of different lengths, each embedding probe exactly
        for j, pad in enumerate((5, 9)):
            v = np.concatenate([rng.normal(size=pad) + 10, probe,
                                rng.normal(size=pad + j) + 10])
            rows.append((f"cont{j}", [float(x) for x in v]))
        for i in range(15):
            L = 14 + i * 2  # all lengths distinct
            v = np.cumsum(rng.normal(size=L))
            rows.append((f"s{i:02d}", [float(x) for x in v]))
        rows.append(("one", [3.5]))  # singleton in the mix
        series = spark.createDataFrame(
            rows, "conv_id string, points array<double>")
        brute = knn_topk(series, k=2, radius=4, lb_prefilter=False).toPandas()
        fast = knn_topk(series, k=2, radius=4, oversample=2).toPandas()
        for key in sorted(brute.id_a.unique()):
            bc = sorted(round(c, 9) for c in brute[brute.id_a == key].cost)
            fc = sorted(round(c, 9) for c in fast[fast.id_a == key].cost)
            assert bc == fc, key
        # the exact-tie pair: probe's two 0-cost containers both present
        pk = fast[fast.id_a == "probe"]
        assert set(pk.id_b) == {"cont0", "cont1"}
        np.testing.assert_allclose(pk.cost, [0.0, 0.0], atol=1e-12)

    def test_tau_less_isolated_id_full_grid_scan(self, spark):
        """An id whose 3×3 grid neighborhood holds fewer than k candidates
        gets a NULL τ, and phase 2 must then scan the FULL grid for it.
        Regression: Spark's greatest/least skip NULLs, so floor(NULL)
        inside the cell-range clamp used to collapse the τ-less window to
        cell (0,0) instead of widening it — the isolated id silently lost
        its true neighbors."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(5)
        rows = []
        # 99 series clustered at HIGH values (top-right grid corner), one
        # isolated id at LOW values (cell (0,0)): the isolated id's 3x3
        # neighborhood is empty, so its tau is NULL
        for i in range(99):
            v = 100.0 + np.cumsum(rng.normal(size=16)) * 0.1
            rows.append((f"c{i:02d}", [float(x) for x in v]))
        rows.append(("iso", [float(x) for x in np.linspace(0, 1, 16)]))
        series = spark.createDataFrame(
            rows, "conv_id string, points array<double>")
        brute = knn_topk(series, k=4, radius=5, lb_prefilter=False).toPandas()
        fast = knn_topk(series, k=4, radius=5).toPandas()
        bi = brute[brute.id_a == "iso"]
        fi = fast[fast.id_a == "iso"]
        assert len(fi) == len(bi) == 4, (len(fi), len(bi))
        assert sorted(round(c, 9) for c in fi.cost) \
            == sorted(round(c, 9) for c in bi.cost)
        for key in sorted(brute.id_a.unique()):
            bc = sorted(round(c, 9) for c in brute[brute.id_a == key].cost)
            fc = sorted(round(c, 9) for c in fast[fast.id_a == key].cost)
            assert bc == fc, key

    def test_grid_path_clustered_sine_families(self, spark):
        """Cluster-structured corpus (the PAA pruning regime: many
        near-identical shapes per family): grid path ≡ brute force."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(13)
        rows = []
        t = np.arange(24)
        for fam in range(5):
            base, amp, freq = fam * 2.0, 1 + fam * 0.5, 0.2 + fam * 0.07
            for i in range(8):
                v = (base + amp * np.sin(t * freq)
                     + rng.normal(scale=0.05, size=24))
                rows.append((f"f{fam}s{i}", [float(x) for x in v]))
        series = spark.createDataFrame(
            rows, "conv_id string, points array<double>")
        brute = knn_topk(series, k=3, radius=5, lb_prefilter=False).toPandas()
        fast = knn_topk(series, k=3, radius=5).toPandas()
        for key in sorted(brute.id_a.unique()):
            bc = sorted(round(c, 9) for c in brute[brute.id_a == key].cost)
            fc = sorted(round(c, 9) for c in fast[fast.id_a == key].cost)
            assert bc == fc, key

    def test_stats_out_probe_does_not_change_results(self, spark):
        """stats_out (the scale-probe instrumentation) must be a pure
        observer: identical neighbor sets with and without it, and the
        recorded candidate counts must be present and consistent on a
        mixed-length corpus (all four stages exercised)."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(41)
        rows = []
        for i in range(24):
            L = 16 if i % 2 == 0 else 20  # mixed lengths → residue active
            v = np.cumsum(rng.normal(size=L))
            rows.append((f"s{i:02d}", [float(x) for x in v]))
        series = spark.createDataFrame(
            rows, "conv_id string, points array<double>")
        plain = knn_topk(series, k=3, radius=4).toPandas()
        stats: dict = {}
        probed = knn_topk(series, k=3, radius=4,
                          stats_out=stats).toPandas()
        for key in sorted(plain.id_a.unique()):
            pc = sorted(round(c, 9) for c in plain[plain.id_a == key].cost)
            qc = sorted(round(c, 9) for c in probed[probed.id_a == key].cost)
            assert pc == qc, key
        assert stats["n_series"] == 24
        for k_ in ("phase1_enum_pairs", "phase1_pairs", "phase2_pairs",
                   "boot_pairs", "residue_pairs"):
            assert stats[k_] >= 0, stats
        assert stats["phase1_pairs"] <= stats["phase1_enum_pairs"]

    def test_mixed_length_no_array_nested_loop(self, spark):
        """Mixed-length corpus: the residue may enumerate SCALAR stats with
        a nested-loop join, but no array column may ever sit under a
        cartesian/nested-loop join — arrays are only fetched by equi-join
        for LB/τ survivors."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators import knn_topk
        rng = np.random.default_rng(41)
        rows = [(f"s{i:02d}",
                 [float(v) for v in np.cumsum(rng.normal(size=16 + (i % 6)))])
                for i in range(24)]
        series = spark.createDataFrame(
            rows, "conv_id string, points array<double>")
        df = knn_topk(series, k=3, radius=4)
        plan = df._jdf.queryExecution().executedPlan()
        assert "CartesianProduct" not in plan.toString()

        def walk(node):
            yield node
            ch = node.children()
            for i in range(ch.size()):
                yield from walk(ch.apply(i))

        for node in walk(plan):
            if "NestedLoopJoin" in node.nodeName():
                out = node.output()
                for i in range(out.size()):
                    att = out.apply(i)
                    assert "array" not in att.dataType().simpleString(), (
                        f"array column {att.name()} under {node.nodeName()}")


class TestMatrixProfileTiled:
    def test_tiled_path_matches_single_pass_including_ties(self, spark):
        """VERDICT r03 #3: a long series must spread over multiple tasks.
        Forcing tiny tiles must reproduce the single-task profile EXACTLY
        — values, 1-based locs, and tie winners (repeated motifs make
        exact cost-0 ties across tile boundaries certain)."""
        from dynamicaxiswarping_jl_spark.operators import matrix_profile_op
        rng = np.random.default_rng(17)
        motif = np.sin(np.linspace(0, 2 * np.pi, 16))
        y = np.concatenate([motif, rng.normal(size=23), motif,
                            rng.normal(size=31), motif,
                            np.repeat(rng.normal(size=9), 3)])
        rows = [("long0", [float(v) for v in y]),
                ("long1", [float(v) for v in np.cumsum(
                    rng.normal(size=97))])]
        series = spark.createDataFrame(rows, SERIES_SCHEMA)
        base = (matrix_profile_op(series, m=12, radius=3)
                .toPandas().sort_values(["conv_id", "loc"])
                .reset_index(drop=True))
        tiled_df = matrix_profile_op(series, m=12, radius=3,
                                     chunk_windows=20)
        tiled = (tiled_df.toPandas().sort_values(["conv_id", "loc"])
                 .reset_index(drop=True))
        pd.testing.assert_frame_equal(base, tiled)
        # the tiled plan really fans out: > 1 tile per series
        plan = tiled_df._jdf.queryExecution().executedPlan().toString()
        assert "explode" in plan.lower()

    def test_tiled_short_series_skips_merge_shuffle(self, spark, series):
        from dynamicaxiswarping_jl_spark.operators import matrix_profile_op
        df = matrix_profile_op(series, m=8, radius=3)  # default chunk
        plan = df._jdf.queryExecution().executedPlan().toString()
        # short corpus keeps the shuffle-free single-pass plan
        assert "explode" not in plan.lower()


class TestDistanceProfilePaths:
    def test_blocked_matches_closure(self, spark, series):
        """VERDICT r04 #2: past max_closure_queries the distance-profile
        query set must never ride the driver. Force the blocked cogroup
        path and assert every (query, series, loc, dist) row identical
        to the closure plan — including queries longer than some series
        (dropped on both paths)."""
        from dynamicaxiswarping_jl_spark.operators import distance_profile_op
        pdf = series.toPandas()
        rng = np.random.default_rng(5)
        qrows = []
        for i in range(9):
            src = pdf.points[int(rng.integers(0, len(pdf)))]
            a = int(rng.integers(0, 25))
            m = int(rng.integers(5, 14))
            q = [float(v) + (0.1 if i % 3 == 0 else 0.0)
                 for v in src[a:a + m]]
            qrows.append((f"q{i}", q))
        qrows.append(("qlong", [0.0] * 60))  # longer than every series
        queries = spark.createDataFrame(qrows,
                                        "query_id string, q array<double>")
        cols = ["query_id", "conv_id", "loc", "dist"]
        closure = (distance_profile_op(queries, series, radius=3)
                   .select(*cols).toPandas().sort_values(cols[:3])
                   .reset_index(drop=True))
        blocked = (distance_profile_op(queries, series, radius=3,
                                       max_closure_queries=0)
                   .select(*cols).toPandas().sort_values(cols[:3])
                   .reset_index(drop=True))
        pd.testing.assert_frame_equal(closure, blocked)

    def test_n_queries_hint_routes_without_probe(self, spark, series):
        from dynamicaxiswarping_jl_spark.operators import distance_profile_op
        pdf = series.toPandas()
        q = [float(v) for v in pdf.points[0][:8]]
        queries = spark.createDataFrame([("q0", q)],
                                        "query_id string, q array<double>")
        cols = ["query_id", "conv_id", "loc", "dist"]
        via_closure = (distance_profile_op(queries, series, radius=3,
                                           n_queries=1)
                       .select(*cols).toPandas().sort_values(cols[:3])
                       .reset_index(drop=True))
        via_blocked = (distance_profile_op(queries, series, radius=3,
                                           n_queries=10_000)
                       .select(*cols).toPandas().sort_values(cols[:3])
                       .reset_index(drop=True))
        pd.testing.assert_frame_equal(via_closure, via_blocked)
