"""Rollup core: generator determinism, tier aggregation vs pandas oracle,
cascade consistency, gap-fill policies, series assembly."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamicaxiswarping_jl_spark.sources import (
    transcripts_df, generate_transcripts_pandas)
from dynamicaxiswarping_jl_spark.operators import (
    rollup_turns, cascade, assemble_series, gapfill)

N_CONV = 12


@pytest.fixture(scope="module")
def turns_pdf():
    return generate_transcripts_pandas(N_CONV, seed=42, mean_turns=30)


@pytest.fixture(scope="module")
def turns(spark, turns_pdf):
    df = transcripts_df(spark, N_CONV, seed=42, mean_turns=30, slices=4)
    df.cache().count()
    return df


class TestGenerator:
    def test_deterministic_and_distributed_equal(self, turns, turns_pdf):
        got = turns.orderBy("conv_id", "turn_idx").toPandas()
        want = turns_pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_per_turn_text_equality_invariant(self, turns):
        # input_hint: per-turn text equality under stable (conv_id, turn_idx)
        bad = turns.filter(
            ~F.col("text").startswith(
                F.concat(F.col("conv_id"), F.lit(":"),
                         F.col("turn_idx").cast("string"), F.lit(":")))
        ).count()
        assert bad == 0

    def test_turn_idx_dense_unique(self, turns):
        chk = (turns.groupBy("conv_id")
               .agg(F.count("*").alias("n"), F.max("turn_idx").alias("mx"),
                    F.countDistinct("turn_idx").alias("nd")))
        bad = chk.filter((F.col("mx") != F.col("n") - 1) |
                         (F.col("nd") != F.col("n"))).count()
        assert bad == 0


def pandas_rollup(pdf: pd.DataFrame, freq: str):
    g = (pdf.assign(bucket=pdf["ts"].dt.floor(freq),
                    tool_call=pdf["tool"].notna())
         .groupby(["conv_id", "bucket"], as_index=False)
         .agg(n_turns=("turn_idx", "size"), tool_calls=("tool_call", "sum")))
    return g


class TestRollup:
    def test_1m_matches_pandas_oracle(self, turns, turns_pdf):
        got = (rollup_turns(turns, "1m")
               .orderBy("conv_id", "bucket").toPandas())
        want = pandas_rollup(turns_pdf, "1min").sort_values(
            ["conv_id", "bucket"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["conv_id", "bucket", "n_turns", "tool_calls"]],
            want, check_dtype=False)
        np.testing.assert_allclose(got["turn_rate"], got["n_turns"])

    def test_cascade_equals_direct(self, turns):
        # tier consistency: 1m→1h cascade == direct 1h rollup (exact)
        t1m = rollup_turns(turns, "1m")
        via = cascade(t1m, "1h").orderBy("conv_id", "bucket").toPandas()
        direct = rollup_turns(turns, "1h").orderBy("conv_id", "bucket").toPandas()
        pd.testing.assert_frame_equal(via, direct, check_dtype=False)

    def test_cascade_1d(self, turns):
        t1h = cascade(rollup_turns(turns, "1m"), "1h")
        via = cascade(t1h, "1d").orderBy("conv_id", "bucket").toPandas()
        direct = rollup_turns(turns, "1d").orderBy("conv_id", "bucket").toPandas()
        pd.testing.assert_frame_equal(via, direct, check_dtype=False)

    def test_total_turns_preserved(self, turns):
        raw = turns.count()
        for tier in ("1m", "1h", "1d"):
            assert rollup_turns(turns, tier).agg(
                F.sum("n_turns")).first()[0] == raw


class TestGapfill:
    def test_zero_policy_dense_grid(self, turns):
        t1m = rollup_turns(turns, "1m")
        gf = gapfill(t1m, 60, policy="zero")
        # per conv: bucket count == (max-min)/60 + 1 and no nulls
        chk = (gf.groupBy("conv_id")
               .agg(F.count("*").alias("n"),
                    ((F.max("bucket").cast("long") - F.min("bucket").cast("long")) / 60 + 1).alias("want"))
               .filter(F.col("n") != F.col("want")))
        assert chk.count() == 0
        assert gf.filter(F.col("turn_rate").isNull()).count() == 0
        # observed buckets keep their values; filled buckets are 0
        orig = t1m.agg(F.sum("n_turns")).first()[0]
        assert gf.agg(F.sum("n_turns")).first()[0] == orig

    def test_locf_policy(self, spark):
        pdf = pd.DataFrame({
            "conv_id": ["c"] * 3,
            "bucket": pd.to_datetime(["2026-01-01 00:00", "2026-01-01 00:03",
                                      "2026-01-01 00:05"]),
            "turn_rate": [1.0, 4.0, 9.0],
            "n_turns": [1, 4, 9], "tool_calls": [0, 1, 2],
        })
        gf = (gapfill(spark.createDataFrame(pdf), 60, policy="locf")
              .orderBy("bucket").toPandas())
        assert gf["turn_rate"].tolist() == [1.0, 1.0, 1.0, 4.0, 4.0, 9.0]

    def test_interp_policy(self, spark):
        pdf = pd.DataFrame({
            "conv_id": ["c"] * 2,
            "bucket": pd.to_datetime(["2026-01-01 00:00", "2026-01-01 00:04"]),
            "turn_rate": [0.0, 8.0],
            "n_turns": [0, 8], "tool_calls": [0, 0],
        })
        gf = (gapfill(spark.createDataFrame(pdf), 60,
                      value_cols=("turn_rate",), policy="interp")
              .orderBy("bucket").toPandas())
        np.testing.assert_allclose(gf["turn_rate"], [0, 2, 4, 6, 8])


class TestAssemble:
    def test_points_sorted_and_complete(self, turns):
        t1h = cascade(rollup_turns(turns, "1m"), "1h")
        gf = gapfill(t1h, 3600, policy="zero")
        ser = assemble_series(gf, "turn_rate", step_s=3600)
        pdf = ser.toPandas()
        assert len(pdf) == N_CONV
        oracle = (gf.orderBy("conv_id", "bucket")
                  .groupBy("conv_id")
                  .agg(F.collect_list("turn_rate").alias("want"))
                  .toPandas().set_index("conv_id"))
        for row in pdf.itertuples(index=False):
            np.testing.assert_allclose(
                row.points, oracle.loc[row.conv_id, "want"])

    def test_windowed_assembly_bounds_rows(self, turns):
        """window='1 day' splits each conv into day segments whose
        concatenation (ordered by t0) equals the unbounded series — the
        scale guard for years-long conversations."""
        t1h = cascade(rollup_turns(turns, "1m"), "1h")
        gf = gapfill(t1h, 3600, policy="zero")
        whole = {r["conv_id"]: r["points"]
                 for r in assemble_series(gf, "turn_rate",
                                          step_s=3600).collect()}
        seg = (assemble_series(gf, "turn_rate", step_s=3600,
                               window="1 day")
               .orderBy("conv_id", "t0").collect())
        assert len(seg) > len(whole)  # multi-day convs split
        rebuilt = {}
        for r in seg:
            assert len(r["points"]) <= 24  # bounded by the window
            rebuilt.setdefault(r["conv_id"], []).extend(r["points"])
        for cid, pts in whole.items():
            np.testing.assert_allclose(rebuilt[cid], pts)


class TestGapfillProperties:
    """Property check of the gap-explode formulation against a pandas/numpy
    oracle on randomized sparse series (hypothesis-driven)."""

    def test_random_series_all_policies(self, spark):
        import numpy as np
        import pandas as pd
        from dynamicaxiswarping_jl_spark.operators import gapfill

        rng = np.random.default_rng(123)
        rows = []
        for conv in range(6):
            # sparse, sorted, distinct minute offsets
            offs = np.sort(rng.choice(200, size=rng.integers(2, 30),
                                      replace=False))
            for o in offs:
                ts = (pd.Timestamp("2024-01-01")
                      + pd.Timedelta(minutes=int(o))).to_pydatetime()
                rows.append((str(conv), ts, float(rng.integers(0, 50))))
        sdf = spark.createDataFrame(
            rows, "conv_id string, bucket timestamp, turn_rate double")
        pdf = pd.DataFrame(rows, columns=["conv_id", "bucket", "turn_rate"])

        for policy in ("zero", "locf", "interp"):
            got = (gapfill(sdf, 60, value_cols=("turn_rate",), policy=policy)
                   .orderBy("conv_id", "bucket").toPandas())
            frames = []
            for conv, g in pdf.groupby("conv_id"):
                g = g.sort_values("bucket").set_index("bucket")
                grid = pd.date_range(g.index.min(), g.index.max(), freq="1min")
                s = g["turn_rate"].reindex(grid)
                if policy == "zero":
                    s = s.fillna(0.0)
                elif policy == "locf":
                    s = s.ffill()
                else:
                    s = s.interpolate(method="time")
                frames.append(pd.DataFrame(
                    {"conv_id": conv, "bucket": grid, "turn_rate": s.values}))
            want = (pd.concat(frames).sort_values(["conv_id", "bucket"])
                    .reset_index(drop=True))
            np.testing.assert_allclose(
                got["turn_rate"].to_numpy(), want["turn_rate"].to_numpy(),
                rtol=1e-9, atol=1e-12, err_msg=policy)
            assert got["bucket"].tolist() == want["bucket"].tolist(), policy
