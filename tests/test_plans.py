"""Physical-plan quality gates: pushdown, pruning, codegen, broadcast.

These assert the *plan*, not the result — the properties that decide whether
the same query survives a 100× scale-up (SURVEY.md §4.2).
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from dynamicaxiswarping_jl_spark.operators import rollup_turns

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


class TestPlanQuality:
    def test_rollup_prunes_columns(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        evs = ev.select(F.col("user_id").cast("string").alias("conv_id"), "ts",
                        F.lit(None).cast("string").alias("tool"))
        plan = plan_of(rollup_turns(evs, "1m"))
        # scan must read only ts + user_id — not value/props/event_type
        assert "ReadSchema" in plan
        read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
        assert "props" not in read_schema
        assert "value" not in read_schema
        assert "event_type" not in read_schema

    def test_filter_pushdown_reaches_scan(self, spark):
        li = spark.read.parquet(f"{SF}/lineitem.parquet")
        q = li.filter(F.col("l_shipdate") <= F.lit("1998-09-01")) \
              .select("l_returnflag")
        plan = plan_of(q)
        assert "PushedFilters" in plan
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
        assert "l_shipdate" in pushed

    def test_rollup_single_shuffle(self, spark):
        ev = spark.read.parquet(f"{SF}/events.parquet")
        evs = ev.select(F.col("user_id").cast("string").alias("conv_id"), "ts",
                        F.lit(None).cast("string").alias("tool"))
        plan = plan_of(rollup_turns(evs, "1m"))
        # partial agg before the single exchange (map-side combine);
        # (AQE's pre-execution formatted plan hides codegen spans, so assert
        # the aggregate structure instead)
        import re
        n_exchanges = len(re.findall(r"^\(\d+\) Exchange", plan, re.M))
        assert n_exchanges == 1
        assert "partial_count" in plan

    def test_nation_revenue_broadcasts_dims(self, spark):
        plan = plan_of(E.queries()["nation_revenue"](spark, SF))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_text_ops_stay_jvm_side(self, spark):
        # token/quality/lang/fingerprint must not contain python UDF nodes
        for name in ("token_stats", "quality_score", "language_id",
                     "fingerprint_dupes"):
            plan = plan_of(E.queries()[name](spark, SF))
            assert "BatchEvalPython" not in plan, name
            assert "ArrowEvalPython" not in plan, name

    def test_cosine_scoring_jvm_side(self, spark):
        plan = plan_of(E.queries()["cosine_topk"](spark, SF))
        # dot products are higher-order aggregate expressions, not UDFs
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan


class TestSpreadPlan:
    """_spread must (a) never probe .rdd on a plan with exchanges — under
    AQE that conversion MATERIALIZES the upstream query stages, running
    the lineage twice — and (b) reach its target with a narrow coalesce
    (no shuffle, no stage boundary) when the input is an exchange-free
    read (cached frame / file scan) that is already wide enough."""

    def test_exchange_free_classifier(self, spark):
        from dynamicaxiswarping_jl_spark.operators.dtw_ops import (
            _plan_is_exchange_free)
        ev = spark.read.parquet(f"{SF}/events.parquet")
        assert _plan_is_exchange_free(ev)                       # file scan
        agg = ev.groupBy("event_type").count()
        assert not _plan_is_exchange_free(agg)                  # shuffle agg
        cached = ev.select("user_id", "ts").cache()
        try:
            cached.count()
            # narrow projection over the cache: InMemoryTableScan leaf —
            # the exchange that BUILT the cache must not count
            assert _plan_is_exchange_free(cached.select("user_id"))
            joined = cached.alias("a").join(
                cached.alias("b"), "user_id")
            assert not _plan_is_exchange_free(joined)           # join
        finally:
            cached.unpersist()

    def test_subquery_bearing_plan_is_not_exchange_free(self, spark):
        """A scalar subquery's plan runs eagerly on .rdd conversion even
        when the main tree has no Exchange — the classifier must send
        such frames down the repartition path, never the probe."""
        from dynamicaxiswarping_jl_spark.operators.dtw_ops import (
            _plan_is_exchange_free)
        ev = spark.read.parquet(f"{SF}/events.parquet")
        ev.createOrReplaceTempView("_sq_events")
        sub = spark.sql(
            "SELECT user_id, ts FROM _sq_events "
            "WHERE user_id > (SELECT avg(user_id) FROM _sq_events)")
        assert not _plan_is_exchange_free(sub)

    def test_spread_narrow_on_wide_cache_shuffle_on_join(self, spark):
        from dynamicaxiswarping_jl_spark.operators.dtw_ops import _spread
        ev = spark.read.parquet(f"{SF}/events.parquet")
        wide = ev.select("user_id", "ts").repartition(64).cache()
        try:
            wide.count()
            target = spark.sparkContext.defaultParallelism
            narrow = _spread(wide.select("user_id"), factor=1)
            # only the plan ABOVE the cache leaf counts — the
            # InMemoryRelation's description embeds the repartition that
            # originally built the cache
            plan_top = plan_of(narrow).split("InMemoryRelation")[0]
            assert "Coalesce" in plan_top
            assert "RoundRobinPartitioning" not in plan_top
            assert narrow.rdd.getNumPartitions() == target
            joined = wide.alias("a").join(wide.alias("b"), "user_id")
            plan_j = plan_of(_spread(joined, factor=1))
            assert "RoundRobinPartitioning" in plan_j
        finally:
            wide.unpersist()
