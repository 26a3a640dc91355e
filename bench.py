"""Benchmark harness.

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Extra keys: rollup_turns_per_sec (north-star rollup throughput),
dtwnn_queries_per_sec (north-star NN throughput).

``--scaling``: additionally run the scaling probe — the same rollup+drift
job at local[8] and local[32] on identical input — and report per-core
scaling efficiency (sandbox proxy for the N→4N executor rule; see
BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_label(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def build_session(cpus: int) -> SparkSession:
    from dynamicaxiswarping_jl_spark.plans import get_spark
    return get_spark("bench", cpus=cpus)


def run_headline(spark: SparkSession, sf_dir: str):
    """Time each headline query; return (timings dict, throughput dict)."""
    import __spark_entry__ as E

    qs = E.queries()
    headline = [
        "rollup_1m", "rollup_1h_cascade", "gapfill_zero", "sessionize",
        "topk_minutes", "tpch_q1", "nation_revenue", "dedup_exact",
        "token_stats", "cosine_topk", "minhash_pairs",
        "drift_1h_1d", "dtwnn_series", "gorilla_roundtrip",
    ]
    timings = {}
    for name in headline:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    # --- north-star throughputs ---
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    n_events = ev.count()
    thr = {"rollup_turns_per_sec":
           round(n_events / max(timings["rollup_1m"], 1e-9))}

    # NN queries/sec: many short queries against the rolled 1h series
    from dynamicaxiswarping_jl_spark.operators import (
        rollup_turns, gapfill, assemble_series, dtwnn_search)
    evs = ev.select(F.col("user_id").cast("string").alias("conv_id"), "ts",
                    F.lit(None).cast("string").alias("tool"))
    series = assemble_series(
        gapfill(rollup_turns(evs, "1h"), 3600, policy="zero"),
        "turn_rate", step_s=3600).cache()
    series.count()
    sample = series.orderBy("conv_id").limit(8).collect()
    queries = spark.createDataFrame(
        [(f"q{i}", [float(v) for v in row["points"][:24]])
         for i, row in enumerate(sample) if len(row["points"]) >= 24],
        "query_id string, q array<double>")
    nq = queries.count()
    t0 = time.time()
    dtwnn_search(queries, series, radius=5).write.format("noop").mode("overwrite").save()
    nn_sec = time.time() - t0
    thr["dtwnn_queries_per_sec"] = round(nq / max(nn_sec, 1e-9), 3)
    timings["dtwnn_batch"] = round(nn_sec, 3)
    series.unpersist()
    return timings, thr


def run_scaling(sf_dir: str, low: int = 8, high: int = 32):
    """Same job, same input, two parallelism levels → per-core efficiency."""
    import __spark_entry__ as E

    results = {}
    for cpus in (low, high):
        spark = build_session(cpus)
        try:
            t0 = time.time()
            E.queries()["drift_1h_1d"](spark, sf_dir).write.format("noop").mode("overwrite").save()
            E.queries()["rollup_1m"](spark, sf_dir).write.format("noop").mode("overwrite").save()
            results[cpus] = time.time() - t0
        finally:
            spark.stop()
    speedup = results[low] / results[high]
    efficiency = speedup / (high / low)
    return {f"wall_sec_local{low}": round(results[low], 3),
            f"wall_sec_local{high}": round(results[high], 3),
            "speedup": round(speedup, 3),
            "scaling_efficiency": round(efficiency, 3)}


def main():
    scaling = "--scaling" in sys.argv
    out = {
        "metric": "headline suite wall time",
        "unit": "sec",
        "sf": _sf_label(SF_DIR),
        "cpus": CPUS,
    }
    spark = build_session(CPUS)
    try:
        timings, thr = run_headline(spark, SF_DIR)
    finally:
        spark.stop()
    out["queries"] = timings
    out["value"] = round(sum(v for k, v in timings.items()
                             if k != "dtwnn_batch"), 3)
    out.update(thr)
    if scaling:
        out["scaling"] = run_scaling(SF_DIR)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
