#!/usr/bin/env python
"""Skew adversarial probe (VERDICT r03 #7): ONE conversation with 1e6
turns through the full rollup pipeline vs a uniform corpus with the SAME
total turn count.

The north rule names zipf turn-count skew as the adversarial axis. This
probe runs both shapes through rollup 1m -> 1h -> 1d cascades ->
gap-fill -> Gorilla chunks -> windowed series assembly and reports both
walls, their ratio (the bar: skewed <= 2x uniform), and per-stage
max-task concentration from Spark's REST metrics (a stage whose single
task consumed ~all input rows is a serialization point).

    python scripts/skew_probe.py --turns 1000000

Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (
    _REPO + os.pathsep + os.environ.get("PYTHONPATH", ""))


def synth_turns(spark, total: int, n_conv: int):
    """Deterministic JVM-side turn table: ``total`` turns split evenly
    over ``n_conv`` conversations (n_conv=1 = the adversarial shape),
    one turn every 2.6s so 1e6 turns span ~a month."""
    from pyspark.sql import functions as F

    per = total // n_conv
    t = (spark.range(total, numPartitions=64)
         .withColumn("conv_id", F.concat(
             F.lit("conv-"), F.format_string(
                 "%05d", (F.col("id") / per).cast("int"))))
         .withColumn("turn_idx", (F.col("id") % per).cast("int"))
         .withColumn("role", F.when(F.col("id") % 2 == 0, "user")
                     .otherwise("assistant"))
         .withColumn("text", F.concat(F.lit("turn "),
                                      F.col("id").cast("string")))
         .withColumn("tool", F.when(F.col("id") % 7 == 0, "search")
                     .otherwise(None).cast("string"))
         .withColumn("ts", F.timestamp_seconds(
             F.lit(1735689600) + F.col("turn_idx") * 2.6)))
    return t.select("conv_id", "turn_idx", "role", "text", "tool", "ts")


def run_pipeline(spark, turns):
    from pyspark.sql import functions as F

    from dynamicaxiswarping_jl_spark.operators import (
        rollup_turns, cascade, gapfill, compress_chunks, assemble_series,
        sessionize_events)

    t0 = time.time()
    n_sess = (sessionize_events(turns, key="conv_id", ts_col="ts",
                                gap_s=1800)
              .agg(F.sum("n_sessions")).first()[0])
    tier1m = rollup_turns(turns, "1m").localCheckpoint(eager=True)
    tier1h = cascade(tier1m, "1h").localCheckpoint(eager=True)
    n1d = cascade(tier1h, "1d").count()
    filled = gapfill(tier1m, step_s=60, policy="zero")
    nf = filled.count()
    chunks = compress_chunks(tier1m, "1m", chunk="1 hour")
    nc = chunks.count()
    ser = assemble_series(tier1m, window="7 days")
    ns = ser.count()
    wall = time.time() - t0
    return wall, {"sessions": int(n_sess or 0), "tier_1d_rows": n1d,
                  "gapfill_rows": nf, "chunk_rows": nc, "series_rows": ns}


def stage_concentration(spark, min_stage: int = 0) -> list:
    """Stages (id >= min_stage) where one task consumed >50% of the
    stage's input rows, or a >=10k-row stage ran as a single task — the
    serialization fingerprint. Callers diff the skewed run against the
    uniform run's list: a stage shape present in BOTH runs at the same
    size is byte-appropriate AQE coalescing of a small table, not key
    concentration."""
    import urllib.request

    try:
        ui = spark.sparkContext.uiWebUrl
        apps = json.load(urllib.request.urlopen(
            ui + "/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30))
        stages = [s for s in stages if s["stageId"] >= min_stage]
        hot = []
        for s in stages:
            rows = s.get("inputRecords", 0) + s.get("shuffleReadRecords", 0)
            if rows < 10_000:
                continue
            sid = s["stageId"]
            det = json.load(urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages/{sid}"
                f"?details=false&withSummaries=true", timeout=30))
            for att in det if isinstance(det, list) else [det]:
                q = (att.get("taskMetricsDistributions") or {})
                mx_in = (q.get("inputMetrics") or {}).get("recordsRead",
                                                          [0])[-1]
                mx_sh = (q.get("shuffleReadMetrics") or {}).get(
                    "readRecords", [0, 0, 0, 0, 0])[-1]
                mx = max(mx_in or 0, mx_sh or 0)
                ntask = att.get("numCompleteTasks", 1)
                # a single-task stage over many rows IS the fingerprint
                # (an AQE-coalesced window over one hot key has exactly
                # one task); multi-task stages flag on max-task share
                if (ntask == 1 and rows >= 10_000) or \
                        (ntask > 1 and mx > 0.5 * rows):
                    hot.append({"stage": sid, "tasks": ntask,
                                "rows": rows, "max_task_rows": int(mx),
                                "name": (att.get("name") or "")[:50]})
        return hot
    except Exception as exc:
        return [{"metrics_error": str(exc)[:150]}]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--turns", type=int, default=1_000_000)
    p.add_argument("--uniform-convs", type=int, default=1000)
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("skew-probe")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = (builder
             .config("spark.driver.memory",
                     os.environ.get("SPARK_TSWARP_PROBE_MEM", "48g"))
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())

    from dynamicaxiswarping_jl_spark.plans import warm_python_workers
    warm_python_workers(spark)

    uni = synth_turns(spark, args.turns,
                      args.uniform_convs).localCheckpoint(eager=True)
    w_uni, c_uni = run_pipeline(spark, uni)
    hot_uni = stage_concentration(spark)
    # watermark = max stage id after the uniform run, so the skewed
    # run's stage list is isolated
    watermark = 0
    import urllib.request
    try:
        ui = spark.sparkContext.uiWebUrl
        apps = json.load(urllib.request.urlopen(
            ui + "/api/v1/applications", timeout=10))
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{apps[0]['id']}/stages",
            timeout=30))
        watermark = 1 + max((s["stageId"] for s in stages), default=0)
    except Exception:
        pass
    skew = synth_turns(spark, args.turns, 1).localCheckpoint(eager=True)
    w_skew, c_skew = run_pipeline(spark, skew)
    hot_skew = stage_concentration(spark, min_stage=watermark)
    # a stage shape (rows within 5%) that already ran single-task on the
    # UNIFORM corpus is byte-appropriate AQE coalescing, not skew
    uni_sizes = [s.get("rows", 0) for s in hot_uni]
    skew_only = [s for s in hot_skew
                 if not any(abs(s.get("rows", 0) - r) <= 0.05 * max(r, 1)
                            for r in uni_sizes)]

    print(json.dumps({
        "job": "skew_probe", "turns": args.turns,
        "uniform_convs": args.uniform_convs,
        "wall_uniform_sec": round(w_uni, 1),
        "wall_skewed_sec": round(w_skew, 1),
        "ratio": round(w_skew / max(w_uni, 1e-9), 2),
        "bar_2x_met": bool(w_skew <= 2 * w_uni),
        "uniform_counts": c_uni, "skewed_counts": c_skew,
        "concentrated_stages_uniform": hot_uni,
        "concentrated_stages_skewed": hot_skew,
        "skew_specific_stages": skew_only,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
