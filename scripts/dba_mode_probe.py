#!/usr/bin/env python
"""Stage-only comparison of the two DBA-representative plans at pipeline
scale, reusing a run_pipeline.py workdir's checkpointed series table.

    spark-submit --master local[32] --driver-memory 64g \
        scripts/dba_mode_probe.py --series <workdir>/series_1h/data \
        [--modes grouped,distributed] [--limit N]

Prints one JSON line per mode: wall, rows, and per-group
(cost, iterations, n_members) so the two plans' outputs can be compared
directly (centers agree to float reassociation — see
tests/test_spark_dtw.py::test_reps_distributed_matches_per_group).
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


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--series", required=True,
                   help="parquet dir with (conv_id, points) rows")
    p.add_argument("--modes", default="grouped,distributed")
    p.add_argument("--groups", type=int, default=8)
    p.add_argument("--limit", type=int, default=None,
                   help="optional row cap for quick runs")
    p.add_argument("--cpus", type=int, default=None)
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    builder = SparkSession.builder.appName("dba-mode-probe")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = (builder
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())

    from dynamicaxiswarping_jl_spark.operators import (
        dba_per_group, dba_reps_distributed)
    from dynamicaxiswarping_jl_spark.plans import warm_python_workers

    warm_python_workers(spark)
    series = spark.read.parquet(args.series).select("conv_id", "points")
    if args.limit:
        series = series.limit(args.limit)
    grouped = series.withColumn(
        "group_id",
        F.pmod(F.xxhash64("conv_id"), F.lit(args.groups)).cast("string"))
    grouped = grouped.cache()
    n = grouped.count()  # materialize the cache outside the timed region

    for mode in args.modes.split(","):
        fn = dba_per_group if mode == "grouped" else dba_reps_distributed
        t0 = time.time()
        reps = sorted(fn(grouped, "group_id").collect(),
                      key=lambda r: r["group_id"])
        wall = time.time() - t0
        print(json.dumps({
            "mode": mode, "wall_sec": round(wall, 1), "n_series": n,
            "groups": [{"g": r["group_id"], "cost": r["cost"],
                        "it": r["iterations"], "n": r["n_members"]}
                       for r in reps]}))
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
