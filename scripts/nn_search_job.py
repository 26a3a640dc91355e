#!/usr/bin/env python
"""North-star NN-search job — spark-submit entry for the scaling rule.

Loads the events table, rolls it to gap-filled 1h per-user series, then
searches ``--n-queries`` query patterns (drawn deterministically from the
corpus) across every series with the LB-pruned banded-DTW kernel. Prints
one JSON line with wall time and queries/sec, timed AFTER Python-worker
warm-up so the measurement is the search job, not process startup.

    spark-submit --master local[8] --py-files dist/engine.zip \
        scripts/nn_search_job.py --sf-dir /root/testdata/sf0.1 \
        --n-queries 32
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--n-queries", type=int, default=32)
    p.add_argument("--radius", type=int, default=5)
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--partitions", type=int, default=None,
                   help="pin the series task count (use the SAME value at "
                        "both parallelism levels for scaling evidence — "
                        "the in-task best-so-far makes pruning depend on "
                        "task size, so unequal decompositions measure "
                        "different amounts of DP work)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        builder = SparkSession.builder.appName("spark-ts-warp-nn")
        if args.cpus:
            builder = builder.master(f"local[{args.cpus}]")
        spark = (builder
                 .config("spark.sql.session.timeZone", "UTC")
                 .config("spark.sql.adaptive.enabled", "true")
                 .config("spark.sql.execution.arrow.pyspark.enabled", "true")
                 .getOrCreate())

    from dynamicaxiswarping_jl_spark.operators import (
        rollup_turns, cascade, gapfill, assemble_series, dtwnn_search)

    ev = (spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
          .select(F.col("user_id").cast("string").alias("conv_id"), "ts",
                  F.lit(None).cast("string").alias("tool")))
    series = assemble_series(
        gapfill(cascade(rollup_turns(ev, "1m"), "1h"), 3600, policy="zero"),
        "turn_rate", step_s=3600).cache()
    n_series = series.count()
    sample = series.orderBy("conv_id").limit(args.n_queries).collect()
    queries = spark.createDataFrame(
        [(f"q{i}", [float(v) for v in row["points"][i % 4:i % 4 + 24]])
         for i, row in enumerate(sample) if len(row["points"]) >= 28],
        "query_id string, q array<double>")
    nq = queries.count()

    from dynamicaxiswarping_jl_spark.plans import warm_python_workers
    warm_python_workers(spark)

    t0 = time.time()
    (dtwnn_search(queries, series, radius=args.radius,
                  partitions=args.partitions)
     .write.format("noop").mode("overwrite").save())
    elapsed = time.time() - t0
    print(json.dumps({
        "n_series": n_series, "n_queries": nq,
        "elapsed_sec": round(elapsed, 3),
        "nn_qps": round(nq / elapsed, 3),
        # scaling_submit.py keys on turns/elapsed: expose aliases
        "turns": nq, "turns_per_sec": round(nq / elapsed, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
