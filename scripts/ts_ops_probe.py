#!/usr/bin/env python
"""Scale probe for the round-4 time-series operators.

Synthesizes N events for K users entirely JVM-side (spark.range +
hash-derived timestamps — no disk, no Python), then measures each
operator end-to-end (noop sink) at local[CPUS]:

- asof_join: events → most recent busy hour (union-marker plan)
- rolling_stats: trailing-24 stats over the hourly tier
- delta_rate: bucket-over-bucket counters over the hourly tier
- quantile_rollup: per-hour exact p50/p95 of minute counts
- lttb + ewma: per-user series kernels over assembled hourly series

    python scripts/ts_ops_probe.py --n-events 20000000 --n-users 100000

Prints one JSON line {op: {wall_sec, rows_in, rows_out, rows_per_sec}}.
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
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n-events", type=int, default=20_000_000)
    p.add_argument("--n-users", type=int, default=100_000)
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--span-hours", type=int, default=24 * 30,
                   help="event timestamps spread over this many hours")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F
    from dynamicaxiswarping_jl_spark.plans import get_spark
    from dynamicaxiswarping_jl_spark.operators import (
        asof_join, rolling_stats, quantile_rollup, assemble_series,
        lttb_downsample, ewma_smooth)
    from dynamicaxiswarping_jl_spark.operators.rolling import delta_rate

    spark = get_spark("ts-ops-probe", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic events, fully JVM-side: user and timestamp
    # derive from xxhash64(id) so the layout is shuffled like real data
    n, k, span_s = args.n_events, args.n_users, args.span_hours * 3600
    ev = (spark.range(n)
          .select(F.col("id").alias("event_id"),
                  F.pmod(F.xxhash64("id"), F.lit(k)).alias("user_id"),
                  (F.lit("2025-01-01 00:00:00").cast("timestamp")
                   + F.make_interval(secs=F.pmod(F.xxhash64("id", F.lit(1)),
                                                 F.lit(span_s)).cast("double"))
                   ).alias("ts"))
          .cache())
    ev.count()

    t1m = (ev.groupBy("user_id", F.window("ts", "1 minute").alias("w"))
           .agg(F.count(F.lit(1)).alias("n_events"))
           .select("user_id", F.col("w.start").alias("bucket"), "n_events"))
    t1h = (ev.groupBy("user_id", F.window("ts", "1 hour").alias("w"))
           .agg(F.count(F.lit(1)).alias("n_events"))
           .select("user_id", F.col("w.start").alias("bucket"), "n_events")
           .cache())
    n_1h = t1h.count()

    out = {"n_events": n, "n_users": k, "tier_1h_rows": n_1h,
           "cpus": args.cpus}

    def timed(name, df, rows_in):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        out[name] = {"wall_sec": round(w, 2),
                     "rows_in": rows_in,
                     "rows_in_per_sec": round(rows_in / w)}

    busy = (t1h.filter(F.col("n_events") >= 3)
            .withColumnRenamed("n_events", "busy_events"))
    timed("asof_join", asof_join(ev, busy, "user_id", "ts", "bucket",
                                 how="inner", matched_ts_col="asof_bucket"), n)
    timed("rolling_stats", rolling_stats(t1h, "n_events", key="user_id",
                                         bucket_col="bucket", n_rows=24), n_1h)
    timed("delta_rate", delta_rate(t1h, "n_events", key="user_id",
                                   bucket_col="bucket"), n_1h)
    timed("quantile_rollup", quantile_rollup(t1m, "1h", (0.5, 0.95),
                                             value_col="n_events",
                                             key="user_id"), n)
    series = assemble_series(
        t1h.select(F.col("user_id").cast("string").alias("conv_id"),
                   "bucket",
                   F.col("n_events").cast("double").alias("turn_rate")),
        "turn_rate", step_s=3600)
    timed("lttb_downsample", lttb_downsample(series, m=48), n_1h)
    timed("ewma_smooth", ewma_smooth(series, alpha=0.25), n_1h)

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
