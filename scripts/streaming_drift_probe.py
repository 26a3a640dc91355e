"""Scale probe for streaming/drift.streaming_drift.

Synthesises N conversations x (n_windows x window_buckets) one-minute
buckets (deterministic hash values), runs them through the monitor in
one availableNow pass plus a sentinel pass to close trailing windows,
and reports wall + emitted-drift throughput. The per-key state is small
(last window vector + open buckets), so the stage's scale axis is the
shuffle of (conv_id → state partition) — standard stateful-streaming
sizing, nothing custom.

Usage: python scripts/streaming_drift_probe.py [--n-conv 20000]
       [--windows 3] [--cpus 32]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-conv", type=int, default=20000)
    ap.add_argument("--windows", type=int, default=3)
    ap.add_argument("--window-buckets", type=int, default=32)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("streaming_drift_probe")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_TSWARP_PROBE_MEM", "24g"))
             .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    from dynamicaxiswarping_jl_spark.plans import warm_python_workers
    from dynamicaxiswarping_jl_spark.streaming import streaming_drift

    warm_python_workers(spark)
    W = args.window_buckets
    n_buckets = args.windows * W
    work = tempfile.mkdtemp(prefix="sdrift_")
    src, out, ckpt = (os.path.join(work, d)
                      for d in ("src", "out", "ckpt"))
    # deterministic bucket values; every conv covers the same span
    rows = (spark.range(args.n_conv)
            .select(F.concat(F.lit("c"), F.col("id")).alias("conv_id"),
                    F.explode(F.sequence(
                        F.lit(0), F.lit(n_buckets - 1))).alias("m"))
            .select("conv_id",
                    (F.to_timestamp(F.lit("2025-06-01 00:00:00"))
                     + F.make_interval(mins=F.col("m"))).alias("bucket"),
                    (F.pmod(F.xxhash64("conv_id", "m"), F.lit(17))
                     .cast("double") / 4.0).alias("turn_rate")))
    rows.write.mode("overwrite").parquet(src)
    n_rows = args.n_conv * n_buckets

    def run_once():
        stream = (spark.readStream.schema(
            "conv_id string, bucket timestamp, turn_rate double")
            .option("maxFilesPerTrigger", 1_000_000).parquet(src))
        q = (streaming_drift(stream, window_buckets=W, radius=5,
                             watermark="30 minutes")
             .writeStream.outputMode("append")
             .option("checkpointLocation", ckpt)
             .format("parquet").option("path", out)
             .trigger(availableNow=True).start())
        q.awaitTermination(1200)

    t0 = time.time()
    run_once()
    # sentinel advances the watermark so trailing windows close
    (spark.createDataFrame(
        [("zz", "2025-06-03 00:00:00", 0.0)],
        "conv_id string, bucket string, turn_rate double")
     .select("conv_id", F.to_timestamp("bucket").alias("bucket"),
             "turn_rate")
     .write.mode("append").parquet(src))
    run_once()
    run_once()  # timeout pass fires on the advanced watermark
    wall = time.time() - t0
    n_drift = (spark.read.parquet(out)
               .filter(F.col("conv_id") != "zz").count())
    expected = args.n_conv * (args.windows - 1)
    report = {
        "job": "streaming_drift_probe",
        "n_conv": args.n_conv,
        "bucket_rows": n_rows,
        "windows": args.windows,
        "window_buckets": W,
        "wall_sec": round(wall, 1),
        "drift_rows": n_drift,
        "drift_rows_expected": expected,
        "bucket_rows_per_sec": round(n_rows / wall, 1),
    }
    print(json.dumps(report))
    shutil.rmtree(work, ignore_errors=True)
    spark.stop()
    return 0 if n_drift == expected else 1


if __name__ == "__main__":
    sys.exit(main())
