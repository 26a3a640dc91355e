#!/usr/bin/env python
"""Large-query-set dtwnn_search probe (VERDICT r03 #2).

Round 3's dtwnn_search collected ALL queries to the driver, shipped
them in the UDF closure, and ran the bsf seed DPs driver-side — a
driver bottleneck and a multi-MB closure at 1e4+ queries. This probe
synthesises a deterministic query batch (hash-derived, mixed lengths)
plus a series corpus JVM-side, runs the operator end-to-end (which
auto-selects the blocked cogroup path past ``max_closure_queries``),
and reports wall time and queries/sec. For evidence it also runs the
same batch through the legacy closure path when --compare is small
enough, asserting identical results.

    python scripts/dtwnn_query_scale_probe.py --n-queries 10000 \
        --n-series 500 --series-len 128

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


def synth(spark, n_series: int, series_len: int, n_queries: int):
    """Deterministic hash-derived corpus + query batch, JVM-side."""
    from pyspark.sql import functions as F

    def sine(idcol, m):
        h = F.xxhash64(idcol)
        fh = F.xxhash64(F.pmod(h, F.lit(64)).cast("string"))
        base = F.pmod(fh, F.lit(1000)).cast("double") / 100.0
        amp = 1.0 + F.pmod(fh + 1, F.lit(500)).cast("double") / 100.0
        freq = 0.05 + F.pmod(fh + 2, F.lit(400)).cast("double") / 1000.0
        return F.transform(
            F.sequence(F.lit(0), m - 1),
            lambda i: (base + amp * F.sin(i.cast("double") * freq)
                       + F.pmod(F.xxhash64(idcol, i), F.lit(97))
                       .cast("double") / 970.0))

    series = (spark.range(n_series)
              .select(F.concat(F.lit("s"), F.format_string("%06d", "id"))
                      .alias("conv_id"))
              .select("conv_id",
                      sine(F.col("conv_id"), F.lit(series_len))
                      .alias("points")))
    qlen = (F.lit(8) + F.pmod(F.xxhash64("query_id"), F.lit(25))).cast("int")
    queries = (spark.range(n_queries)
               .select(F.concat(F.lit("q"), F.format_string("%07d", "id"))
                       .alias("query_id"))
               .select("query_id", sine(F.col("query_id"), qlen).alias("q")))
    return series, queries


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-queries", type=int, default=10_000)
    p.add_argument("--n-series", type=int, default=500)
    p.add_argument("--series-len", type=int, default=128)
    p.add_argument("--radius", type=int, default=5)
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--compare", type=int, default=0,
                   help="also run the closure path and assert equal "
                        "results (feasible only for moderate sizes; "
                        "0 = skip)")
    p.add_argument("--op", choices=("nn", "profile"), default="nn",
                   help="nn = dtwnn_search; profile = distance_profile_op "
                        "(VERDICT r04 #2 — dense output, so size the "
                        "query/series counts accordingly)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    builder = SparkSession.builder.appName("dtwnn-query-scale-probe")
    if args.cpus:
        builder = builder.master(f"local[{args.cpus}]")
    spark = (builder
             .config("spark.driver.memory",
                     os.environ.get("SPARK_TSWARP_PROBE_MEM", "48g"))
             .config("spark.sql.shuffle.partitions", "64")
             .config("spark.sql.adaptive.enabled", "true")
             .getOrCreate())

    from dynamicaxiswarping_jl_spark.operators.dtw_ops import (
        distance_profile_op, dtwnn_search)
    from dynamicaxiswarping_jl_spark.plans import warm_python_workers

    warm_python_workers(spark)
    series, queries = synth(spark, args.n_series, args.series_len,
                            args.n_queries)
    series = series.localCheckpoint(eager=True)
    queries = queries.localCheckpoint(eager=True)

    op = (dtwnn_search if args.op == "nn" else distance_profile_op)
    t0 = time.time()
    out = op(queries, series, radius=args.radius)
    n_out = out.count()
    wall = time.time() - t0

    report = {
        "job": f"{args.op}_query_scale_probe",
        "n_queries": args.n_queries,
        "n_series": args.n_series,
        "series_len": args.series_len,
        "radius": args.radius,
        "wall_sec": round(wall, 1),
        "out_rows": n_out,
        "queries_per_sec": round(args.n_queries / wall, 1),
        "path": ("blocked" if args.n_queries > 512 else "closure"),
    }
    if args.compare:
        sq = queries.limit(args.compare).localCheckpoint(eager=True)
        cols = (["query_id", "cost", "conv_id", "loc"] if args.op == "nn"
                else ["query_id", "conv_id", "loc", "dist"])
        a = (op(sq, series, radius=args.radius, max_closure_queries=0)
             .select(*cols).toPandas()
             .sort_values(cols[:3]).reset_index(drop=True))
        # pin frame b to the CLOSURE path explicitly: auto-routing would
        # silently take the blocked path too for --compare > 512 and the
        # parity check would compare the blocked path against itself
        b = (op(sq, series, radius=args.radius,
                max_closure_queries=args.compare)
             .select(*cols).toPandas()
             .sort_values(cols[:3]).reset_index(drop=True))
        import pandas as pd
        pd.testing.assert_frame_equal(a, b)
        report["compare_queries"] = args.compare
        report["compare_equal"] = True
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
