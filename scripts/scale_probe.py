#!/usr/bin/env python
"""10x scale validation probe (VERDICT r02 #2).

Runs the grid-bucketed exact k-NN (operators/dtw_ops.knn_topk) at
>= 1e5 series and reports the MEASURED candidate-set sizes against the
PLANS.md sizing model ("k-NN grid path": ~9 x cell occupancy candidates
per id before the top-(k*oversample) cut, never O(n^2)), plus wall
time, pairs/sec, and total shuffle read/write taken from Spark's own
REST metrics endpoint (localhost UI, local mode).

The corpus is synthesised deterministically JVM-side (hash-derived
sine-family series; no external data, no RNG):

    python scripts/scale_probe.py --n-series 100000 --length 128
    python scripts/scale_probe.py --n-series 100000 --mixed-lengths

``--mixed-lengths`` draws each series' length from the 16 hash-derived
values 64 + 8k, k in 0..15 (i.e. {64, 72, ..., 184}), exercising the
tau-bounded cross-length residue
path at scale (VERDICT r02 "what's wrong" #1) instead of the
uniform-length grid fast path.

Prints one JSON line with everything measured.
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


def synth_series(spark, n: int, length: int, mixed: bool,
                 families: int = 256):
    """Deterministic synthetic corpus: id -> hash-parameterised series.

    Cluster-structured like real rollup corpora (fakedata_gaussian-style
    planted families): each series draws its sine params from one of
    ``families`` shape families (hash-assigned) plus a small per-id
    jitter, so every id has ~n/families near neighbours — the regime
    the per-id tau bound is designed for. All JVM-side
    (sequence/transform over hash-derived scalars): the generator must
    not bottleneck a 1e5-series probe, and determinism (pure functions
    of conv_id) keeps reruns comparable.
    """
    from pyspark.sql import functions as F

    ids = (spark.range(n)
           .select(F.concat(F.lit("s"), F.format_string("%07d", "id"))
                   .alias("conv_id")))
    h = F.xxhash64("conv_id")
    fam = F.pmod(h, F.lit(families))
    fh = F.xxhash64(fam.cast("string"))
    jitter = F.pmod(h + 7, F.lit(1000)).cast("double") / 1000.0  # [0,1)
    base = (F.pmod(fh, F.lit(1000)).cast("double") / 100.0) + jitter * 0.2
    amp = (1.0 + F.pmod(fh + 1, F.lit(500)).cast("double") / 100.0
           + jitter * 0.1)
    freq = 0.05 + (F.pmod(fh + 2, F.lit(400)).cast("double") / 1000.0)
    if mixed:
        m = (F.lit(64) + F.pmod(h + 3, F.lit(16)) * F.lit(8)).cast("int")
    else:
        m = F.lit(length)
    pts = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda i: (base + amp * F.sin(i.cast("double") * freq)
                   + F.pmod(F.xxhash64("conv_id", i), F.lit(97))
                   .cast("double") / 970.0))
    return ids.select("conv_id", pts.alias("points"))


def shuffle_totals(spark) -> dict:
    """Sum shuffle read/write bytes over all completed stages via the
    local UI REST API (public Spark monitoring endpoint)."""
    import urllib.request

    try:
        ui = spark.sparkContext.uiWebUrl
        if not ui:
            return {}
        apps = json.load(urllib.request.urlopen(
            ui + "/api/v1/applications", timeout=10))
        app_id = apps[0]["id"]
        stages = json.load(urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
            timeout=30))
        slowest = sorted(stages, key=lambda s: -s.get("executorRunTime", 0))
        return {
            "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0)
                                       for s in stages),
            "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0)
                                      for s in stages),
            "stages": len(stages),
            "slowest_stages": [
                {"id": s["stageId"],
                 "cpu_sec": round(s.get("executorRunTime", 0) / 1000),
                 "tasks": s.get("numCompleteTasks"),
                 "in_rows": s.get("inputRecords", 0)
                 + s.get("shuffleReadRecords", 0),
                 "name": (s.get("name") or "")[:60]}
                for s in slowest[:6]],
        }
    except Exception as exc:  # metrics are best-effort evidence
        return {"shuffle_metrics_error": str(exc)[:200]}


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--n-series", type=int, default=100_000)
    p.add_argument("--length", type=int, default=128)
    p.add_argument("--mixed-lengths", action="store_true")
    p.add_argument("--families", type=int, default=256,
                   help="shape families (cluster structure); each id has "
                        "~n/families near neighbours")
    p.add_argument("--k", type=int, default=4)
    p.add_argument("--radius", type=int, default=5)
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument("--no-stats", action="store_true",
                   help="production-shape run: skip the candidate-count "
                        "instrumentation (its extra count jobs re-run "
                        "the enumeration); wall_sec is then the honest "
                        "operator wall")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        spark = active
    else:
        builder = SparkSession.builder.appName("knn-scale-probe")
        if args.cpus:
            builder = builder.master(f"local[{args.cpus}]")
        spark = (builder
                 .config("spark.driver.memory",
                         os.environ.get("SPARK_TSWARP_PROBE_MEM", "48g"))
                 .config("spark.sql.shuffle.partitions", "64")
                 .config("spark.sql.adaptive.enabled", "true")
                 .config("spark.sql.execution.arrow.pyspark.enabled", "true")
                 .getOrCreate())

    from dynamicaxiswarping_jl_spark.operators.dtw_ops import knn_topk
    from dynamicaxiswarping_jl_spark.plans import warm_python_workers

    warm_python_workers(spark)
    series = synth_series(spark, args.n_series, args.length,
                          args.mixed_lengths,
                          args.families).localCheckpoint(eager=True)

    stats: dict = {}
    t0 = time.time()
    out = knn_topk(series, k=args.k, radius=args.radius,
                   stats_out=None if args.no_stats else stats)
    n_out = out.count()
    wall = time.time() - t0

    n = args.n_series
    exact_pairs = (stats.get("phase1_pairs", 0)
                   + stats.get("phase2_pairs", 0)
                   + stats.get("boot_pairs", 0)
                   + stats.get("residue_pairs", 0))
    occupancy = (stats.get("n_grid_eligible", n)
                 / max(stats.get("grid_cells_per_axis", 1) ** 2, 1))
    report = {
        "job": "knn_scale_probe",
        "n_series": n,
        "families": args.families,
        "mixed_lengths": bool(args.mixed_lengths),
        "k": args.k,
        "radius": args.radius,
        "wall_sec": round(wall, 1),
        "out_rows": n_out,
        **stats,
        "exact_dp_pairs_total": exact_pairs,
        "exact_dp_pairs_per_id": round(exact_pairs / n, 1),
        "candidates_per_id_phase1": round(
            stats.get("phase1_pairs", 0) / n, 1),
        "predicted_phase1_per_id_plansmd": round(9 * occupancy, 1),
        "grid_occupancy": round(occupancy, 1),
        "pairs_frac_of_allpairs": round(
            exact_pairs / (n * (n - 1)), 6),
        "dp_pairs_per_sec": round(exact_pairs / wall),
        **shuffle_totals(spark),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
