#!/usr/bin/env python
"""North-rule scaling evidence via spark-submit.

Runs the FULL pipeline job (scripts/run_pipeline.py) through
``spark-submit --py-files dist/engine.zip`` at two parallelism levels on
the IDENTICAL synthetic input, and reports throughput at both plus the
per-core scaling efficiency:

    python scripts/scaling_submit.py [--low 2] [--high 8] [--n-conv 300]

Prints one JSON line:
    {"low": 2, "high": 8, "elapsed_low": ..., "elapsed_high": ...,
     "turns_per_sec_low": ..., "turns_per_sec_high": ...,
     "speedup": ..., "scaling_efficiency": ...}

The sandbox proxy for "N and 4N executors" is local[N] vs local[4N]
(same job, same input); on a real cluster the identical command takes
``--master yarn --num-executors N``.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(spark_submit: str, zip_path: str, cores: int, n_conv: int,
              seed: int, job: str = "pipeline", sf_dir: str = "",
              n_queries: int = 32, partitions: int = 32,
              dba_mode: str = "grouped", driver_memory: str = "",
              timeout: int = 1800) -> dict:
    # The job config (shuffle partitions, kernel-stage task count) is
    # PINNED across levels: on a real cluster, going from N to 4N
    # executors re-schedules the same task decomposition onto more slots
    # — it does not re-plan the job. Letting the decomposition follow the
    # core count would compare two different jobs (the NN search's
    # in-task best-so-far prunes more in bigger tasks, so the low leg
    # would measure genuinely less DP work).
    cmd = [
        spark_submit, "--master", f"local[{cores}]",
        "--conf", "spark.sql.shuffle.partitions=%d" % partitions,
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", zip_path,
    ]
    if driver_memory:
        cmd += ["--driver-memory", driver_memory]
    if job == "nn":
        cmd += [os.path.join(REPO, "scripts", "nn_search_job.py"),
                "--sf-dir", sf_dir, "--n-queries", str(n_queries),
                "--partitions", str(partitions)]
    else:
        workdir = tempfile.mkdtemp(prefix=f"scaling-{cores}-")
        cmd += [os.path.join(REPO, "scripts", "run_pipeline.py"),
                "--workdir", workdir, "--n-conv", str(n_conv),
                "--seed", str(seed), "--dba-mode", dba_mode]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         timeout=timeout)
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-4000:])
        raise SystemExit(f"spark-submit at local[{cores}] failed")
    last = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--low", type=int, default=2)
    p.add_argument("--high", type=int, default=8)
    p.add_argument("--n-conv", type=int, default=300)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--job", choices=["pipeline", "nn"], default="nn",
                   help="'nn' (default): the north-star NN-search job — "
                        "minutes of kernel CPU, the regime the efficiency "
                        "rule is about; 'pipeline': the rollup pipeline "
                        "(stage fixed costs dominate at sandbox sizes)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    p.add_argument("--n-queries", type=int, default=512,
                   help="probe size: longer jobs amortize fixed stage "
                        "costs; >= 512 keeps kernel CPU dominant now that "
                        "the cascade is C-batched")
    p.add_argument("--partitions", type=int, default=32,
                   help="task decomposition, identical at both levels "
                        "(cluster analogy: job config does not change "
                        "with executor count)")
    p.add_argument("--dba-mode", choices=["grouped", "distributed"],
                   default="grouped",
                   help="pipeline job only: passed through to "
                        "run_pipeline.py (distributed = the production "
                        "scale shape)")
    p.add_argument("--driver-memory", default="",
                   help="spark-submit --driver-memory for both levels "
                        "(local mode hosts all executor threads in the "
                        "driver JVM)")
    p.add_argument("--timeout", type=int, default=1800,
                   help="per-run spark-submit timeout, seconds")
    p.add_argument("--repeats", type=int, default=2,
                   help="runs per level, best wall kept — this host "
                        "carries external background load with 2-3x "
                        "spikes (CLAUDE.md), and a single-shot sample "
                        "lands the spike in whichever leg was unlucky; "
                        "best-of-N measures capacity, the quantity the "
                        "efficiency rule is about (same methodology as "
                        "bench.py's best-of-2 query walls)")
    args = p.parse_args()

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        raise SystemExit("spark-submit not on PATH")
    subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")],
                   check=True, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "engine.zip")

    def best_of(cores: int) -> dict:
        runs = [run_level(spark_submit, zip_path, cores, args.n_conv,
                          args.seed, args.job, args.sf_dir, args.n_queries,
                          args.partitions, args.dba_mode,
                          args.driver_memory, args.timeout)
                for _ in range(max(1, args.repeats))]
        return min(runs, key=lambda r: r["elapsed_sec"])

    lo = best_of(args.low)
    hi = best_of(args.high)
    assert lo["turns"] == hi["turns"], "levels must process identical input"
    speedup = lo["elapsed_sec"] / hi["elapsed_sec"]
    eff = speedup / (args.high / args.low)
    print(json.dumps({
        "job": args.job,
        "low": args.low, "high": args.high, "turns": lo["turns"],
        "elapsed_low": lo["elapsed_sec"], "elapsed_high": hi["elapsed_sec"],
        "turns_per_sec_low": lo["turns_per_sec"],
        "turns_per_sec_high": hi["turns_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
