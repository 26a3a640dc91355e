#!/usr/bin/env python
"""No-Spark hardware-ceiling probe for the NN cascade (N -> 4N cores).

The N->4N scaling rule is about what the ENGINE adds on top of the
hardware. The round-3 C cascade is memory-bandwidth bound (float64 runs
at float32 speed), and sibling cores on one box share one memory bus —
so the per-core efficiency of the *kernel itself* at 2 vs 8 local
processes is the ceiling any Spark job running that kernel can reach on
this host. This script measures that ceiling with zero Spark: a
multiprocessing pool maps a FIXED task decomposition (64 tasks, same at
both levels, mirroring the pinned kernel-stage task count in
bench.run_scaling / scaling_submit.py) over the same deterministic
workload, each task running whole-cascade `dtwnn` searches (|q|=100 in
|y|=1e6, ZNorm, radius 5 — the BASELINE.md reference shape) against a
128 MB working set that cycles through 16 distinct series (past L3, so
DRAM traffic is exercised like the real job).

    python scripts/kernel_burn.py [--low 2] [--high 8] [--searches 1024]

Prints one JSON line with walls at both levels, speedup, per-core
efficiency, and the ratio a Spark job's efficiency should be normalized
by. On a real cluster, N -> 4N adds machines (and memory buses), which
is the regime local 2 -> 8 cannot emulate for a bandwidth-bound kernel.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from multiprocessing import get_context

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import numpy as np  # noqa: E402

N_SERIES = 16
SERIES_LEN = 1_000_000
QUERY_LEN = 100
TASKS = 64  # pinned decomposition, identical at both parallelism levels

_SERIES: list[np.ndarray] = []


def _build_series() -> list[np.ndarray]:
    rng = np.random.default_rng(42)
    return [np.cumsum(rng.normal(size=SERIES_LEN)) for _ in range(N_SERIES)]


def _run_task(args) -> float:
    task_id, per_task = args
    from dynamicaxiswarping_jl_spark.kernels import dtwnn
    best = np.inf
    for k in range(per_task):
        g = task_id * per_task + k
        y = _SERIES[g % N_SERIES]
        start = (37 * g * 1009) % (SERIES_LEN - QUERY_LEN)
        q = y[start:start + QUERY_LEN].copy()
        res = dtwnn(q, y, "sqeuclidean", 5, "znorm")
        best = min(best, res.cost)
    return float(best)


def _timed_level(procs: int, per_task: int) -> float:
    ctx = get_context("fork")  # children inherit series + loaded .so (COW)
    with ctx.Pool(procs) as pool:
        # warm: spawn + import + first dispatch per worker
        pool.map(_run_task, [(t, 1) for t in range(procs)])
        t0 = time.time()
        pool.map(_run_task, [(t, per_task) for t in range(TASKS)])
        return time.time() - t0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--low", type=int, default=2)
    p.add_argument("--high", type=int, default=8)
    p.add_argument("--searches", type=int, default=1024)
    a = p.parse_args()

    global _SERIES
    _SERIES = _build_series()
    # compile/load the native kernels in the parent so forks inherit them
    from dynamicaxiswarping_jl_spark.kernels import dtwnn
    dtwnn(_SERIES[0][:100].copy(), _SERIES[0][:100_000], "sqeuclidean", 5,
          "znorm")

    per_task = max(1, a.searches // TASKS)
    walls = {c: _timed_level(c, per_task) for c in (a.low, a.high)}
    speedup = walls[a.low] / walls[a.high]
    eff = speedup / (a.high / a.low)
    print(json.dumps({
        "kernel": "nn_cascade_q100_y1e6_znorm_r5",
        "searches": per_task * TASKS, "tasks": TASKS,
        "low": a.low, "high": a.high,
        f"wall_sec_{a.low}p": round(walls[a.low], 3),
        f"wall_sec_{a.high}p": round(walls[a.high], 3),
        "speedup": round(speedup, 3),
        "hardware_ceiling_efficiency": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
