"""SparkSession factory with scale-oriented defaults.

Defaults chosen for the 100 TB design point, degraded gracefully to the
local[k] sandbox:

- AQE on (runtime coalescing + skew-join splitting) — long conversations
  are the skew axis per the north rule.
- Arrow on for every pandas-UDF boundary; ``maxRecordsPerBatch`` sized so
  one conversation's rolled-up series fits a batch.
- ``spark.sql.shuffle.partitions`` explicit (never the 200 default): in
  local mode = 2×cores; on a cluster callers pass ~2-3× total executor
  cores.
- UTC session timezone — oracle comparisons and tier bucketing depend on it.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "warm_python_workers"]


def get_spark(app: str = "dynamicaxiswarping_jl_spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(2 * cpus, 8)
    b = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # local mode: every cached partition is PROCESS_LOCAL, so any
        # locality wait only idles cores between task waves
        .config("spark.locality.wait", "0")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def warm_python_workers(spark: SparkSession) -> None:
    """Spawn the Python UDF workers on every core and import the kernel
    package in each (daemon spawn + numpy/kernel imports cost ~10-15 s on
    32 cores and would otherwise land on the first pandas-UDF stage).
    Call before timing anything."""
    def _warm(batches):
        from dynamicaxiswarping_jl_spark import kernels  # noqa: F401
        for pdf in batches:
            yield pdf
    ncores = spark.sparkContext.defaultParallelism
    spark.range(0, ncores * 2, 1, ncores * 2).mapInPandas(_warm, "id long").count()
