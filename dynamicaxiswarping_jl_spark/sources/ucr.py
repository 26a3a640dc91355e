"""UCR-archive time-series text format reader.

The reference bundles the UCR CBF sample and a download-gated archive
loader (reference src/datasets/datasets.jl:1-11, data/README.md:1-18):
each line is whitespace-separated floats, column 1 the class label,
columns 2..N the series samples (data/CBF_TRAIN.txt = 30 rows x 1+128).

Spark-first equivalent: ``spark.read.text`` (splittable, distributed —
a 100 GB archive file fans out across executors) + JVM-side regexp split
and array casts; no Python in the parse path. Returns
``(series_id, label, points ARRAY<DOUBLE>)`` with ``series_id`` the
0-based line offset so ordering is stable and joinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_ucr"]


def read_ucr(spark: SparkSession, path: str,
             delimiter: str = r"\s+") -> DataFrame:
    """Read a UCR-format text file into (series_id, label, points).

    ``delimiter`` is a regex; UCR files use runs of spaces, UCR-2018 uses
    tabs — the default covers both. Blank lines are dropped.
    """
    from pyspark.sql import Window

    # Column-API regexp_replace/split: the pattern is passed verbatim (an
    # SQL-literal '\s+' would lose its backslash to escape parsing).
    lines = (spark.read.text(path)
             .filter(F.trim("value") != "")
             .select(F.split(
                 F.regexp_replace(F.trim(F.col("value")), delimiter, " "),
                 " ").alias("toks")))
    # Dense 0-based ids without a global sort (which would serialize onto
    # one task at scale): partition-local row_number keyed by the
    # partition-prefixed monotonically_increasing_id, plus broadcast
    # cumulative partition offsets — the classic two-pass zipWithIndex.
    withid = (lines
              .withColumn("_mid", F.monotonically_increasing_id())
              .withColumn("_pid", F.spark_partition_id()))
    local = F.row_number().over(
        Window.partitionBy("_pid").orderBy("_mid")) - 1
    counts = (withid.groupBy("_pid").agg(F.count(F.lit(1)).alias("_n"))
              .withColumn("_offset",
                          F.coalesce(
                              F.sum("_n").over(
                                  Window.orderBy("_pid")
                                  .rowsBetween(Window.unboundedPreceding, -1)),
                              F.lit(0))))
    return (withid.withColumn("_local", local)
            .join(F.broadcast(counts.select("_pid", "_offset")), "_pid")
            .select((F.col("_offset") + F.col("_local")).alias("series_id"),
                    F.element_at("toks", 1).cast("double").alias("label"),
                    F.expr(
                        "transform(slice(toks, 2, size(toks) - 1), "
                        "x -> CAST(x AS DOUBLE))").alias("points")))
