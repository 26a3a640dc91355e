"""Structured Streaming 1m ingest: file source → watermarked tumbling agg →
foreachBatch upsert; batch-equivalence of the aggregation."""

import os

import pytest
from pyspark.sql import functions as F

from dynamicaxiswarping_jl_spark.sources import transcripts_df
from dynamicaxiswarping_jl_spark.sources.transcripts import TRANSCRIPT_SCHEMA
from dynamicaxiswarping_jl_spark.operators import rollup_turns
from dynamicaxiswarping_jl_spark.streaming import start_file_ingest


class TestStreamingIngest:
    def test_file_ingest_matches_batch_rollup(self, spark, tmp_path):
        src = str(tmp_path / "src")
        tier = str(tmp_path / "tier")
        ckpt = str(tmp_path / "ckpt")
        turns = transcripts_df(spark, 6, seed=11, mean_turns=30, slices=2)
        turns.write.mode("overwrite").parquet(src)

        q = start_file_ingest(spark, src, tier, ckpt, TRANSCRIPT_SCHEMA)
        q.awaitTermination(120)

        got = (spark.read.parquet(tier)
               .groupBy("conv_id", "bucket")
               .agg(F.sum("n_turns").alias("n_turns"))
               .orderBy("conv_id", "bucket").collect())
        want = (rollup_turns(spark.read.parquet(src), "1m")
                .select("conv_id", "bucket", "n_turns")
                .orderBy("conv_id", "bucket").collect())
        assert got == want

    def test_ingest_is_incremental(self, spark, tmp_path):
        src = str(tmp_path / "src2")
        tier = str(tmp_path / "tier2")
        ckpt = str(tmp_path / "ckpt2")
        t1 = transcripts_df(spark, 3, seed=13, mean_turns=20, slices=1)
        t1.write.mode("overwrite").parquet(src)
        start_file_ingest(spark, src, tier, ckpt,
                          TRANSCRIPT_SCHEMA).awaitTermination(120)
        n1 = spark.read.parquet(tier).count()
        # second batch of new conversations arrives
        t2 = transcripts_df(spark, 3, seed=14, mean_turns=20, slices=1)
        t2.select(F.concat(F.lit("x"), "conv_id").alias("conv_id"),
                  "turn_idx", "role", "text", "tool", "ts") \
          .write.mode("append").parquet(src)
        start_file_ingest(spark, src, tier, ckpt,
                          TRANSCRIPT_SCHEMA).awaitTermination(120)
        n2 = spark.read.parquet(tier).count()
        assert n2 > n1
