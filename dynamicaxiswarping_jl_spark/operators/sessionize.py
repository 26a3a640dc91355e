"""Skew-safe sessionization.

The naive sessionize is one `lag(ts) over (partition by key order by ts)`
window — correct, but the north rule's adversarial shape (ONE
conversation with 1e6+ turns) lands that key's entire history in a
single task. This operator runs the two-phase salted form
(plans/skew.py's pattern applied to an ordered scan, where a hash salt
would break adjacency):

1. salt by coarse TIME BLOCK (`window(ts, block)`): within each
   (key, block) a hash aggregate sorts the group's timestamps
   (sort_array) and counts session starts with a JVM zip_with gap scan,
   recording the block's first/last timestamps. Work per task is
   bounded by events per (key, block), not per key.
2. a per-key pass over the tiny block-summary table (one row per
   (key, block)) subtracts the starts that actually continue the
   previous block's session (boundary gap <= gap_s).

Exact: sessions are defined by consecutive-gap thresholds; time blocks
partition each key's ordered event sequence, so only the block-boundary
gaps need the (tiny) second pass. Events with equal timestamps have gap
0 <= gap_s under any tie order, so the count is order-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sessionize_events"]


def sessionize_events(df: DataFrame, key: str = "user_id",
                      ts_col: str = "ts", gap_s: int = 1800,
                      block: str = "1 day") -> DataFrame:
    """(key, n_sessions, n_events) with sessions split at gaps > gap_s."""
    gap_us = int(gap_s) * 1_000_000
    d = df.select(
        F.col(key),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.window(F.col(ts_col).cast("timestamp"), block)["start"]
        .alias("_blk"))
    # No explicit repartition: the agg's own exchange hashes on
    # (key, _blk), and the CLAUDE.md AQE trap does not apply — per-group
    # work is bytes-proportional, so AQE coalescing the byte-small
    # exchange keeps per-task work proportional to per-task bytes.
    # Skew safety is structural (a group is block-bounded), not a
    # function of the task count.
    #
    # Phase 1 is a hash AGGREGATE (partial map-side agg, no sort), not a
    # lag() window: sort_array over each (key, block) group replaces the
    # window operator's full partition sort, and the gap scan becomes a
    # JVM zip_with over the sorted array — identical result, measured
    # 15-20% faster warm at sf0.1 (6.3M events: 0.50 vs 0.59 s A/B in
    # one session) and no window sort buffers. `_arr` is bounded by
    # events-per-(key, block), the same bound the window form had.
    per_block = (d.groupBy(key, "_blk")
                 .agg(F.count(F.lit(1)).alias("_n"),
                      F.sort_array(F.collect_list("_us")).alias("_arr"))
                 .select(
                     F.col(key), F.col("_blk"), F.col("_n"),
                     F.element_at("_arr", 1).alias("_first"),
                     F.element_at("_arr", -1).alias("_last"),
                     # starts = first event + strictly-over-gap steps;
                     # zip_with pads the shorter (shifted) side with
                     # null, which filter() drops
                     (F.lit(1) + F.size(F.filter(
                         F.zip_with(
                             F.slice("_arr", F.lit(2), F.col("_n") - 1),
                             F.col("_arr"),
                             lambda a, b: a - b > F.lit(gap_us)),
                         lambda x: x))).alias("_starts"))
                 .drop("_arr"))
    w2 = Window.partitionBy(key).orderBy("_blk")
    merged = per_block.withColumn("_prev_last", F.lag("_last").over(w2))
    cont = F.when(F.col("_prev_last").isNotNull()
                  & (F.col("_first") - F.col("_prev_last") <= gap_us),
                  1).otherwise(0)
    return (merged.groupBy(key)
            .agg(F.sum(F.col("_starts") - cont).alias("n_sessions"),
                 F.sum("_n").alias("n_events")))
