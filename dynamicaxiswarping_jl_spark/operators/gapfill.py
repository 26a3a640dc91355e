"""Gap-fill: densify tier rows onto a per-key time spine.

Spine = ``sequence(min(bucket), max(bucket), interval step)`` exploded per
key, left-joined back to the tier rows (SURVEY.md §2.8). Policies:

- ``zero``: missing buckets → 0 (rate semantics: no turns happened).
- ``locf``: last-observation-carried-forward via
  ``last(v, ignorenulls) OVER (ORDER BY bucket)``.
- ``interp``: linear interpolation between surrounding observations —
  the distributed analog of the reference's LinearInterpolation
  (src/gdtw.jl:374-399), done with window functions (no UDF): for each
  gap row, prev/next observed (bucket, value) pairs give
  ``v = v0 + (v1-v0)·(t-t0)/(t1-t0)``; edges hold.

Scale note: the spine explode multiplies rows by the gap fraction only
(sequence bounded per key); the join is co-partitioned by key because both
sides were just shuffled on it — Catalyst reuses the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill"]


def gapfill(tier_df: DataFrame, step_s: int = 60, key: str = "conv_id",
            value_cols: tuple = ("turn_rate", "n_turns", "tool_calls"),
            policy: str = "zero") -> DataFrame:
    """Densify ``(key, bucket, *value_cols)`` to a regular grid per key."""
    spine = (
        tier_df.groupBy(key)
        .agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
        .select(key, F.explode(
            F.sequence("mn", "mx", F.expr(f"interval {step_s} seconds"))
        ).alias("bucket"))
    )
    joined = spine.join(tier_df, [key, "bucket"], "left")

    if policy == "zero":
        return joined.select(
            key, "bucket",
            *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in value_cols])

    if policy == "locf":
        w = (Window.partitionBy(key).orderBy("bucket")
             .rowsBetween(Window.unboundedPreceding, 0))
        return joined.select(
            key, "bucket",
            *[F.coalesce(F.last(c, ignorenulls=True).over(w),
                         F.lit(0)).alias(c) for c in value_cols])

    if policy == "interp":
        # both directions as RUNNING frames: Spark executes an
        # unboundedFollowing frame O(n^2) per partition, so the "next
        # observation" is a last() over a DESCENDING running frame instead
        wb = (Window.partitionBy(key).orderBy(F.col("bucket").asc())
              .rowsBetween(Window.unboundedPreceding, 0))
        wf = (Window.partitionBy(key).orderBy(F.col("bucket").desc())
              .rowsBetween(Window.unboundedPreceding, 0))
        t = F.col("bucket").cast("timestamp").cast("long")
        obs_t = F.when(F.col(value_cols[0]).isNotNull(), t)
        t0 = F.last(obs_t, ignorenulls=True).over(wb)
        t1 = F.last(obs_t, ignorenulls=True).over(wf)
        cols = [key, "bucket"]
        for c in value_cols:
            v0 = F.last(c, ignorenulls=True).over(wb)
            v1 = F.last(c, ignorenulls=True).over(wf)
            interp = F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
                F.when(t0.isNull(), v1)           # leading edge: hold next
                .when(t1.isNull(), v0)            # trailing edge: hold prev
                .when(t1 == t0, v0)
                .otherwise(v0 + (v1 - v0) * (t - t0) / (t1 - t0)))
            cols.append(interp.cast("double").alias(c))
        return joined.select(*cols)

    raise ValueError(f"unknown gap-fill policy {policy!r}")
