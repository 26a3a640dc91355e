"""Gap-fill: densify tier rows onto a regular per-key time grid.

Strategy: **gap-explode** — one ``lead()`` window per key gives each
observed row its successor; ``posexplode(sequence(bucket, next-step,
step))`` then emits every missing grid bucket directly from the row that
precedes the gap (SURVEY.md §2.8). Policies are pure column expressions
over (pos, v, next_v):

- ``zero``: missing buckets → 0 (rate semantics: no turns happened).
- ``locf``: last-observation-carried-forward — the gap inherits ``v``
  by construction, no second window pass.
- ``interp``: linear interpolation between the gap's endpoints —
  the distributed analog of the reference's LinearInterpolation
  (src/gdtw.jl:374-399): ``v + (next_v - v) · pos/gap_len``; the final
  observation (no successor) holds its own value.

Scale note: one hash shuffle on ``key`` (the window), no join, no
running frames — the previous spine-join formulation shuffled the
exploded spine AND the tier rows and needed O(n) window frames per key
for interp. Grid rows are generated in the same task that owns the
preceding observation, so output size is the only scale cost.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gapfill"]


def gapfill(tier_df: DataFrame, step_s: int = 60, key: str = "conv_id",
            value_cols: tuple = ("turn_rate", "n_turns", "tool_calls"),
            policy: str = "zero") -> DataFrame:
    """Densify ``(key, bucket, *value_cols)`` to a regular grid per key."""
    if policy not in ("zero", "locf", "interp"):
        raise ValueError(f"unknown gap-fill policy {policy!r}")
    if policy == "interp":
        # the interpolation ratio is computed in epoch seconds via the
        # NTZ->TIMESTAMP cast — same DST-safety precondition as
        # asof_join/delta_rate/sessionize
        from .asof import assert_ntz_session_tz_safe
        assert_ntz_session_tz_safe(tier_df, "bucket", "gapfill(interp)")

    w = Window.partitionBy(key).orderBy("bucket")
    nxt = F.lead("bucket").over(w)
    step = f"interval {step_s} seconds"
    df = tier_df.select(
        key, "bucket", *value_cols,
        nxt.alias("_nxt"),
        *[F.lead(c).over(w).alias(f"_nxt_{c}") for c in
          (value_cols if policy == "interp" else ())])
    # greatest() clamp: if consecutive buckets are closer than step_s
    # (duplicate buckets, or a caller step larger than the data spacing)
    # the naive stop `_nxt - step` precedes the start and sequence()
    # throws; clamping emits just the start row instead (ADVICE r01)
    seq = F.when(F.col("_nxt").isNull(),
                 F.array(F.col("bucket"))).otherwise(
        F.expr(f"sequence(bucket, greatest(bucket, _nxt - {step}), {step})"))
    df = (df.select(key, "bucket", "_nxt",
                    *[c for c in df.columns
                      if c.startswith("_nxt_") or c in value_cols],
                    F.posexplode(seq).alias("_pos", "_grid")))

    cols = [F.col(key), F.col("_grid").alias("bucket")]
    if policy == "zero":
        cols += [F.when(F.col("_pos") == 0, F.col(c)).otherwise(F.lit(0))
                 .alias(c) for c in value_cols]
    elif policy == "locf":
        cols += [F.col(c).alias(c) for c in value_cols]
    else:  # interp
        # exact v0 + (v1-v0)·(t-t0)/(t1-t0) in epoch seconds — the same
        # FP operation order as the textbook/oracle form, so results are
        # bit-identical, not merely close
        t = F.col("_grid").cast("timestamp").cast("long")
        t0 = F.col("bucket").cast("timestamp").cast("long")
        t1 = F.col("_nxt").cast("timestamp").cast("long")
        cols += [
            F.when(F.col("_pos") == 0, F.col(c).cast("double"))
            .otherwise(F.col(c) + (F.col(f"_nxt_{c}") - F.col(c))
                       * (t - t0) / (t1 - t0))
            .cast("double").alias(c)
            for c in value_cols]
    return df.select(*cols)
