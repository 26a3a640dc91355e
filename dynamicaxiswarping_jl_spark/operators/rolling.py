"""Rolling (sliding-window) statistics over tier rows.

Engine-added continuous-aggregate companion: per-key moving sum / avg /
min / max / count / sample-variance over the trailing ``n_rows`` tier
buckets, the standard "smoothed tier" view a dashboard reads instead of
the raw 1m tier. Pure JVM window functions — no UDF, one shuffle on the
key, whole-stage codegen end to end.

FP determinism contract (this feeds the DuckDB oracle gate): the rolled
column should be an INTEGER tier measure (e.g. ``n_events``). Integer
window sums are exact in any association order (every partial sum is an
integer < 2^53 held in a double or backed by longs), so sum/avg/min/max
are bitwise identical across engines, and the variance is computed from
the exact integer power sums with a PINNED expression —

    var = (sumsq - sum*sum/n) / (n - 1)        (NULL when n == 1)

— evaluated in that exact order on both sides, so the only fp ops are
two divisions and a subtraction on identical doubles. Spark's native
``var_samp`` / DuckDB's ``var_samp`` use different streaming formulas
and would NOT hash-match at full double precision; this operator does
not use them.

Skew posture: identical to gap-fill — the window partitions on the key
and a key's row count is bounded by calendar span (tier rows per month),
not by turn volume, so a 10⁶-turn conversation costs the same as an
idle one (PLANS.md, skew probe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rolling_stats", "delta_rate"]


def delta_rate(tier_df: DataFrame, value_col: str = "n_events",
               key: str = "conv_id", bucket_col: str = "bucket",
               prefix: str = "") -> DataFrame:
    """Per-key bucket-over-bucket ``delta`` and per-second ``rate`` —
    the counter-series view (PromQL ``delta``/``rate`` over a tier).

    Pure JVM ``lag`` window, one shuffle on the key. ``delta`` is
    ``v - lag(v)``; ``rate`` divides by the actual inter-bucket gap in
    seconds (``bucket - lag(bucket)``), so it stays correct on sparse
    (non-gap-filled) tiers where buckets are not adjacent. First row
    per key → NULLs (no predecessor), mirroring SQL ``lag`` semantics.
    FP contract: integer inputs give an exact integer delta and a
    single double division for the rate — bitwise identical to the
    DuckDB window oracle.
    """
    from .asof import assert_ntz_session_tz_safe
    assert_ntz_session_tz_safe(tier_df, bucket_col, "delta_rate")
    keys = [key] if isinstance(key, str) else list(key)
    w = Window.partitionBy(*keys).orderBy(F.col(bucket_col).asc())
    v = F.col(value_col)
    dv = v - F.lag(v).over(w)
    # TIMESTAMP_NTZ has no direct double cast; go through TIMESTAMP
    # (no-op for tz-aware buckets, session-UTC epoch for NTZ ones; a
    # DST-capable session tz is rejected by the guard above)
    ep = F.col(bucket_col).cast("timestamp").cast("double")
    dt = ep - F.lag(ep).over(w)
    return (tier_df
            .withColumn(prefix + "delta", dv)
            .withColumn(prefix + "rate", dv.cast("double") / dt))


def rolling_stats(tier_df: DataFrame, value_col: str = "n_events",
                  key: str = "conv_id", bucket_col: str = "bucket",
                  n_rows: int = 24, prefix: str = "roll_") -> DataFrame:
    """Trailing ``n_rows``-bucket stats per key, ordered by bucket.

    Adds ``{prefix}{n,sum,avg,min,max,var}``. The frame is ROWS BETWEEN
    ``n_rows - 1`` PRECEDING AND CURRENT ROW — rows, not ranges, so a
    gap-filled tier (dense buckets) gives calendar-true windows; run
    ``gapfill`` first if the tier is sparse and you need time-true
    frames.
    """
    if n_rows < 1:
        raise ValueError(f"n_rows must be >= 1, got {n_rows}")
    keys = [key] if isinstance(key, str) else list(key)
    w = (Window.partitionBy(*keys).orderBy(F.col(bucket_col).asc())
         .rowsBetween(-(n_rows - 1), Window.currentRow))
    v = F.col(value_col)
    n = F.count(v).over(w)
    s = F.sum(v).over(w)
    # pre-project v*v so every agg references a plain column — Catalyst
    # then fuses all six into ONE Window node (an inline v*v forces an
    # intermediate projection and a second window pass over the sort)
    sq = "__" + prefix + "sq"
    if sq in tier_df.columns:
        # withColumn would silently REPLACE (and the final drop erase) a
        # caller column of this name — reject like asof_join's reserved set
        raise ValueError(f"column {sq!r} is reserved by rolling_stats"
                         " — rename it before calling")
    tier_df = tier_df.withColumn(sq, v * v)
    ss = F.sum(F.col(sq)).over(w)
    out = (tier_df
           .withColumn(prefix + "n", n)
           .withColumn(prefix + "sum", s)
           .withColumn(prefix + "avg", s.cast("double") / n)
           .withColumn(prefix + "min", F.min(v).over(w))
           .withColumn(prefix + "max", F.max(v).over(w))
           .withColumn(
               prefix + "var",
               F.when(n > 1,
                      (ss.cast("double")
                       - s.cast("double") * s.cast("double") / n)
                      / (n - F.lit(1)))))
    return out.drop(sq)
