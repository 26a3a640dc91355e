"""As-of join — match each left row to the nearest right row in time.

Engine-added relational operator (no reference counterpart; the
reference's nearest-in-time notion is dtwnn's best-matching window,
`src/dtwnn.jl:162-238` — this is the tier-table analog): for every left
row, find the single right row with the greatest ``right_ts <=
left_ts`` (direction='backward') or the smallest ``right_ts >=
left_ts`` (direction='forward') sharing the join key. The canonical use
is stamping raw events with the most recent completed rollup-tier row.

Spark-first plan — the union-marker form, ONE shuffle, no range join:

    union(left tagged 1, right tagged 0)
      → window last(payload, ignorenulls) over
          (PARTITION BY key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING..CURRENT)
      → filter tag = 1

A naive implementation joins on key with a ``right_ts <= left_ts``
range predicate and argmaxes per left row — that's a near-cross-join
per key (O(|L|·|R|) pairs for hot keys) and Catalyst plans it as
BroadcastNestedLoop/SortMergeJoin with an inequality residual. The
union-marker plan is a single hash shuffle on the key plus a per-key
sort, O(|L|+|R|) — the shape that survives 100 TB. Equal timestamps:
the tag orders right rows BEFORE left rows, so ``right_ts == left_ts``
matches (both directions), mirroring DuckDB/pandas ``merge_asof``
inclusive semantics.

Skew posture: one window sort per key. Keys here are conv/user ids —
fine-grained by construction; a monster key is bounded by calendar span
once the right side is a tier table (same argument as gap-fill,
PLANS.md). If the LEFT side is the skewed one, pre-aggregate or salt by
time block exactly as ``operators/sessionize.py`` does — the window's
running ``last()`` only needs the block boundary carried over, which is
the same two-phase trick; not wired here because no current caller has
an unbounded hot key.

Determinism: requires the right side unique per ``(key, right_ts)``
(tier tables are, by construction). With duplicates the surviving row
is tie-broken by ``right_ts`` only and Spark's within-partition order
decides — pass a pre-deduped right side instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, key,
              left_ts: str = "ts", right_ts: str = "bucket",
              direction: str = "backward", tolerance_s: float | None = None,
              how: str = "inner", matched_ts_col: str = "asof_ts") -> DataFrame:
    """As-of join ``left`` to ``right`` per ``key``.

    Returns all left columns plus ``matched_ts_col`` (the matched right
    timestamp, original type) and every non-key right payload column.
    ``how='inner'`` drops unmatched left rows (DuckDB ``ASOF JOIN``
    semantics); ``how='left'`` keeps them with nulls (``ASOF LEFT
    JOIN``). ``tolerance_s`` voids matches farther than that many
    seconds from the left timestamp (then inner/left applies).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}"
                         " — rename before joining")
    if matched_ts_col in left.columns:
        raise ValueError(f"matched_ts_col {matched_ts_col!r} already in left")
    reserved = {"_asof_t", "_asof_tag"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(f"columns {sorted(taken)} are reserved by asof_join"
                         " — rename before joining")

    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l_schema = {f.name: f.dataType for f in left.schema.fields}
    r_schema = {f.name: f.dataType for f in right.schema.fields}

    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("_asof_t"),
        F.lit(1).alias("_asof_tag"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_schema[right_ts]).alias(matched_ts_col),
        *[F.lit(None).cast(r_schema[c]).alias(c) for c in payload],
    )
    tagged_r = right.select(
        *keys,
        F.col(right_ts).cast(l_schema[left_ts]).alias("_asof_t"),
        F.lit(0).alias("_asof_tag"),
        *[F.lit(None).cast(l_schema[c]).alias(c) for c in lcols],
        F.col(right_ts).alias(matched_ts_col),
        *[F.col(c) for c in payload],
    )
    asc = direction == "backward"
    order = [F.col("_asof_t").asc() if asc else F.col("_asof_t").desc(),
             F.col("_asof_tag").asc()]
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(c, ignorenulls=True).over(w).alias(c)
               for c in [matched_ts_col] + payload]
    out = (tagged_l.unionByName(tagged_r)
           .select(*keys, "_asof_t", "_asof_tag",
                   *[F.col(c) for c in lcols], *carried)
           .filter(F.col("_asof_tag") == 1))
    if tolerance_s is not None:
        gap = F.abs(F.col("_asof_t").cast("double")
                    - F.col(matched_ts_col).cast("double"))
        keep = gap <= F.lit(float(tolerance_s))
        out = out.select(
            *keys, "_asof_t", *[F.col(c) for c in lcols],
            *[F.when(keep, F.col(c)).alias(c)
              for c in [matched_ts_col] + payload])
    if how == "inner":
        out = out.filter(F.col(matched_ts_col).isNotNull())
    return out.select(*keys, F.col("_asof_t").alias(left_ts), *lcols,
                      matched_ts_col, *payload)
