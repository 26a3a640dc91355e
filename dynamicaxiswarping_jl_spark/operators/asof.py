"""As-of join — match each left row to the nearest right row in time.

Engine-added relational operator (no reference counterpart; the
reference's nearest-in-time notion is dtwnn's best-matching window,
`src/dtwnn.jl:162-238` — this is the tier-table analog): for every left
row, find the single right row with the greatest ``right_ts <=
left_ts`` (direction='backward') or the smallest ``right_ts >=
left_ts`` (direction='forward') sharing the join key. The canonical use
is stamping raw events with the most recent completed rollup-tier row.

Spark-first plan — the union-marker form, ONE shuffle, no range join:

    union(left tagged 1, right tagged 0; right rows carry their
          payload packed into ONE struct)
      → window last(struct, ignorenulls) over
          (PARTITION BY key ORDER BY ts, tag ROWS UNBOUNDED PRECEDING..CURRENT)
      → filter tag = 1 → unpack struct

A naive implementation joins on key with a ``right_ts <= left_ts``
range predicate and argmaxes per left row — that's a near-cross-join
per key (O(|L|·|R|) pairs for hot keys) and Catalyst plans it as
BroadcastNestedLoop/SortMergeJoin with an inequality residual. The
union-marker plan is a single hash shuffle on the key plus a per-key
sort, O(|L|+|R|) — the shape that survives 100 TB. Equal timestamps:
the tag orders right rows BEFORE left rows, so ``right_ts == left_ts``
matches (both directions), mirroring DuckDB/pandas ``merge_asof``
inclusive semantics. The payload travels as one struct so a right row
whose payload CELL is legitimately NULL still wins intact (per-column
``last(ignorenulls)`` would fall through that cell to an older row).

Skew posture: the plain plan sorts one partition per key, and the LEFT
side is NOT calendar-bounded — a hot key with 10⁹ events lands in one
task. ``salt_block_s`` engages the two-phase time-block plan (the
``operators/sessionize.py`` trick adapted to running-last): phase 1
windows within (key, time-block) partitions; phase 2 computes one
summary row per (key, block) — the block's last right row — cascades
it with a tiny per-key window over blocks, and joins the carry-in back
so blocks without a local predecessor still match. Result-identical
(pinned by ``test_salted_matches_plain``); per-partition work is
bounded by events per block instead of events per key. A burst hot key
inside ONE block still concentrates — pick ``salt_block_s`` at the
granularity that bounds it, exactly like sessionize's block parameter.

Determinism: requires the right side unique per ``(key, right_ts)``
(tier tables are, by construction). With duplicates the surviving row
is tie-broken by ``right_ts`` only and Spark's within-partition order
decides — pass a pre-deduped right side instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def _epoch(col):
    """Epoch seconds as double; TIMESTAMP_NTZ has no direct double cast
    so route through TIMESTAMP (no-op for tz-aware, session-UTC for NTZ)."""
    return col.cast("timestamp").cast("double")


def _tz_is_fixed_offset(tz: str) -> bool:
    """True when the session timezone has one constant UTC offset (no
    DST) — the condition under which NTZ→TIMESTAMP is order-preserving."""
    t = str(tz).strip()
    if t.upper() in ("UTC", "GMT", "Z") or t.startswith(("+", "-")):
        return True
    if t.upper().startswith(("UTC+", "UTC-", "GMT+", "GMT-")):
        return True
    try:
        import datetime as _dt
        from zoneinfo import ZoneInfo
        z = ZoneInfo(t)
        # sample a WIDE year range: rule changes post-date any fixed pair
        # of years (Africa/Cairo re-adopted DST in 2023, Asia/Almaty
        # changed base offset in 2024) — future years extrapolate the
        # current rules, which is exactly what the cast will apply
        return len({z.utcoffset(_dt.datetime(y, m, 1))
                    for y in range(2020, 2031)
                    for m in (1, 4, 7, 10)}) == 1
    except Exception:
        return False


def assert_ntz_session_tz_safe(df: DataFrame, col_name: str, op: str):
    """Guard the NTZ epoch route (ADVICE r04): casting TIMESTAMP_NTZ to
    TIMESTAMP interprets the wall clock in the session timezone, so
    ordering and gap arithmetic are only monotonic under a DST-free
    zone. A DST-capable session tz silently mis-orders rows across the
    fall-back hour — reject it loudly with the fix in the message."""
    from pyspark.sql import types as T
    try:
        dt = df.schema[col_name].dataType
    except Exception:
        return
    if not isinstance(dt, T.TimestampNTZType):
        return
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if not _tz_is_fixed_offset(tz):
        raise ValueError(
            f"{op}: column {col_name!r} is TIMESTAMP_NTZ and the session "
            f"timezone {tz!r} has DST — the NTZ epoch route would not be "
            "monotonic across the fall-back hour. Set "
            "spark.sql.session.timeZone=UTC (or any fixed-offset zone), "
            "or cast the column to TIMESTAMP yourself.")


def asof_join(left: DataFrame, right: DataFrame, key,
              left_ts: str = "ts", right_ts: str = "bucket",
              direction: str = "backward", tolerance_s: float | None = None,
              how: str = "inner", matched_ts_col: str = "asof_ts",
              salt_block_s: float | None = None) -> DataFrame:
    """As-of join ``left`` to ``right`` per ``key``.

    Returns all left columns plus ``matched_ts_col`` (the matched right
    timestamp, original type) and every non-key right payload column.
    ``how='inner'`` drops unmatched left rows (DuckDB ``ASOF JOIN``
    semantics); ``how='left'`` keeps them with nulls (``ASOF LEFT
    JOIN``). ``tolerance_s`` voids matches farther than that many
    seconds from the left timestamp (then inner/left applies).
    ``salt_block_s`` switches to the skew-safe two-phase plan (see
    module docstring) — results are identical.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    assert_ntz_session_tz_safe(left, left_ts, "asof_join")
    assert_ntz_session_tz_safe(right, right_ts, "asof_join")
    keys = [key] if isinstance(key, str) else list(key)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    clash = set(payload) & set(left.columns)
    if clash:
        raise ValueError(f"right payload columns collide with left: {sorted(clash)}"
                         " — rename before joining")
    if matched_ts_col in left.columns:
        raise ValueError(f"matched_ts_col {matched_ts_col!r} already in left")
    if matched_ts_col in payload:
        # would build a duplicate-field struct and fail (or mis-extract)
        # at the final select — reject as cleanly as the other clashes
        raise ValueError(
            f"matched_ts_col {matched_ts_col!r} collides with a right "
            "payload column — rename one of them")
    reserved = {"_asof_t", "_asof_srt", "_asof_tag", "_asof_val",
                "_asof_blk", "_asof_bval", "_asof_cval", "_asof_lval"}
    taken = reserved & (set(left.columns) | set(right.columns))
    if taken:
        raise ValueError(f"columns {sorted(taken)} are reserved by asof_join"
                         " — rename before joining")

    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l_schema = {f.name: f.dataType for f in left.schema.fields}
    carried_cols = [matched_ts_col] + payload

    # right payload packed into one struct (null on left rows): the
    # whole matched row survives or none of it does
    r_val = F.struct(F.col(right_ts).alias(matched_ts_col),
                     *[F.col(c) for c in payload])
    tagged_l = left.select(
        *keys,
        F.col(left_ts).alias("_asof_t"),
        F.lit(1).alias("_asof_tag"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(
            right.select(r_val.alias("_asof_val")).schema[0].dataType
        ).alias("_asof_val"),
    )
    tagged_r = right.select(
        *keys,
        F.col(right_ts).cast(l_schema[left_ts]).alias("_asof_t"),
        F.lit(0).alias("_asof_tag"),
        *[F.lit(None).cast(l_schema[c]).alias(c) for c in lcols],
        r_val.alias("_asof_val"),
    )
    # a direction-folded sort key: ascending in it == match-priority
    # order for BOTH directions, so the block/carry logic is one code path
    srt = (_epoch(F.col("_asof_t")) if direction == "backward"
           else -_epoch(F.col("_asof_t")))
    union = (tagged_l.unionByName(tagged_r)
             .withColumn("_asof_srt", srt))

    if salt_block_s is None:
        w = (Window.partitionBy(*keys)
             .orderBy(F.col("_asof_srt").asc(), F.col("_asof_tag").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        out = union.withColumn("_asof_val",
                               F.last("_asof_val", ignorenulls=True).over(w))
    else:
        B = float(salt_block_s)
        union = union.withColumn(
            "_asof_blk", F.floor(F.col("_asof_srt") / F.lit(B)).cast("long"))
        # phase 1: running last within (key, block) — partition size is
        # bounded by events per block, not events per key
        w1 = (Window.partitionBy(*keys, "_asof_blk")
              .orderBy(F.col("_asof_srt").asc(), F.col("_asof_tag").asc())
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        union = union.withColumn(
            "_asof_lval", F.last("_asof_val", ignorenulls=True).over(w1))
        # phase 2: one row per (key, block) — the block's final right
        # row — cascaded across blocks (tiny window: rows per key ==
        # number of blocks), then joined back as each block's carry-in
        rs = (union.filter(F.col("_asof_tag") == 0)
              .groupBy(*keys, "_asof_blk")
              .agg(F.expr("max_by(_asof_val, _asof_srt)").alias("_asof_bval")))
        blks = union.select(*keys, "_asof_blk").distinct()
        wc = (Window.partitionBy(*keys).orderBy(F.col("_asof_blk").asc())
              .rowsBetween(Window.unboundedPreceding, -1))
        carry = (blks.join(rs, keys + ["_asof_blk"], "left")
                 .withColumn("_asof_cval",
                             F.last("_asof_bval", ignorenulls=True).over(wc))
                 .select(*keys, "_asof_blk", "_asof_cval"))
        out = (union.join(carry, keys + ["_asof_blk"], "left")
               .withColumn("_asof_val",
                           F.coalesce("_asof_lval", "_asof_cval")))

    out = out.filter(F.col("_asof_tag") == 1)
    if tolerance_s is not None:
        gap = F.abs(_epoch(F.col("_asof_t"))
                    - _epoch(F.col("_asof_val")[matched_ts_col]))
        out = out.withColumn(
            "_asof_val",
            F.when(gap <= F.lit(float(tolerance_s)), F.col("_asof_val")))
    if how == "inner":
        out = out.filter(F.col("_asof_val").isNotNull())
    return out.select(*keys, F.col("_asof_t").alias(left_ts), *lcols,
                      *[F.col("_asof_val")[c].alias(c) for c in carried_cols])
