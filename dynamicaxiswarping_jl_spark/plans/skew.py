"""Skew handling for long-conversation hot keys.

The north rule names the skew axis explicitly: a handful of conversations
have orders of magnitude more turns (zipf-ish). Two tools:

- ``with_salt``: add a deterministic salt column ``pmod(hash(turn_idx), S)``
  so per-turn work on one conversation spreads over S tasks.
- ``salted_repartition``: repartition by (conv_id, salt) — the two-phase
  pattern is salt → partial agg → re-agg by conv_id, which Spark's partial
  aggregation already does for algebraic aggs; use the explicit salt only
  for applyInPandas-style grouped work where one group = one task.

AQE skew-join splitting (enabled in plans/session.py) covers the join side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_repartition"]


def with_salt(df: DataFrame, col: str = "turn_idx", buckets: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Deterministic salt from an existing fine-grained column (no rand():
    resumability requires identical partitioning across reruns)."""
    return df.withColumn(salt_col, F.pmod(F.hash(F.col(col)), F.lit(buckets)))


def salted_repartition(df: DataFrame, key: str = "conv_id",
                       col: str = "turn_idx", buckets: int = 16,
                       num_partitions: int | None = None) -> DataFrame:
    salted = with_salt(df, col, buckets)
    if num_partitions:
        return salted.repartition(num_partitions, key, "_salt")
    return salted.repartition(key, "_salt")
