"""Deterministic synthetic transcript table (BASELINE.json input_hint).

Schema::

    conv_id STRING, turn_idx INT, role STRING, text STRING,
    tool STRING, ts TIMESTAMP

Properties (FIXTURES.md A1):
- seeded + deterministic per conv_id: the same conv_id always regenerates
  identical turns, so distributed generation needs no global RNG stream;
- zipf-ish turn counts (lognormal, clipped) → a few huge conversations to
  exercise the skew path;
- inter-turn gaps ~ Exp(20s) with ~2% gaps > 10 min → exercises gap-fill;
- text is a deterministic function of (conv_id, turn_idx) → the per-turn
  text-equality invariant is checkable after any round trip.

Generation is itself distributed: ``spark.range(n_conv)`` fans conv ids
over executors and each task generates its own conversations inside a
pandas UDF — at 10^12 turns the generator is a normal Spark job, not a
driver loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = ["TRANSCRIPT_SCHEMA", "generate_transcripts_pandas", "transcripts_df"]

TRANSCRIPT_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("turn_idx", T.IntegerType(), False),
    T.StructField("role", T.StringType(), False),
    T.StructField("text", T.StringType(), False),
    T.StructField("tool", T.StringType(), True),
    T.StructField("ts", T.TimestampType(), False),
])

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["bash", "read", "write", "grep", "web"])
_EPOCH = np.datetime64("2026-01-01T00:00:00")
_WORDS = np.array([
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango",
])


def _conv_turns(conv_idx: int, seed: int, mean_turns: float) -> pd.DataFrame:
    """All turns of one conversation — fully deterministic in (conv_idx, seed)."""
    rng = np.random.default_rng((seed * 1_000_003 + conv_idx) & 0x7FFFFFFF)
    n = int(np.clip(np.exp(rng.normal(np.log(mean_turns), 1.0)), 4, 50_000))
    conv_id = f"conv_{conv_idx:08d}"
    idx = np.arange(n, dtype=np.int32)
    roles = np.where(idx % 2 == 0, "user", "assistant")
    # ~30% of assistant turns carry a tool call
    tool_draw = rng.random(n)
    tools = np.where((roles == "assistant") & (tool_draw < 0.3),
                     _TOOLS[rng.integers(0, len(_TOOLS), n)], None)
    # inter-turn gaps: Exp(mean 20 s), ~2% replaced by >10 min gaps
    gaps = rng.exponential(20.0, n)
    big = rng.random(n) < 0.02
    gaps[big] = 600.0 + rng.exponential(600.0, int(big.sum()))
    gaps[0] = 0.0
    start = rng.integers(0, 86_400 * 30)  # conv starts within a 30-day window
    ts = _EPOCH + ((start + np.cumsum(gaps)) * 1000).astype("timedelta64[ms]")
    words = _WORDS[rng.integers(0, len(_WORDS), n)]
    text = np.char.add(np.char.add(f"{conv_id}:", idx.astype(str)),
                       np.char.add(":", words))
    return pd.DataFrame({
        "conv_id": conv_id, "turn_idx": idx, "role": roles,
        "text": text, "tool": tools, "ts": ts.astype("datetime64[us]"),
    })


def generate_transcripts_pandas(n_conv: int, seed: int = 42,
                                mean_turns: float = 40.0) -> pd.DataFrame:
    """Driver-side generation (tests / tiny fixtures)."""
    parts = [_conv_turns(i, seed, mean_turns) for i in range(n_conv)]
    return pd.concat(parts, ignore_index=True)


def transcripts_df(spark: SparkSession, n_conv: int, seed: int = 42,
                   mean_turns: float = 40.0,
                   slices: int | None = None) -> DataFrame:
    """Distributed deterministic generation: conv ids fan out over
    executors, each generated independently inside mapInPandas."""
    mt = float(mean_turns)
    sd = int(seed)

    def gen(batches):
        for pdf in batches:
            for cid in pdf["id"].to_numpy():
                yield _conv_turns(int(cid), sd, mt)

    ids = spark.range(n_conv, numPartitions=slices)
    return ids.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)
