"""Gorilla/delta-of-delta compression: pure roundtrip properties + the
chunked Spark path (tier → chunks → decode == tier)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from dynamicaxiswarping_jl_spark.operators.compression import (
    gorilla_encode, gorilla_decode, compress_chunks, decompress_chunks)
from dynamicaxiswarping_jl_spark.operators import rollup_turns, gapfill
from dynamicaxiswarping_jl_spark.sources import transcripts_df

try:
    from hypothesis import given, settings, strategies as st
    HAVE_HYP = True
except ImportError:
    HAVE_HYP = False


class TestGorillaRoundtrip:
    def test_regular_grid(self):
        ts = 1_700_000_000 + np.arange(1000) * 60
        vals = np.sin(np.arange(1000) / 50.0)
        n, t0, v0, payload = gorilla_encode(ts, vals)
        ts2, vals2 = gorilla_decode(n, t0, v0, payload)
        np.testing.assert_array_equal(ts, ts2)
        np.testing.assert_array_equal(vals, vals2)
        # design case: regular timestamps cost ~1 bit each
        assert len(payload) < 1000 * 10

    def test_irregular_and_special_values(self):
        ts = np.array([0, 1, 2, 10_000, 10_001, 99_999_999])
        vals = np.array([0.0, -0.0, np.inf, -np.inf, 1e-308, 12345.678])
        n, t0, v0, payload = gorilla_encode(ts, vals)
        ts2, vals2 = gorilla_decode(n, t0, v0, payload)
        np.testing.assert_array_equal(ts, ts2)
        np.testing.assert_array_equal(vals.view(np.uint64), vals2.view(np.uint64))

    def test_single_point(self):
        n, t0, v0, payload = gorilla_encode([5], [3.14])
        ts2, vals2 = gorilla_decode(n, t0, v0, payload)
        assert ts2.tolist() == [5] and vals2.tolist() == [3.14]

    def test_constant_values_one_bit_each(self):
        ts = np.arange(500) * 3600
        vals = np.full(500, 7.25)
        _, _, _, payload = gorilla_encode(ts, vals)
        # ~1 bit/timestamp + ~1 bit/value + first-delta header
        assert len(payload) <= 2 * 500 // 8 + 16

    if HAVE_HYP:
        @given(st.lists(st.floats(allow_nan=False, width=64),
                        min_size=1, max_size=300))
        @settings(max_examples=30, deadline=None)
        def test_property_roundtrip(self, vals):
            vals = np.asarray(vals, dtype=np.float64)
            ts = np.cumsum(np.abs(np.arange(len(vals))) % 977) + 1
            n, t0, v0, payload = gorilla_encode(ts, vals)
            ts2, vals2 = gorilla_decode(n, t0, v0, payload)
            np.testing.assert_array_equal(ts, ts2)
            np.testing.assert_array_equal(vals.view(np.uint64),
                                          vals2.view(np.uint64))


class TestSparkChunks:
    def test_tier_chunk_roundtrip(self, spark):
        turns = transcripts_df(spark, 6, seed=7, mean_turns=40, slices=2)
        t1m = gapfill(rollup_turns(turns, "1m"), 60, policy="zero")
        chunks = compress_chunks(t1m, "1m", "turn_rate", chunk="1 hour")
        back = decompress_chunks(chunks, "turn_rate")
        got = back.orderBy("conv_id", "bucket").toPandas()
        want = (t1m.select("conv_id", "bucket",
                           F.col("turn_rate").cast("double"))
                .orderBy("conv_id", "bucket").toPandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_chunk_metadata(self, spark):
        turns = transcripts_df(spark, 3, seed=7, mean_turns=30, slices=1)
        t1m = rollup_turns(turns, "1m")
        chunks = compress_chunks(t1m, "1m", "n_turns", chunk="1 day").toPandas()
        assert (chunks["codec"] == "gorilla").all()
        assert (chunks["n"] >= 1).all()
        # compression: payload bytes well under raw 16 B/point
        raw = (chunks["n"] * 16).sum()
        enc = chunks["payload"].map(len).sum()
        assert enc < raw


class TestChunkIntegrity:
    def test_corrupted_payload_raises(self, spark):
        """A tampered chunk payload must fail the CRC check loudly, not
        decode to silently-wrong points."""
        import pyspark.sql.functions as F
        from dynamicaxiswarping_jl_spark.sources import transcripts_df
        from dynamicaxiswarping_jl_spark.operators import (
            rollup_turns, compress_chunks, decompress_chunks)
        turns = transcripts_df(spark, 3, seed=7, mean_turns=20, slices=1)
        chunks = compress_chunks(rollup_turns(turns, "1m"), "1m",
                                 "turn_rate", chunk="1 day")
        bad = chunks.withColumn(
            "payload",
            F.when(F.length("payload") > 0,
                   F.expr("concat(substring(payload, 1, length(payload) - 1), "
                          "X'FF')")).otherwise(F.col("payload")))
        with pytest.raises(Exception, match="CRC"):
            decompress_chunks(bad, "turn_rate").collect()


class TestSpecialFloats:
    def test_nan_inf_negzero_roundtrip_bit_exact(self):
        """XOR packing is bit-level, so NaN/±Inf/-0.0 must round-trip
        with their exact bit patterns (hypothesis excludes NaN because
        NaN != NaN — this pins the special values explicitly)."""
        import numpy as np
        from dynamicaxiswarping_jl_spark.operators.compression import (
            gorilla_encode, gorilla_decode)
        ts = np.arange(8, dtype=np.int64) * 60
        v = np.array([1.5, np.nan, np.inf, -np.inf, -0.0, 0.0,
                      np.finfo(np.float64).tiny, 3.25])
        n, t0, v0, payload = gorilla_encode(ts, v)
        ts2, v2 = gorilla_decode(n, t0, v0, payload)
        assert (ts == ts2).all()
        assert (v.view(np.uint64) == v2.view(np.uint64)).all()
