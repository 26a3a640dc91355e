"""Golden-oracle generator parity: the pure-Python re-derivations in
scripts/make_goldens.py must track the Spark operators bit-for-bit, or the
driver's golden-parquet correctness gate silently rots."""

import os
import sys

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from make_goldens import (  # noqa: E402
    xxh64, xxh64_signed, _shingle_hashes, _tokens, _minhash_sigs,
    _simhash_sigs, _r,
)


class TestXxh64Parity:
    def test_matches_spark_xxhash64(self, spark):
        import pyspark.sql.functions as F
        cases = ["", "a", "ab", "abc", "abcd", "hello world", "x" * 7,
                 "y" * 8, "z" * 31, "w" * 32, "v" * 33, "q" * 100,
                 "conv_00000001:3:alpha", "tab\there", "žluťoučký kůň 🐴"]
        df = (spark.createDataFrame([(c,) for c in cases], "s string")
              .select("s", F.xxhash64("s").alias("h")).collect())
        for r in df:
            assert r["h"] == xxh64_signed(r["s"]), repr(r["s"])

    def test_known_vector(self):
        # seed-0 spot value from the public reference implementation
        assert xxh64(b"", seed=0) == 0xEF46DB3751D8E999


class TestShingleParity:
    def test_matches_jvm_expr(self, spark):
        from dynamicaxiswarping_jl_spark.operators.dedup import _with_shingle_hashes
        texts = ["one two three four five", "  leading  and  trailing  ",
                 "one two", "", None, "single", "a b c d e f g h",
                 "Tab\tand\nnewline separated words here"]
        base = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                     "doc_id long, text string")
        df = (_with_shingle_hashes(base, "text", 3)
              .select("doc_id", F.col("_hv").alias("hv"))
              .orderBy("doc_id").collect())
        for i, t in enumerate(texts):
            got = list(df[i]["hv"])
            want = _shingle_hashes(t, 3).tolist()
            assert got == want, (t, got, want)


class TestSignatureParity:
    def test_minhash_signatures_match(self, spark):
        from dynamicaxiswarping_jl_spark.operators.dedup import minhash_signatures
        texts = [(i, f"token{j} " * 5 + f"doc {i} body words here and more")
                 for i, j in zip(range(8), [0, 0, 1, 2, 0, 3, 1, 2])]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        got = {r["doc_id"]: list(r["sig"])
               for r in minhash_signatures(docs, k=16, seed=7).collect()}
        pdf = pd.DataFrame(texts, columns=["doc_id", "text"])
        want = _minhash_sigs(pdf, k=16, shingle=3, seed=7)
        for did in want:
            assert got[did] == want[did].tolist(), did

    def test_simhash_signatures_match(self, spark):
        from dynamicaxiswarping_jl_spark.operators import simhash_signatures
        texts = [(0, "alpha beta gamma delta"), (1, "alpha beta gamma"),
                 (2, ""), (3, "solo"), (4, "many words " * 20)]
        docs = spark.createDataFrame(texts, "doc_id long, text string")
        got = {r["doc_id"]: r["simhash"]
               for r in simhash_signatures(docs).collect()}
        want = _simhash_sigs(pd.DataFrame(texts, columns=["doc_id", "text"]))
        assert got == want

    def test_tokens_ascii_whitespace_only(self):
        # Java \s is ASCII-only; U+00A0 must NOT split (it stays inside
        # the token, matching Spark's split(text, '\\s+'))
        assert _tokens("a b c") == ["a b", "c"]


class TestGoldenFilesFresh:
    def test_golden_dir_complete(self):
        # every parquet path any oracle SQL references (merged keys read
        # several per-part goldens) must exist at sf0.01
        import re

        import __spark_entry__ as E
        missing = []
        for n, sql in E.oracle_sql().items():
            for path in re.findall(r"read_parquet\('([^']+)'\)", sql):
                if not os.path.exists(path):
                    missing.append((n, os.path.basename(path)))
        assert not missing, f"regenerate goldens: {missing}"

    def test_rounding_matches_entry(self):
        vals = np.array([27.10375, -27.10375, 0.5e-4, 1.23455, -1.23455])
        f = 1e4
        want = np.sign(vals) * np.floor(np.abs(vals) * f + 0.5) / f
        np.testing.assert_array_equal(_r(vals), want)
