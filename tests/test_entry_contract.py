"""Driver-contract conformance: every oracle query must match DuckDB
row-for-row (order-insensitive, column-name keyed) — mimicking the driver's
CORRECTNESS comparison at small scale."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as E

SF = os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return (df.sort_values(list(df.columns))
            .reset_index(drop=True))


def test_entry_smoke(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"conv_id", "cost"} <= set(df.columns)


@pytest.mark.parametrize("name", sorted(E.oracle_sql().keys()))
def test_oracle_match(spark, duck, name):
    got = normalize(E.queries()[name](spark, SF).toPandas())
    # golden-parquet oracles are generated per sf (scripts/make_goldens.py);
    # the shipped SQL points at the driver's sf0.01 — remap to this run's SF
    sql = E.oracle_sql()[name].replace(
        "/golden/sf0.01/", f"/golden/{os.path.basename(SF.rstrip('/'))}/")
    want = normalize(duck.execute(sql).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {got.columns} vs {want.columns}")
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=False, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", [k for k in E.queries() if k not in E.oracle_sql()])
def test_rows_only_queries_run(spark, name):
    df = E.queries()[name](spark, SF)
    n = df.count()
    assert n >= 0
    df.schema  # stable schema materializes
