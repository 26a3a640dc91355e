#!/usr/bin/env python
"""Local emulation of the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side at sf0.01 and report
rows/schema/value matches. Usage:

    python scripts/check_correctness.py [sf_dir] [q1,q2,...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object and len(df) and isinstance(
                df[c].iloc[0], (bool, np.bool_)):
            df[c] = df[c].astype(bool)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    # gate at the matching golden scale when one exists (goldens are
    # per-SF parquet; sf0.01 is the external driver's default)
    gdir = os.path.join(_REPO, "golden",
                        os.path.basename(sf_dir.rstrip("/")))
    if os.path.isdir(gdir):
        os.environ["SPARK_TSWARP_GOLDEN_DIR"] = gdir

    from pyspark.sql import SparkSession
    sys.path.insert(0, _REPO)
    import __spark_entry__ as E

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.driver.memory", "8g")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name in qs:
        if only and name not in only:
            continue
        if name not in oracles:
            print(f"{name:26s} (no oracle)")
            continue
        try:
            sdf = _canon(qs[name](spark, sf_dir).toPandas())
            odf = _canon(con.execute(oracles[name]).df())
            rows = len(sdf) == len(odf)
            schema = list(sdf.columns) == list(odf.columns)
            if rows and schema:
                eq = True
                for c in sdf.columns:
                    a, b = sdf[c], odf[c]
                    if a.dtype.kind == "f" or b.dtype.kind == "f":
                        ok = np.allclose(a.astype(float), b.astype(float),
                                         rtol=0, atol=0, equal_nan=True)
                    else:
                        ok = a.astype(str).equals(b.astype(str))
                    if not ok:
                        eq = False
                        print(f"    col {c}: first diffs:")
                        m = (a.astype(str) != b.astype(str))
                        print(pd.DataFrame({"spark": a[m], "oracle": b[m]})
                              .head(5))
            else:
                eq = False
            status = "OK" if (rows and schema and eq) else \
                f"FAIL rows={rows} schema={schema} values={eq} " \
                f"({len(sdf)} vs {len(odf)})"
            if not (rows and schema and eq):
                fails.append(name)
            print(f"{name:26s} {status}")
        except Exception as ex:  # noqa: BLE001
            fails.append(name)
            print(f"{name:26s} ERR {type(ex).__name__}: {ex}")
    print(f"\n{'ALL OK' if not fails else 'FAILURES: ' + ', '.join(fails)}")
    spark.stop()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
