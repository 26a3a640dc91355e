"""TableCatalog: snapshot commits, time travel, append semantics."""

import pytest
from pyspark.sql import functions as F

from dynamicaxiswarping_jl_spark.sources.storage import TableCatalog


class TestTableCatalog:
    def test_write_read_roundtrip(self, spark, tmp_path):
        cat = TableCatalog(spark, str(tmp_path))
        df = spark.range(100).withColumn("v", F.col("id") * 2)
        rec = cat.write("t1", df)
        assert rec["rows_written"] == 100
        got = cat.read("t1")
        assert got.count() == 100

    def test_time_travel(self, spark, tmp_path):
        cat = TableCatalog(spark, str(tmp_path))
        s1 = cat.write("t", spark.range(10))
        s2 = cat.write("t", spark.range(20))
        assert cat.read("t").count() == 20
        assert cat.read("t", snapshot_id=s1["snapshot_id"]).count() == 10
        assert cat.current_snapshot("t")["snapshot_id"] == s2["snapshot_id"]

    def test_append_mode(self, spark, tmp_path):
        cat = TableCatalog(spark, str(tmp_path))
        cat.write("t", spark.range(10))
        cat.write("t", spark.range(5), mode="append")
        assert cat.read("t").count() == 15

    def test_missing_table_and_snapshot(self, spark, tmp_path):
        cat = TableCatalog(spark, str(tmp_path))
        with pytest.raises(FileNotFoundError):
            cat.read("nope")
        cat.write("t", spark.range(1))
        with pytest.raises(KeyError):
            cat.read("t", snapshot_id="beef")
