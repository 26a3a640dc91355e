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


class TestUcrReader:
    def test_roundtrip_vs_numpy(self, spark, tmp_path):
        import numpy as np
        from dynamicaxiswarping_jl_spark.sources import read_ucr
        rng = np.random.default_rng(7)
        M = np.column_stack([rng.integers(1, 4, size=12).astype(float),
                             rng.normal(size=(12, 20))])
        p = tmp_path / "toy_ucr.txt"
        np.savetxt(p, M, fmt="%.7e")
        got = (read_ucr(spark, str(p)).orderBy("series_id").toPandas())
        assert got.series_id.tolist() == list(range(12))
        np.testing.assert_allclose(got.label.to_numpy(), M[:, 0])
        np.testing.assert_allclose(np.stack(got.points.to_numpy()), M[:, 1:],
                                   rtol=1e-6)

    def test_reference_cbf_shape(self, spark):
        """Smoke: the reference's bundled CBF sample parses to the shape
        its data/README.md documents (30 series x 128 samples, labels
        1..3) — data only, no reference code involved."""
        import os
        path = "/root/reference/data/CBF_TRAIN.txt"
        if not os.path.exists(path):
            import pytest
            pytest.skip("reference data not present")
        from dynamicaxiswarping_jl_spark.sources import read_ucr
        df = read_ucr(spark, path).toPandas()
        assert len(df) == 30
        assert set(df.label) <= {1.0, 2.0, 3.0}
        assert all(len(pts) == 128 for pts in df.points)
