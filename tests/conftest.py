import os

import pytest

from dynamicaxiswarping_jl_spark.plans import get_spark


@pytest.fixture(scope="session")
def spark():
    # TEST_DRIVER_MEMORY: the contract comparison materializes full query
    # results driver-side (toPandas vs DuckDB) — at CONTRACT_SF_DIR=sf0.1
    # the gap-fill queries are ~65M rows, which needs >4g to compare.
    s = get_spark(
        "tests", cpus=4, shuffle_partitions=8,
        extra_conf={
            "spark.driver.memory": os.environ.get("TEST_DRIVER_MEMORY", "4g"),
            "spark.driver.maxResultSize": "0",  # harness collects full results
            "spark.sql.execution.arrow.maxRecordsPerBatch": "4096",
        })
    yield s
    s.stop()
