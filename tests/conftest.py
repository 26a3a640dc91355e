import pytest

from dynamicaxiswarping_jl_spark.plans import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=4, shuffle_partitions=8,
                  extra_conf={"spark.driver.memory": "4g",
                              "spark.sql.execution.arrow.maxRecordsPerBatch": "4096"})
    yield s
    s.stop()
