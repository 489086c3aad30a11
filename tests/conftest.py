import pytest


@pytest.fixture(scope="session")
def spark():
    from parquetjs_spark.sources.tables import get_spark

    s = get_spark("parquetjs_spark_tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
