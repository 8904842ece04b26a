import pytest

from sylph_spark.session import build_spark


@pytest.fixture(scope="session")
def spark():
    s = build_spark(app_name="sylph_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
