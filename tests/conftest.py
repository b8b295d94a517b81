import pytest


@pytest.fixture(scope="session")
def spark():
    from handprint_spark.session import get_spark

    s = get_spark(app_name="handprint-spark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_tiny():
    return "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_small():
    return "/root/testdata/sf0.01"
