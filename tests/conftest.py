import pytest


@pytest.fixture(scope="session")
def spark():
    from whitebox_tools_spark.session import get_spark

    s = get_spark(cores=4, shuffle_partitions=4, driver_memory="4g", app="wts-tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
