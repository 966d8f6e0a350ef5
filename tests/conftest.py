import pytest


@pytest.fixture(scope="session")
def spark():
    from equi7grid_spark.session import get_spark

    s = get_spark(app_name="equi7grid_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
