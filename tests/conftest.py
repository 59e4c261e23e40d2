import pytest

from stepist_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("stepist_spark_tests", cpus=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
