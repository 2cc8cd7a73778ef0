import pytest

from gravity_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gravity_spark_tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
