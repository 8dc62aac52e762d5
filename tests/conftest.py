import pytest

from etielle_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("etielle-spark-tests", cpus=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
