import pytest


@pytest.fixture(scope="session")
def spark():
    from spinterps_spark.session import get_spark

    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()
