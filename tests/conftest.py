import pytest


@pytest.fixture(scope="session")
def spark():
    from wcm_spark.session import get_spark

    s = get_spark("wcm-tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
