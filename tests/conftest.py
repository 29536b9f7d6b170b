import pytest


@pytest.fixture(scope="session")
def spark():
    from cefspark.session import get_spark
    s = get_spark(app_name="cefspark-tests", cores=4, shuffle_partitions=4)
    yield s
    s.stop()
