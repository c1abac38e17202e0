import pytest


@pytest.fixture(scope="session")
def spark():
    from upton_spark.plans.session import get_spark

    s = get_spark("upton_spark_tests", cores=8, shuffle_partitions=8)
    yield s
