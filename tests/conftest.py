"""Shared Spark session for tests (tiny data -> few cores, fast shuffles)."""

import pytest

from data_model_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(cores=4, app_name="geozarr-spark-tests", shuffle_partitions=4)
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
