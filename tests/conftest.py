import os

import pytest

from gdal_spark.session import get_spark

# override to re-run the oracle gate at another scale factor, e.g.
# SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 (the driver's gate scale)
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="gdal-spark-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
