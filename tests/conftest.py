import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from keystone_spark import get_session  # noqa: E402

SF_DIR = os.environ.get("KEYSTONE_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_session("keystone_spark_tests", master="local[4]", shuffle_partitions=8,
                    extra_confs={"spark.driver.memory": "8g"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
