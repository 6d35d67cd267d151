import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@pytest.fixture(scope="session")
def spark():
    from fiona_spark.session import get_spark
    s = get_spark(cores=int(os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")),
                  app="fiona_spark-tests")
    yield s
