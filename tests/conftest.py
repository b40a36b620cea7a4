import sys

import pytest

sys.path.insert(0, "/root/repo")

from zinger_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()
