import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from patapsco_spark.session import get_spark

    s = get_spark(app="patapsco-spark-tests", master="local[4]",
                  shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_index():
    d = tempfile.mkdtemp(prefix="psidx_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
