import os
import shutil
import tempfile

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from gobblin_spark.session import get_spark

    s = get_spark("gobblin-spark-tests", parallelism=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_table_dir():
    d = tempfile.mkdtemp(prefix="gobblin_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
