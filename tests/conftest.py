import shutil
import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from entity_resolution_pipeline_spark.session import build_spark

    s = build_spark(app_name="erp-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture()
def tmp_warehouse():
    d = tempfile.mkdtemp(prefix="erp_wh_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
