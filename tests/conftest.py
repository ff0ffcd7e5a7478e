import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from sedona_db_spark import get_spark
    from sedona_db_spark.session import load_tables
    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    load_tables(s, SF_DIR)
    yield s
    s.stop()
