import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pdf_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cpus=8)
    # Tests run on sf0.001 (hundreds of rows): 4 shuffle partitions cuts
    # per-stage task-launch overhead ~19% on the action-heavy tests
    # (measured round 9) without touching any plan-shape assertion. The
    # production default stays cores-sized in session.tune().
    s.conf.set("spark.sql.shuffle.partitions", "4")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
