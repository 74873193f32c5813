from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mysoftware_nocnetintel_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="nocnetintel-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(autouse=True)
def _restore_shuffle_partitions():
    """The session is shared across the whole suite; a test that tunes
    ``spark.sql.shuffle.partitions`` must not leak it into later tests
    (z-order/clustering tests key their file-count expectations off it).
    Restores the pre-test value after every test; doesn't force session
    creation for non-Spark tests."""
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    before = (
        s.conf.get("spark.sql.shuffle.partitions") if s is not None else None
    )
    yield
    s = SparkSession.getActiveSession()
    if s is not None and before is not None:
        s.conf.set("spark.sql.shuffle.partitions", before)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
