from __future__ import annotations

import os
import sys

import pytest

# make `import tests.scalar_oracle` work regardless of invocation dir
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bloomfilter_spark.plans.session import get_spark

    s = get_spark(app_name="bloomfilter_spark-tests", master="local[8]",
                  shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")
