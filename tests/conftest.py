from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from gresearch_parquet_benchmarking_spark.session import get_spark

    spark = get_spark(
        app_name="engine-tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_confs={"spark.sql.legacy.parquet.nanosAsLong": "true"},
    )
    yield spark
    spark.stop()
