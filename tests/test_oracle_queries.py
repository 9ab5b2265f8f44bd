"""Oracle-differential tests: every registered query against its DuckDB
twin at sf0.001 (fast; the driver's gate reruns at sf0.01 — run
scripts_dev/check_queries.py /root/testdata/sf0.01 before shipping)."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE
from oracle_utils import run_compare

from gresearch_parquet_benchmarking_spark.operators.registry import (
    all_oracle_sql,
    all_queries,
)

QUERIES = all_queries()
ORACLES = all_oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_match(spark, name):
    problems = run_compare(spark, name, QUERIES[name], ORACLES[name], SF_SMOKE)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only(spark, name):
    df = QUERIES[name](spark, SF_SMOKE)
    assert df.count() >= 0


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)
