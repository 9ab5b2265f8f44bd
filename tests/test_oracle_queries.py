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


def test_no_rows_only_queries_remain():
    """Since round 4 every registered query has an oracle twin (the
    approx-sketch query carries a bounds contract); a query without one
    must be an explicit exemption in test_registry_window.py, not a
    silent registration."""
    assert sorted(set(QUERIES) - set(ORACLES)) == []


def test_every_oracle_has_query():
    assert set(ORACLES) <= set(QUERIES)
