"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Engine implementation lives in ``gresearch_parquet_benchmarking_spark/``
(SURVEY.md §7 layout); every operator registers itself in
``operators/registry.py`` with a DuckDB-SQL oracle twin.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gresearch_parquet_benchmarking_spark.operators.registry import (  # noqa: E402
    all_oracle_sql,
    all_queries,
    release_persists,
)
from gresearch_parquet_benchmarking_spark.session import apply_engine_confs  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    apply_engine_confs(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return all_queries()["q1_pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-
    pipeline extensions). Each callable takes (spark, sf_dir)."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            # drop cache blocks the PREVIOUS query's builder tracked —
            # keeps a 50-query driver sweep leak-free without the
            # driver needing to call clearCache itself
            release_persists()
            apply_engine_confs(spark)
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-SQL twins for every oracle-checkable query."""
    return all_oracle_sql()
