"""Catalog of the driver-provisioned testdata tables (TESTDATA.md).

TPC-H-ish star schema + events stream table + LLM-pipeline tables.
One parquet file per table under ``{sf_dir}/{name}.parquet``.

Scale note: at 100 TB these would be partitioned datasets (e.g.
``lineitem/ship_year=.../*.parquet``); ``load_table`` takes any path
Spark's parquet source accepts, so directory datasets work unchanged —
partition pruning then comes free from Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables whose cardinality is FIXED regardless of scale factor
# (region 5 rows, nation 25 rows in TPC-H) — the only ones that may
# carry an unconditional broadcast hint. Everything else scales with
# SF and must be left to AQE's size-based broadcast decision.
BROADCAST_TABLES = ("region", "nation")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    return spark.read.parquet(table_path(sf_dir, name))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so SQL-form queries run."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
