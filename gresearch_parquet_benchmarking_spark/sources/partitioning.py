"""Hive-style date partitioning: the partition-pruned scan.

At 100 TB the first line of defense is never reading the bytes at all:
laying the fact table out as ``.../o_ordermonth=YYYY-MM/...`` turns a
month predicate into PARTITION PRUNING — Catalyst resolves the
qualifying directories from catalog/file-listing metadata and the scan
plans only those files; every other month costs zero I/O, zero tasks.
This composes with (and precedes) row-group min/max skipping
(sources/layout.py Z-order) and bucketing (sources/bucketing.py): a
typical lakehouse table is date-partitioned first, then
bucketed/sorted within partitions.

Partition-count sizing at 100 TB: partitions must stay coarse enough
that each holds many row groups (a daily partition of a 100 TB/year
table is ~270 GB — fine); over-partitioning (e.g. by hour+key) creates
the small-files problem sources/compaction.py exists to undo. Monthly
here: ~80 partitions over the TPC-H date span at any SF.

Layout is metadata, not semantics: the registered query's DuckDB twin
(operators/scale.py layout_partition_pruned_scan) computes the same
answer from the UNPARTITIONED table, so the value-hash gate proves the
rewrite changed nothing; tests/test_layout_partition.py pins that the
scan actually pruned (PartitionFilters + input-file count).

Reference parity: no analog — the reference reads standalone Parquet
files (data_read_benchmark.cc); partition layout is Spark/Hive-catalog
territory (SURVEY.md §2.9 extension surface).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

_BASE = "/tmp/engine_partitioned"
PART_COL = "o_ordermonth"


def partitioned_orders_path(sf_dir: str, base: str = _BASE) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    return os.path.join(base, f"orders_by_month_{tag}")


def ensure_partitioned_orders(
    spark: SparkSession, sf_dir: str, base: str = _BASE
) -> str:
    """Write orders partitioned by order month (once per layout dir;
    the rewrite is the one-time cost every pruned scan amortizes).
    Returns the layout path. The partition value is
    ``date_format(o_orderdate, 'yyyy-MM')`` — a string Spark's
    partition discovery round-trips verbatim (not inferable as a
    numeric/date type)."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    path = partitioned_orders_path(sf_dir, base)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "orders")
            .withColumn(PART_COL, F.date_format("o_orderdate", "yyyy-MM"))
            .write.partitionBy(PART_COL)
            .mode("overwrite")
            .parquet(path)
        )
    return path
