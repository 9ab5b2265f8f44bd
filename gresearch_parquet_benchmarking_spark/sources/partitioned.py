"""Partitioned-dataset writers/readers — the engine's layout story at
100 TB (the reference is single-file by construction; SURVEY.md §4
notes partitioning as the dimension it lacks).

A date/category-partitioned layout turns WHERE clauses on the
partition column into directory-level pruning (zero I/O for excluded
partitions) — visible as PartitionFilters in the scan node. Both
static pruning (literal predicate) and dynamic partition pruning
(key constrained only through a join: Spark injects a dynamicpruning
subquery into the fact scan) are asserted in
tests/test_sources_formats.py.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class PartitionedWriteResult:
    path: str
    write_time_s: float
    n_partitions: int


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    codec: str = "snappy",
    max_records_per_file: int | None = None,
) -> PartitionedWriteResult:
    """Hive-style partitioned parquet layout. ``maxRecordsPerFile``
    bounds file sizes inside hot partitions (the small-files /
    giant-file guard at scale)."""
    writer = df.write.mode("overwrite").option("compression", codec)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    t0 = time.perf_counter()
    writer.partitionBy(*partition_cols).parquet(path)
    dt = time.perf_counter() - t0
    import os

    n = sum(1 for e in os.scandir(path) if e.is_dir() and "=" in e.name)
    return PartitionedWriteResult(path=path, write_time_s=dt, n_partitions=n)


def lineitem_partitioned_by_shipyear(
    spark: SparkSession, sf_dir: str, out_path: str
) -> PartitionedWriteResult:
    """Canonical example: lineitem partitioned by ship year — the
    layout a 100 TB fact table would actually use (time-partitioned,
    pruned by every date-range query)."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_year", F.year("l_shipdate")
    )
    return write_partitioned(li, out_path, ["ship_year"])
