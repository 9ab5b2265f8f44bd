"""Partition pruning on the Hive-partitioned orders layout: the month
predicate must resolve to directory pruning (metadata, zero I/O for
non-matching months), not a filter over a full scan."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_CORRECT

from gresearch_parquet_benchmarking_spark.operators.scale import (
    PRUNE_MONTH_HI,
    PRUNE_MONTH_LO,
    layout_partition_pruned_scan,
)
from gresearch_parquet_benchmarking_spark.sources.partitioning import (
    PART_COL,
    ensure_partitioned_orders,
)


def _scan_metrics(df) -> dict[str, int]:
    """Executed-plan scan metrics (numFiles/numPartitions) — the
    ground truth for pruning; df.inputFiles() reports the UNPRUNED
    relation listing and cannot prove anything."""
    df.collect()
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    out: dict[str, int] = {}
    for i in range(leaves.size()):
        it = leaves.apply(i).metrics().iterator()
        while it.hasNext():
            kv = it.next()
            out[kv._1()] = kv._2().value()
    return out


def test_scan_reads_only_matching_partitions(spark):
    path = ensure_partitioned_orders(spark, SF_CORRECT)
    full = spark.read.parquet(path)
    n_months = full.select(PART_COL).distinct().count()
    assert n_months > 10  # the layout actually spans the date range
    pruned = full.filter(
        F.col(PART_COL).between(PRUNE_MONTH_LO, PRUNE_MONTH_HI)
    )
    m = _scan_metrics(pruned)
    # planning-time pruning: exactly the 3 qualifying month directories
    # were read, out of the full span
    assert m["numPartitions"] == 3
    assert m["numFiles"] < n_months


def test_partition_filters_in_plan(spark):
    """AQE-stable pin: the scan node carries the month predicate as a
    PartitionFilter (planning-time pruning), and the registered query's
    plan contains no full-table scan of the layout."""
    df = layout_partition_pruned_scan(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert PART_COL in plan.split("PartitionFilters", 1)[1][:400]
