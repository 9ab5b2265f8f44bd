"""Registry surface for the bucketed co-located join layout.

The mechanics live in sources/bucketing.py (bucketed catalog writes,
the no-Exchange SMJ, the shuffle baseline; plan pinned by
tests/test_bucketing.py, timed by bench.py join_bucketed_colocated vs
join_shuffle_baseline). This module registers the oracle-checked query
over that layout so the driver's value-hash gate also covers the
bucketed read path end-to-end: bucketing is catalog metadata + file
layout, and must change NOTHING about the joined values — the DuckDB
twin is layout-blind by construction.

Scale rationale: see sources/bucketing.py — at 100 TB neither fact
table broadcasts, and pre-bucketing both sides on the join key at
write time removes the only shuffle AQE cannot (the join's).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import (
    dsum,
    query,
    sql_dsum,
)
from gresearch_parquet_benchmarking_spark.sources.bucketing import (
    ensure_bucketed_pair,
)


@query(
    "layout_bucketed_join",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders,
           COUNT(*) AS n_lines,
           {sql_dsum('l.l_extendedprice * (1.0 - l.l_discount)')} AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue/volume per order priority over the bucketed
    orders⋈lineitem pair: both sides pre-bucketed on the order key so
    the join runs with no Exchange (tests/test_bucketed_join.py pins
    the plan for THIS query; the oracle pins that the layout changed
    no value)."""
    o_name, l_name = ensure_bucketed_pair(spark, sf_dir)
    orders, lineitem = spark.table(o_name), spark.table(l_name)
    return (
        orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey, "inner"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count_distinct("o_orderkey").cast("long").alias("n_orders"),
            F.count(F.lit(1)).alias("n_lines"),
            dsum(
                F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                alias="revenue",
            ),
        )
        .orderBy("o_orderpriority")
    )


PRUNE_MONTH_LO = "1995-01"  # the probed quarter; every SF's orders span it
PRUNE_MONTH_HI = "1995-03"


@query(
    "layout_partition_pruned_scan",
    oracle=f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS o_ordermonth,
           o_orderpriority,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE strftime(o_orderdate, '%Y-%m') BETWEEN '{PRUNE_MONTH_LO}'
                                             AND '{PRUNE_MONTH_HI}'
    GROUP BY 1, 2
    ORDER BY o_ordermonth, o_orderpriority
    """,
)
def layout_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monthly order volume/value for one quarter, read from the
    Hive-partitioned orders layout (sources/partitioning.py): the
    month predicate hits the PARTITION column, so Catalyst prunes to
    the 3 qualifying directories at planning time — the other ~77
    months cost zero I/O and zero tasks (PartitionFilters + scanned
    file count pinned by tests/test_layout_partition.py). The DuckDB
    twin computes the same answer from the unpartitioned table: layout
    is metadata, values must not move."""
    from gresearch_parquet_benchmarking_spark.sources.partitioning import (
        PART_COL,
        ensure_partitioned_orders,
    )

    path = ensure_partitioned_orders(spark, sf_dir)
    return (
        spark.read.parquet(path)
        .filter(F.col(PART_COL).between(PRUNE_MONTH_LO, PRUNE_MONTH_HI))
        .groupBy(PART_COL, "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", alias="total_price"),
        )
        .orderBy(PART_COL, "o_orderpriority")
    )
