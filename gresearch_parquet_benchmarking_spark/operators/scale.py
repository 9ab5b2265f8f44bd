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
from gresearch_parquet_benchmarking_spark.sources.tables import load_table
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


@query(
    "skew_key_histogram",
    oracle="""
    WITH per_key AS (
        SELECT l_partkey, COUNT(*)::BIGINT AS cnt
        FROM lineitem GROUP BY l_partkey
    ),
    bucketed AS (
        SELECT CAST(LENGTH(bin(cnt)) - 1 AS BIGINT) AS bucket_log2, cnt
        FROM per_key
    ),
    agg AS (
        SELECT bucket_log2,
               COUNT(*)::BIGINT AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS rows_in_bucket,
               MAX(cnt) AS max_key_rows
        FROM bucketed GROUP BY bucket_log2
    ),
    tot AS (
        SELECT CAST(SUM(rows_in_bucket) AS BIGINT) AS n,
               CAST(SUM(n_keys) AS BIGINT) AS k
        FROM agg
    )
    SELECT agg.bucket_log2, agg.n_keys, agg.rows_in_bucket,
           agg.max_key_rows,
           ROUND(agg.rows_in_bucket * 1.0 / tot.n, 9) AS rows_share,
           ROUND(agg.rows_in_bucket * 1.0 / agg.n_keys, 6) AS avg_key_rows,
           ROUND(tot.n * 1.0 / tot.k, 6) AS overall_avg_key_rows
    FROM agg CROSS JOIN tot
    ORDER BY agg.bucket_log2
    """,
)
def skew_key_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile of lineitem.l_partkey: per-key row counts
    folded into a log2 histogram (bucket b holds keys with 2^b ≤ rows
    < 2^(b+1)) plus each bucket's share of all rows — the diagnostic
    you run BEFORE choosing a shuffle strategy. A heavy tail here is
    the empirical trigger for the adaptive salting this repo applies
    (analytics._overlap_pairs) and for AQE skew-join thresholds; a
    flat profile means salting would only pay replication tax
    (round-5 lesson).

    Scale shape: one map-side-combined groupBy on the key, then a
    log2 bucket rollup whose cardinality is ≤64 regardless of data
    volume; the totals row broadcasts back onto it. No windows, no
    per-key sort — this is strictly cheaper than any join it informs.

    Determinism: counts are exact integers; floor(log2) is computed as
    the integer BIT LENGTH minus one (length(bin(cnt))−1) — never a
    libm log whose ratio form can land a ULP below an integer at exact
    powers of two; shares are single divisions of exact integers."""
    per_key = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = (
        per_key.select(
            (F.length(F.bin("cnt")) - 1).cast("long").alias("bucket_log2"),
            "cnt",
        )
        .groupBy("bucket_log2")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("cnt").cast("long").alias("rows_in_bucket"),
            F.max("cnt").alias("max_key_rows"),
        )
    )
    tot = agg.agg(
        F.sum("rows_in_bucket").cast("long").alias("n"),
        F.sum("n_keys").cast("long").alias("k"),
    )
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "bucket_log2",
            "n_keys",
            "rows_in_bucket",
            "max_key_rows",
            F.round(F.col("rows_in_bucket") * F.lit(1.0) / F.col("n"), 9).alias(
                "rows_share"
            ),
            F.round(
                F.col("rows_in_bucket") * F.lit(1.0) / F.col("n_keys"), 6
            ).alias("avg_key_rows"),
            F.round(F.col("n") * F.lit(1.0) / F.col("k"), 6).alias(
                "overall_avg_key_rows"
            ),
        )
        .orderBy("bucket_log2")
    )
