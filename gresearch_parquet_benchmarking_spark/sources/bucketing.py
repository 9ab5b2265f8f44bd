"""Bucketed-table co-location: the shuffle-free fact⋈fact join.

At 100 TB the dominant cost of lineitem ⋈ orders is shuffling BOTH
fact tables on the join key — neither side is broadcastable and AQE
can only resize that shuffle, not remove it. The storage-layout answer
is hash-bucketing both tables by the key at write time and declaring
it in the catalog: Spark's scan then reports the bucketing as its
output partitioning, the SortMergeJoin's distribution requirement is
already satisfied, and the Exchange disappears from the plan — the
join runs scan→sort→merge with zero network traffic. A pipeline that
joins the same fact tables repeatedly (every TPC-H-shaped query here
touches orders⋈lineitem) pays the bucketed write once and saves the
shuffle on every subsequent query.

This is catalog metadata + file layout, not a result change — the
joined rows are identical to the plain-parquet join (pinned by test) —
so it lives in sources/, not the query registry.

Bucket-count sizing at 100 TB: buckets ≈ total_bytes /
target_partition_bytes (e.g. 6 TB lineitem / 256 MB → ~24k buckets);
both tables MUST use the same count for co-location. Local tests use 8.

Reference parity: no analog — the reference reads standalone Parquet
files (data_read_benchmark.cc); co-location is Spark-catalog territory
(SURVEY.md §2.9 extension surface).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

BUCKETS = 8
_BASE = "/tmp/engine_bucketed"

_PAIR = (
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
)


def _table_name(tbl: str, sf_dir: str, buckets: int) -> str:
    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    return f"{tbl}_bkt{buckets}_{tag}"


def ensure_bucketed_pair(
    spark: SparkSession, sf_dir: str, buckets: int = BUCKETS, base: str = _BASE
) -> tuple[str, str]:
    """Write orders + lineitem as bucketed, bucket-sorted catalog
    tables (once per session; the parquet rewrite is the one-time cost
    the saved shuffles amortize). Returns the two table names."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    names = []
    for tbl, key in _PAIR:
        name = _table_name(tbl, sf_dir, buckets)
        names.append(name)
        if spark.catalog.tableExists(name):
            continue
        loc = os.path.join(base, name)
        (
            load_table(spark, sf_dir, tbl)
            .write.format("parquet")
            .option("path", loc)
            .bucketBy(buckets, key)
            .sortBy(key)
            .mode("overwrite")
            .saveAsTable(name)
        )
    return names[0], names[1]


def bucketed_orders_lineitem_join(
    spark: SparkSession, sf_dir: str, buckets: int = BUCKETS
) -> DataFrame:
    """The co-located join: both scans expose hashpartitioning(key,
    buckets), so the SMJ needs no Exchange on either side."""
    import pyspark.sql.functions as F

    orders_t, lineitem_t = ensure_bucketed_pair(spark, sf_dir, buckets)
    o = spark.table(orders_t)
    l = spark.table(lineitem_t)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"))
    )


def plain_orders_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same logical query over the raw (unbucketed) parquet — the
    shuffle-both-sides baseline the bucketed layout eliminates."""
    import pyspark.sql.functions as F

    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"))
    )
