"""AQE skew-join handling: a pathologically hot key must be split into
multiple tasks instead of stalling one reducer (thresholds lowered so
local-scale data triggers the same machinery a 100 TB skew would)."""

from __future__ import annotations

import pyspark.sql.functions as F


def test_aqe_splits_skewed_partition(spark):
    # 200k rows of one hot key + uniform tail, joined to a dim
    left = spark.range(0, 220_000).select(
        F.when(F.col("id") < 200_000, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
        F.rand(1).alias("x"),
    )
    right = spark.range(0, 1000).select(F.col("id").alias("k"), F.rand(2).alias("y"))

    prev = {
        c: spark.conf.get(c)
        for c in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = left.join(right, "k")
        # collect() executes joined's own QueryExecution, materializing
        # the AQE final plan on this exact DataFrame (count() would
        # build a separate execution and leave this plan un-finalized)
        assert len(joined.collect()) == 220_000
        from gresearch_parquet_benchmarking_spark.plans.explain import simple_plan

        plan = simple_plan(joined)
        # AQE marks the rebalanced join: SortMergeJoin(skew=true) and/or
        # AQEShuffleRead with skewed partition splits
        assert "skew=true" in plan, plan[:2000]
    finally:
        for c, v in prev.items():
            spark.conf.set(c, v)
