"""Unit pins for plans.explain.executed_shuffle_bytes — the measurement
the scale-shape gate (test_scale_shapes.py) depends on. Two properties
matter and both broke silently during development:

1. Shuffles BELOW a persist boundary must be counted: the final plan
   shows only InMemoryTableScan, and the build-side exchange lives in
   the cached relation's plan (r7 lesson: bm25/triangle shuffle bytes
   read ~0 before the walker followed cachedPlan).
2. A cached relation scanned from several consumers must count its
   build shuffle ONCE (node-id dedup).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.plans.explain import executed_shuffle_bytes


def test_counts_plain_shuffle(spark):
    df = (
        spark.range(0, 100_000)
        .select((F.col("id") % 97).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
    )
    df.collect()
    assert executed_shuffle_bytes(df) > 0


def test_counts_shuffle_below_persist_boundary(spark):
    agg = (
        spark.range(0, 100_000)
        .select((F.col("id") % 97).alias("k"), F.col("id").alias("v"))
        .groupBy("k")
        .agg(F.sum("v").alias("s"))
        .persist()
    )
    try:
        out = agg.filter(F.col("s") > 0).select("k")
        out.collect()
        below = executed_shuffle_bytes(out)
        assert below > 0, "persist boundary hid the build-side shuffle"

        # the same cached relation consumed twice: the build shuffle
        # must not double (the union adds no hash exchange of its own).
        # The bound must sit BELOW 2x — a regressed walker that counts
        # the build shuffle once per consumer lands exactly at 2x below
        # (r8 advice: the original <= 2x bound was vacuous)
        twice = agg.select("k").unionAll(agg.select("k"))
        twice.collect()
        assert executed_shuffle_bytes(twice) <= 1.5 * below
    finally:
        agg.unpersist()
