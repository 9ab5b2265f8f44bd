"""Approx-sketch error bounds + bucketed-join shuffle elimination."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from conftest import SF_CORRECT, SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators.advanced import agg_approx_sketches
from gresearch_parquet_benchmarking_spark.plans.explain import simple_plan
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


def test_approx_sketches_within_bounds(spark):
    """The query now self-checks its sketch contract: every row must
    report exact counts plus all-TRUE bound booleans (the oracle twin
    hash-compares against literal TRUEs)."""
    rows = agg_approx_sketches(spark, SF_CORRECT).collect()
    li = load_table(spark, SF_CORRECT, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.countDistinct("l_orderkey").alias("orders"),
        )
        .collect()
    }
    assert len(rows) == len(exact) > 0
    for a in rows:
        e = exact[a.l_returnflag]
        assert a.exact_parts == e.parts
        assert a.exact_orders == e.orders
        assert a.parts_within_15pct is True
        assert a.orders_within_5pct is True
        assert a.median_within_rank_1pct is True


@pytest.fixture()
def bucketed_tables(spark):
    names = ("bkt_orders", "bkt_customer")
    od = load_table(spark, SF_SMOKE, "orders")
    cu = load_table(spark, SF_SMOKE, "customer")
    od.write.bucketBy(8, "o_custkey").sortBy("o_custkey").mode("overwrite").saveAsTable(names[0])
    cu.selectExpr("c_custkey", "c_name").write.bucketBy(8, "c_custkey").sortBy(
        "c_custkey"
    ).mode("overwrite").saveAsTable(names[1])
    yield names
    for n in names:
        spark.sql(f"DROP TABLE IF EXISTS {n}")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_avoids_shuffle(spark, bucketed_tables):
    """Co-located (bucketed) join: no Exchange on either side — the
    pre-shuffle layout every repeated 100 TB join should use."""
    od, cu = (spark.table(n) for n in bucketed_tables)
    joined = od.join(cu.hint("merge"), od.o_custkey == cu.c_custkey)
    # disable broadcast so the join strategy is the bucket-aware SMJ
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = od.join(cu, od.o_custkey == cu.c_custkey)
        joined.collect()
        plan = simple_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
