"""Pins the whole point of bucketing: the join plan loses its
Exchanges, and the results stay identical to the plain join."""

from __future__ import annotations

import pytest

from gresearch_parquet_benchmarking_spark.sources.bucketing import (
    bucketed_orders_lineitem_join,
    plain_orders_lineitem_join,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Disable auto-broadcast so the test exercises the SMJ path —
    at sf0.001 AQE would otherwise broadcast orders and hide the
    shuffle this layout exists to remove."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_has_no_join_exchange(spark, no_broadcast):
    df = bucketed_orders_lineitem_join(spark, SF_DIR)
    df.collect()  # finalize AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    pre_agg = plan.split("SortMergeJoin")[-1]
    # below the join there must be no shuffle: scans feed sorts feed
    # the SMJ directly (the agg above may still exchange on its key)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in pre_agg, pre_agg


def test_plain_join_shuffles_both_sides(spark, no_broadcast):
    df = plain_orders_lineitem_join(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    pre_agg = plan.split("SortMergeJoin")[-1]
    assert plan.count("Exchange") >= 2, plan
    assert "Exchange" in pre_agg


def test_bucketed_join_results_match_plain(spark, no_broadcast):
    b = {r["o_orderpriority"]: r["n_items"]
         for r in bucketed_orders_lineitem_join(spark, SF_DIR).collect()}
    p = {r["o_orderpriority"]: r["n_items"]
         for r in plain_orders_lineitem_join(spark, SF_DIR).collect()}
    assert b == p and len(b) == 5
