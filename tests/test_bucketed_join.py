"""Plan pin for the REGISTERED bucketed-join query (operators/scale.py
layout_bucketed_join): below the SortMergeJoin there must be no
Exchange — the bucketed scans satisfy the join's distribution
requirement directly. sources/bucketing.py's own mechanics (baseline
comparison, result parity with the plain join) are pinned by
test_bucketing.py; the oracle sweep pins the values."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators import scale


@pytest.fixture()
def no_broadcast(spark):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_registered_query_join_has_no_exchange(spark, no_broadcast):
    df = scale.layout_bucketed_join(spark, SF_SMOKE)
    df.collect()  # finalize AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    below_join = plan.split("SortMergeJoin")[-1]
    # the agg/sort above the join may exchange; the join itself must not
    assert "Exchange" not in below_join, below_join


def test_registered_query_shape(spark):
    rows = scale.layout_bucketed_join(spark, SF_SMOKE).collect()
    assert len(rows) == 5  # one per TPC-H order priority
    assert all(r.n_lines >= r.n_orders > 0 for r in rows)
