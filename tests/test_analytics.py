"""Shape/invariant tests for the event-analytics trio (values are
pinned by the oracle sweep; these pin the semantics)."""

from __future__ import annotations

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators import analytics


def test_funnel_is_monotone(spark):
    (row,) = analytics.event_funnel_conversion(spark, SF_SMOKE).collect()
    assert row.n_users >= row.n_view >= row.n_click_after_view >= row.n_purchase_after_click
    assert row.n_view > 0
    assert 0.0 <= row.click_to_purchase <= 1.0 <= row.n_users


def test_cohort_day0_retention_is_one(spark):
    out = analytics.cohort_retention(spark, SF_SMOKE).toPandas()
    day0 = out[out.day_offset == 0]
    assert len(day0) == out.cohort_day.nunique()
    assert (day0.retention == 1.0).all()
    assert (out.retention <= 1.0).all() and (out.retention > 0).all()
    assert (out.day_offset <= analytics.RETENTION_MAX_OFFSET).all()


def test_sliding_windows_overlap(spark):
    out = analytics.events_sliding_active_users(spark, SF_SMOKE).toPandas()
    # every event lands in exactly 2 windows → total window-event
    # memberships are twice the event count
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    n_events = load_events(spark, SF_SMOKE).count()
    assert out.n_events.sum() == 2 * n_events
    assert (out.n_users <= out.n_events).all()
