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


def test_overlap_pairs_salt_guard_correct_and_partitioned(spark, monkeypatch):
    """Hot-bin skew fixture: 120 mutually-overlapping single-session
    users in ONE hour bin plus disjoint background sessions, with the
    hotness threshold lowered so the hot bin crosses it. The adaptive
    salt must (a) return exactly the brute-force pair set, and (b)
    carry the salt in the join keys so the hot bin's quadratic work is
    split across its fanout instead of one task."""
    import itertools

    from pyspark.sql import functions as F

    monkeypatch.setattr(analytics, "HOT_BIN_SESSIONS", 32)
    H = analytics.US_PER_HOUR
    rows = []
    # hot bin: users 0..119, all sessions inside hour 1000, all overlap
    # (120 sessions / threshold 32 → fanout 4)
    for u in range(120):
        rows.append((u, 0, 1000 * H + u, 1000 * H + H // 2 + u))
    # background: one user per hour, no overlaps (fanout stays 1)
    for u in range(120, 160):
        h = 2000 + (u - 120) * 3
        rows.append((u, 0, h * H, h * H + H // 4))
    sessions = spark.createDataFrame(
        rows, "user_id long, session_id long, s long, e long"
    )
    binned = sessions.select(
        "user_id", "session_id", "s", "e",
        F.explode(F.sequence(F.expr(f"s div {H}"), F.expr(f"e div {H}"))).alias("bin"),
    )
    got = {
        (r.user_a, r.user_b)
        for r in analytics._overlap_pairs(binned).collect()
    }
    expect = {(a, b) for a, b in itertools.combinations(range(120), 2)}
    assert got == expect
    # salt must be a join key (equi-key alongside the bin id)
    from gresearch_parquet_benchmarking_spark.operators.registry import (
        release_persists,
    )
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    plan = formatted_plan(analytics._overlap_pairs(binned))
    release_persists()
    assert "salt" in plan, plan


def test_funnel_latency_invariants(spark):
    """Latency percentiles ordered; converter counts consistent with
    the funnel's own stage counts (purchase-converters ⊆
    click-converters); all latencies non-negative."""
    from gresearch_parquet_benchmarking_spark.operators.analytics import (
        event_funnel_conversion,
        event_funnel_latency,
    )
    from gresearch_parquet_benchmarking_spark.operators.registry import (
        release_persists,
    )

    lat = {r.stage: r for r in event_funnel_latency(spark, SF_SMOKE).collect()}
    release_persists()
    fun = event_funnel_conversion(spark, SF_SMOKE).collect()[0]
    release_persists()
    v2c, c2p = lat["view_to_click"], lat["click_to_purchase"]
    for r in (v2c, c2p):
        assert 0.0 <= r.p50_s <= r.p90_s <= r.max_s
    # the latency table's populations ARE the funnel's stage counts
    assert v2c.n_users == fun.n_click_after_view
    assert c2p.n_users == fun.n_purchase_after_click
    assert c2p.n_users <= v2c.n_users
