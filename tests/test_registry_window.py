"""Pin the registration order contract: the driver's correctness sweep
snapshots only the FIRST 50 registrations per round, so which queries
get hard driver signal is decided by import order in
registry._ensure_loaded. These tests fail loudly if a refactor
reshuffles the window (VERDICT r2: 18 queries went a full round with
no driver signal because of exactly such a reorder)."""

from __future__ import annotations

from gresearch_parquet_benchmarking_spark.operators.registry import (
    all_oracle_sql,
    all_queries,
)

WINDOW = 50

# Round-6 window (VERDICT r5 "Next round" #1, refined by the measured
# per-module staleness audit — see registry._ensure_loaded): the two
# queries with ZERO lifetime driver signal, then the stalest driver
# signal first (relational/relational2 r1, profile r2, report/
# multimodal/text-tail r3).
MUST_BE_IN_WINDOW = [
    # ZERO lifetime driver signal (the round's hard requirement)
    "stream_funnel_stateful",
    "text_winnowing_fingerprints",
    # events_stream — rest r4-green, rides along with the funnel
    "stream_hourly_counts",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_static_enrich",
    "stream_stream_join",
    "stream_dedup_incremental",
    "stream_centroid_assign",
    "stream_funnel_buffered_ooo",  # r6-new: out-of-order buffered funnel
    "stream_late_data_audit",      # r6-new: watermark-drop accounting
    "stream_user_latest_state",    # r6-new: upsert current-state table
    # text — tail r3-stale
    "text_token_stats",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "doc_stats_by_lang_source",
    "text_subword_tokens",
    "text_tfidf_top_terms",
    # report — r3-stale
    "json_extract_events",
    "events_by_day",
    "events_pivot_by_type",
    "sessionization",
    "asof_join_purchase_click",
    "range_join_price_bands",
    # multimodal — r3-stale
    "multimodal_binary_meta",
    "multimodal_decode_features",
    "multimodal_size_by_kind",
    "multimodal_resize",
    "multimodal_frame_sample",
    # profile — r2-stale
    "profile_lineitem_columns",
    # relational2 — r1-stale (stalest whole module)
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "merge_upsert_orders",
    "q19_disjunctive_predicates",
    "q22_idle_customers",
    "q2_cheapest_per_brand",
    "q4_priority_with_big_lines",
    "q13_customer_distribution",
    "q14_promo_revenue_ratio",
    "q21_multi_supplier_orders",
    # relational — r1-stale, first 11 of 37 fit; remainder heads r7
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "join_left_outer",
    "join_semi",
    "join_anti",
    # (join_full_outer, join_cross_small and window_rank_in_brand fell
    # past the 50-cut as r6's three new events_stream queries entered
    # the window head; they join relational's remaining 29 at the r7
    # head)
    # displaced: analytics/sketches/pipeline/pipeline3/graph/quality/
    # similarity — all fresh r5-green (fresh-green needs no repeat);
    # dedup/advanced/scale/pipeline2/tpch2 (r3/r4) head the r7 window
    # together with relational's remaining 26.
]


def test_round6_window_composition():
    names = list(all_queries())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_BE_IN_WINDOW if n not in window]
    assert not missing, f"queries fell out of the driver's first-{WINDOW} window: {missing}"


ROWS_ONLY_BY_DESIGN: set[str] = set()
# (empty since round 4: agg_approx_sketches gained a bounds oracle —
# exact values + within-error-bound booleans vs literal TRUEs — so
# every registered query is now value-hash gated)


def test_every_query_has_oracle():
    """Since round 4 every registered query has a DuckDB twin (including
    dedup_connected_components via recursive CTE and the sketch bounds
    contract). A new rows-only query must be added to the exemption set
    above deliberately, not slip in silently."""
    qs, sqls = all_queries(), all_oracle_sql()
    no_oracle = sorted(set(qs) - set(sqls) - ROWS_ONLY_BY_DESIGN)
    assert no_oracle == [], f"queries without oracle twins: {no_oracle}"


def test_lazy_oracles_resolve_to_sql():
    sqls = all_oracle_sql()
    bad = {k: type(v).__name__ for k, v in sqls.items() if not isinstance(v, str)}
    assert not bad, f"unresolved oracle entries: {bad}"
