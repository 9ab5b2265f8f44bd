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

# Never driver-checked before round 3 (VERDICT r2 "What's wrong" #2)
# plus the three r2 HASH-FAIL fixes and the newly-oracle'd graph query.
MUST_BE_IN_WINDOW = [
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_late_shipments",
    "q15_top_supplier",
    "q16_supplier_part_count",
    "q20_promo_suppliers",
    "array_ops",
    "window_range_frame",
    "agg_sum_distinct",
    "agg_min_max_dates",
    "salted_hot_key_agg",
    "sample_hash_based",
    "agg_regression",
    "window_first_last_nth",
    "scalar_null_funcs",
    "doc_stats_by_lang_source",
    "multimodal_size_by_kind",
    "json_extract_events",
    "dedup_connected_components",
    # round-3 additions (pipeline2)
    "text_bigram_counts",
    "train_test_split_hash",
    "quality_filter_funnel",
    "doc_length_histogram",
    "dup_rate_by_source",
    "token_percentiles_by_lang",
    "vocab_cooccurrence",
    "text_char_entropy",
    "events_daily_anomaly",
]


def test_round3_window_composition():
    names = list(all_queries())
    window = set(names[:WINDOW])
    missing = [n for n in MUST_BE_IN_WINDOW if n not in window]
    assert not missing, f"queries fell out of the driver's first-{WINDOW} window: {missing}"


ROWS_ONLY_BY_DESIGN = {
    # approx_percentile/HLL sketch VALUES are engine-specific; the query
    # exists for the 100 TB path and is benchmarked, not value-hashed
    "agg_approx_sketches",
}


def test_every_query_has_oracle():
    """Since round 3 every registered query has a DuckDB twin (including
    dedup_connected_components via recursive CTE) except the explicit
    rows-only exemptions above. A new rows-only query must be added
    there deliberately, not slip in silently."""
    qs, sqls = all_queries(), all_oracle_sql()
    no_oracle = sorted(set(qs) - set(sqls) - ROWS_ONLY_BY_DESIGN)
    assert no_oracle == [], f"queries without oracle twins: {no_oracle}"


def test_lazy_oracles_resolve_to_sql():
    sqls = all_oracle_sql()
    bad = {k: type(v).__name__ for k, v in sqls.items() if not isinstance(v, str)}
    assert not bad, f"unresolved oracle entries: {bad}"
