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

# Round-5 window (VERDICT r4 "Next round" #1): the six queries no
# driver round ever checked, every query whose code changed in r5, and
# the text/multimodal/pipeline/sketches modules whose driver signal has
# been stale since r1–r3.
MUST_BE_IN_WINDOW = [
    # never driver-checked before round 5 (late-r4 additions)
    "event_funnel_conversion",
    "cohort_retention",
    "events_sliding_active_users",
    "interval_overlap_users",
    "sketch_hll_rolling_users",
    "dedup_chunk_boilerplate",
    # brand-new in round 5
    "curriculum_buckets_approx",
    "text_langid_confusion",
    "dedup_minhash_calibration",
    "quality_vs_dup_lift",
    "embedding_dim_covariance",
    "embedding_whitening",
    "ann_pq_codebook",
    "ann_ivf_pq_topk",
    "ann_ivf_pq_recall",
    "embedding_pca_power_iteration",
    "text_pmi_collocations",
    "bigram_logprob_score",
    "event_attribution_last_touch",
    "split_contamination_safe",
    # changed in round 5 (distributed prefix sum, NaN-safe centroid
    # comparator, kmeans persist, funnel zero guards, overlap oracle
    # ordering)
    "sequence_packing",
    "curriculum_deciles",
    "kmeans_train",
    "ann_ivf_topk",
    "ann_ivf_topk_nprobe2",
    "ann_ivf_recall",
    "dedup_semantic",
    "kmeans_reassign_matrix",
    # stale driver signal — whole modules now in-window
    "sketch_kmv_distinct",        # sketches: r2
    "sketch_hll_distinct",
    "sketch_bloom_membership",
    "sketch_countmin_freq",
    "text_token_stats",           # text: r2 (the module's tail —
    # quality_score onward — is displaced by the 17 new r5 queries:
    # new-never-checked beats stale-but-green)
    "text_term_frequency",
    "text_contamination_overlap",  # pipeline: r1/r2
    "text_redact_blocklist",
    "sample_stratified_by_lang",
    # (multimodal — r3-green — is fully displaced by the 10 new r5
    # queries: new-never-checked beats stale-but-green)
    "dedup_connected_components",  # graph: r3
    # displaced: pipeline2, events_stream, dedup, advanced, scale — all
    # fresh r4-green and untouched in r5 (except the
    # behavior-preserving NaN branch stream_centroid_assign shares);
    # fresh-green needs no repeat, all stay under the local gate
]


def test_round5_window_composition():
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
