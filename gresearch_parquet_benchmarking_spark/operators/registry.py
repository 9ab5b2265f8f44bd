"""Query registry: the engine's oracle-checked operator surface.

Every operator from SURVEY.md §2 (and the LLM-pipeline extensions) is a
named entry: a PySpark builder ``(spark, sf_dir) -> DataFrame`` plus —
when SQL-expressible — an equivalent DuckDB SQL string. The driver's
correctness harness runs both and hash-compares results.

Determinism contract (critical for the value-hash gate):

* Floating-point SUMs are order-dependent in IEEE double; Spark's
  partial aggregation order differs from DuckDB's. Every money/quantity
  sum therefore goes through an exact DECIMAL accumulator and is cast
  back to DOUBLE: ``CAST(SUM(CAST(x AS DECIMAL(27,4))) AS DOUBLE)``.
  Decimal addition is associative ⇒ identical bits on both engines.
  Per-row double arithmetic (products, subtractions) is IEEE-identical
  across engines, so casting the *result* of a row expression is safe.
* AVG is built as exact-decimal-sum / count (double division of two
  deterministic doubles).
* Timestamps/dates are never emitted raw (session-TZ and pandas
  representation pitfalls — datetime.date vs datetime64): outputs use
  ISO strings (``iso_date``/``sql_iso_date``) or epoch integers.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str | Callable[[], str]] = {}


def query(
    name: str, oracle: str | Callable[[], str] | None = None
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` under ``name``; ``oracle`` is the DuckDB-SQL twin.

    ``oracle`` may be a zero-arg callable resolved lazily at
    ``all_oracle_sql()`` time — for oracles whose SQL is composed from
    another module's fragments without forcing that module to import
    (and register its queries) at decoration time, which would disturb
    the deliberate registration order.

    Omit ``oracle`` only for genuinely non-SQL-expressible operators —
    the driver then records a weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# Canonical ordering for the registry listing. The driver's correctness
# sweep snapshots the FIRST 50 entries of all_queries(), so this ranking
# — not Python import order, which any direct module import can perturb
# — decides which queries get hard driver signal.
#
# Round 11 (VERDICT r10 "Next round" #1, rotation planned in CLAUDE.md
# during r10, verified against scripts_dev/staleness.py after
# CORRECTNESS_r10 landed): ALL 45 remaining r6-stale rows + the 5
# riskiest r7-stale. Ordering within the window: the six r6-stale
# streaming rows first (_run_to_table's progress loop changed in r9 —
# these are the only r6 rows whose execution machinery changed since
# their last signal), then the three r7-stale trending-module streaming
# rows (same machinery), then dedup_containment_bottomk (candidate rule
# rewritten r8) and graph_pagerank_bipartite (iterative), then the
# multimodal pack (decode kernel replaced with a real byte-level
# decoder THIS round — needs fresh driver signal), then the remaining
# r6-stale batch packs. After this round nothing is staler than r7;
# r12 takes the remaining 45 r7-stale + 5 oldest r8-stale.
_WINDOW_PRIORITY = [
    # r6-stale streaming pack (6) — riskiest: progress loop changed r9
    "stream_dedup_incremental",
    "stream_centroid_assign",
    "stream_funnel_stateful",
    "stream_funnel_buffered_ooo",
    "stream_late_data_audit",
    "stream_user_latest_state",
    # r7-stale riskiest (5): trending module rides _run_to_table too;
    # containment's candidate rule is the r8 rewrite; pagerank iterates
    "stream_topk_trending",
    "stream_psi_value_drift",
    "stream_integrity_checksum",
    "dedup_containment_bottomk",
    "graph_pagerank_bipartite",
    # r6-stale multimodal pack (5) — decode kernel replaced in r11
    "multimodal_binary_meta",
    "multimodal_decode_features",
    "multimodal_size_by_kind",
    "multimodal_resize",
    "multimodal_frame_sample",
    # r6-stale relational pack (8)
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "join_left_outer",
    "join_semi",
    "join_anti",
    # r6-stale text pack (9)
    "text_token_stats",
    "text_term_frequency",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "doc_stats_by_lang_source",
    "text_subword_tokens",
    "text_tfidf_top_terms",
    "text_winnowing_fingerprints",
    # r6-stale report pack (6)
    "json_extract_events",
    "events_by_day",
    "events_pivot_by_type",
    "sessionization",
    "asof_join_purchase_click",
    "range_join_price_bands",
    # r6-stale profile (1)
    "profile_lineitem_columns",
    # r6-stale relational2 pack (10)
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
]
assert len(_WINDOW_PRIORITY) == 50 and len(set(_WINDOW_PRIORITY)) == 50

# Tail order for everything outside the explicit window (staleness
# bookkeeping only — the driver never sees past entry 50).
_MODULE_ORDER = [
    "operators.relational",
    "operators.tpch2",
    "operators.analytics",
    "operators.analytics2",
    "streaming.events_stream",
    "operators.text",
    "operators.report",
    "operators.multimodal",
    "operators.profile",
    "operators.relational2",
    "operators.dedup",
    "operators.advanced",
    "operators.scale",
    "operators.pipeline2",
    "operators.sketches",
    "operators.pipeline",
    "operators.pipeline3",
    "operators.graph",
    "operators.quality",
    "operators.similarity",
    "operators.retrieval",
    "operators.dataquality",
    "operators.drift",
    "streaming.trending",
]
_PKG = "gresearch_parquet_benchmarking_spark"
_MODULE_RANK = {f"{_PKG}.{m}": i for i, m in enumerate(_MODULE_ORDER)}
_WINDOW_RANK = {name: i for i, name in enumerate(_WINDOW_PRIORITY)}


def all_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    idx = {name: i for i, name in enumerate(QUERIES)}
    return dict(
        sorted(
            QUERIES.items(),
            key=lambda kv: (
                _WINDOW_RANK.get(kv[0], len(_WINDOW_PRIORITY)),
                _MODULE_RANK.get(kv[1].__module__, len(_MODULE_ORDER)),
                idx[kv[0]],
            ),
        )
    )


def all_oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    for k, v in ORACLE_SQL.items():
        if callable(v):
            ORACLE_SQL[k] = v()
    return dict(ORACLE_SQL)


def _ensure_loaded() -> None:
    # Import for registration side effects; idempotent. (The window is
    # decided by _WINDOW_PRIORITY + _MODULE_ORDER, not import order —
    # imports here only trigger registration.)
    #
    # Round-11 window (r10 VERDICT "Next round" #1): all 45 remaining
    # r6-stale + the 5 riskiest r7-stale. See _WINDOW_PRIORITY above.
    # r12 rotation plan (exact list in CLAUDE.md, written before the
    # window fills): the 45 remaining r7-stale rows + the 5 oldest
    # r8-stale = exactly 50. Update tests/test_registry_window.py when
    # rotating.
    # Everything outside the window stays pinned by the local
    # full-registry gate (scripts_dev/check_queries.py).
    from gresearch_parquet_benchmarking_spark.operators import (  # noqa: F401
        pipeline2,
        pipeline3,
        scale,
        similarity,
    )
    from gresearch_parquet_benchmarking_spark.streaming import events_stream  # noqa: F401
    from gresearch_parquet_benchmarking_spark.operators import (  # noqa: F401
        advanced,
        analytics,
        dedup,
        quality,
        sketches,
        pipeline,
        graph,
        profile,
    )
    from gresearch_parquet_benchmarking_spark.operators import (  # noqa: F401
        text,
        multimodal,
        report,
        tpch2,
        relational,
        relational2,
        retrieval,
        dataquality,
        drift,
        analytics2,
    )
    from gresearch_parquet_benchmarking_spark.streaming import trending  # noqa: F401


# ---------------------------------------------------------------------------
# Tracked persists: query builders persist join-reused intermediates but
# cannot unpersist before the caller's terminal action (they return a
# lazy DataFrame). Sweeps that run many queries back-to-back call
# release_persists() between queries so cached blocks don't accumulate
# in executor memory; a driver that instead calls
# spark.catalog.clearCache() gets the same effect.
# ---------------------------------------------------------------------------

_TRACKED_PERSISTS: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """``df.persist()`` + register for :func:`release_persists`."""
    _TRACKED_PERSISTS.append(df.persist())
    return df


def release_persists() -> None:
    """Unpersist every frame registered via :func:`track_persist`."""
    while _TRACKED_PERSISTS:
        _TRACKED_PERSISTS.pop().unpersist()


# ---------------------------------------------------------------------------
# Deterministic-aggregate helpers (see module docstring).
# ---------------------------------------------------------------------------

def dsum(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Order-independent SUM of a double column via DECIMAL accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(27,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def davg(col: Column | str, scale: int = 4, alias: str | None = None) -> Column:
    """Order-independent AVG: exact decimal sum / count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    out = (F.sum(c.cast(f"decimal(27,{scale})")).cast("double") / F.count(c)).cast("double")
    return out.alias(alias) if alias else out


def iso_date(col: Column | str, alias: str | None = None) -> Column:
    """Emit a date-valued expression as its ISO string — identical
    plain-Python strings from both engines under any hasher."""
    c = F.col(col) if isinstance(col, str) else col
    out = c.cast("date").cast("string")
    return out.alias(alias) if alias else out


def sql_iso_date(expr: str) -> str:
    return f"CAST(CAST({expr} AS DATE) AS VARCHAR)"


def sql_dsum(expr: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS DECIMAL(27,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
