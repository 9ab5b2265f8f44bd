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
# Round 13 (VERDICT r12 "Next round" #3, rotation planned in CLAUDE.md
# during r12, verified against scripts_dev/staleness.py after
# CORRECTNESS_r12 landed): the 38 remaining r8-stale rows + the 5
# multimodal_* rows (r11 driver signal, but the audio container went
# WAVT→RIFF/WAVE in r12 so no driver hash exists for the current
# payload semantics) + the 7 oldest r9-stale, all in ledger order.
# After this round nothing is staler than r9; r14 takes the remaining
# 43 r9-stale + the 7 oldest r10-stale.
_WINDOW_PRIORITY = [
    # r8-stale, ledger order (38)
    "agg_rollup",
    "agg_cube",
    "agg_stats_moments",
    "agg_conditional",
    "having_filter",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "sort_limit_viewer",
    "multi_key_sort",
    "scalar_string_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "case_when_recode",
    "pivot_avg",
    "unpivot_long",
    "corr_matrix",
    "subquery_above_avg",
    "in_subquery",
    "correlated_exists_agg",
    "events_markov_transitions",
    "orders_seasonality_trailing",
    "basket_part_affinity",
    "supplier_concentration_hhi",
    "event_funnel_latency",
    "events_top_paths",
    "events_peak_concurrency",
    "events_value_twap_daily",
    "event_attribution_linear",
    "customer_order_streaks",
    "orders_date_spine_fill",
    "integrity_partition_checksums",
    "snapshot_diff_orders",
    "orders_abc_pareto",
    "orders_cohort_ltv",
    "supplier_otd_scorecard",
    "events_stickiness_dau_wau",
    "events_bot_screen",
    # multimodal payload semantics changed r12 (RIFF/WAVE upgrade) —
    # the r11 hashes no longer cover the current container bytes (5)
    "multimodal_binary_meta",
    "multimodal_decode_features",
    "multimodal_size_by_kind",
    "multimodal_resize",
    "multimodal_frame_sample",
    # the 7 oldest r9-stale, ledger order
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_late_shipments",
    "q15_top_supplier",
    "q16_supplier_part_count",
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
    # Round-12 window (r11 VERDICT "Next round" #1): all 43 remaining
    # r7-stale + the 7 oldest r8-stale. See _WINDOW_PRIORITY above.
    # r13 rotation plan (exact list in CLAUDE.md, written before the
    # window fills): the remaining 38 r8-stale rows + the 5
    # multimodal_* rows (container format changed in r12) + the 7
    # oldest r9-stale = exactly 50. Update tests/test_registry_window.py
    # when rotating.
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
