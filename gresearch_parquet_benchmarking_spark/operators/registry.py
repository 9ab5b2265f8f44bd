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
# Round 10 (VERDICT r9 "Next round" #2, rotation planned in CLAUDE.md
# during r9): dedup_semantic_agreement (r9 addition, ZERO lifetime
# driver signal — slot 0) + the 8 r9 reimplementations that were NOT
# in the r9 window (narrow two-pass rank / top-k-then-rank / map-side
# ntile graduations need hard driver signal) + the riskiest r6-stale
# streaming rows (_run_to_table's progress loop changed in r9, so the
# streaming pack goes before other r6-stale) + all 36 remaining
# r5-stale rows = exactly 50 per scripts_dev/staleness.py.
#
# Note on the written plan's count: curriculum_deciles is both an r9
# reimplementation AND r5-stale, so "8 + 37" double-counted it; the
# freed slot goes to stream_stream_join (5th streaming row — its state
# sizing ALSO changed in r8/r9). After this round nothing is staler
# than r6; r11 retires the remaining 45 r6-stale + 5 oldest r7-stale.
_WINDOW_PRIORITY = [
    # never driver-checked (added r9) — highest-risk slot, goes first
    "dedup_semantic_agreement",
    # r9 reimplementations without r9 driver signal (8)
    "window_ntile_percent",
    "tokenizer_vocab_coverage",
    "graph_link_prediction_ra",
    "window_rank_in_brand",
    "curriculum_deciles",  # also r5-stale — occupies one slot, not two
    "events_inter_arrival_percentiles",
    "events_rfm_scores",
    "events_power_user_concentration",
    # riskiest r6-stale: the streaming pack (5) — progress loop changed r9
    "stream_hourly_counts",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_static_enrich",
    "stream_stream_join",
    # r5-stale (all 36 remaining — retires the cohort completely)
    "event_funnel_conversion",
    "cohort_retention",
    "events_sliding_active_users",
    "event_attribution_last_touch",
    "sketch_kmv_distinct",
    "sketch_hll_distinct",
    "sketch_bloom_membership",
    "sketch_countmin_freq",
    "text_contamination_overlap",
    "text_redact_blocklist",
    "text_repetition_ratio",
    "sample_stratified_by_lang",
    "text_chunk_tokens",
    "kmeans_reassign_matrix",
    "embedding_sim_histogram",
    "dedup_chunk_boilerplate",
    "sample_importance_weighted",
    "mixture_rebalance",
    "text_langid_confusion",
    "dedup_minhash_calibration",
    "quality_vs_dup_lift",
    "text_pmi_collocations",
    "bigram_logprob_score",
    "embedding_norms",
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    "ann_ivf_topk_nprobe2",
    "ann_lsh_topk",
    "embedding_cosine_neardup",
    "embedding_quantize_int8",
    "ann_ivf_recall",
    "ann_lsh_recall",
    "embedding_dim_covariance",
    "embedding_whitening",
    "ann_pq_codebook",
    "ann_ivf_pq_recall",
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
    # Round-9 window (r8 VERDICT "Next round" #1): all r3-stale (12) +
    # all r4-stale (27, window_range_frame promoted to slot 0 as the
    # r8-reimplemented row) + the 11 riskiest r5-stale. See
    # _WINDOW_PRIORITY above for the exact list.
    # r10 rotation plan (exact list in CLAUDE.md, written before the
    # window fills): dedup_semantic_agreement (r9 addition, zero
    # lifetime signal — slot 0) + the 8 r9 reimplementations not in
    # the r9 window (window_range_frame precedent) + all 37 remaining
    # r5-stale rows + the 4 riskiest r6-stale (streaming pack)
    # = exactly 50. Update tests/test_registry_window.py when
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
