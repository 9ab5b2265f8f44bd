"""Pin the registration order contract: the driver's correctness sweep
snapshots only the FIRST 50 entries of all_queries() per round, so which
queries get hard driver signal is decided by registry._WINDOW_PRIORITY
(+ _MODULE_ORDER for the tail). These tests fail loudly if a refactor
reshuffles the window (VERDICT r2: 18 queries went a full round with no
driver signal because of exactly such a reorder)."""

from __future__ import annotations

import json
import re
from pathlib import Path

from gresearch_parquet_benchmarking_spark.operators.registry import (
    _WINDOW_PRIORITY,
    all_oracle_sql,
    all_queries,
)

WINDOW = 50

# Round-10 window (VERDICT r9 "Next round" #2, rotation planned in
# CLAUDE.md during r9): dedup_semantic_agreement (never driver-checked)
# + the 8 r9 reimplementations without r9 driver signal + the 5-row
# streaming pack (riskiest r6-stale: _run_to_table's progress loop
# changed in r9) + all 36 remaining r5-stale. curriculum_deciles is
# both an r9 reimplementation and r5-stale — the written plan's
# "8 + 37" double-counted it, and the freed slot went to
# stream_stream_join. The canonical list lives in
# registry._WINDOW_PRIORITY; these tests pin that the listing honors
# it AND that the composition matches the staleness ledger in the
# committed CORRECTNESS artifacts.
MUST_BE_IN_WINDOW = list(_WINDOW_PRIORITY)

# The 8 queries reworked in r9 (narrow two-pass rank, top-k-then-rank,
# map-side ntile) that were outside the r9 window — their committed
# last-signal round predates the reimplementation, so the staleness
# ledger alone would NOT schedule them.
R9_REIMPLEMENTED = {
    "window_ntile_percent",
    "tokenizer_vocab_coverage",
    "graph_link_prediction_ra",
    "window_rank_in_brand",
    "curriculum_deciles",
    "events_inter_arrival_percentiles",
    "events_rfm_scores",
    "events_power_user_concentration",
}

STREAMING_PACK = {
    "stream_hourly_counts",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_static_enrich",
    "stream_stream_join",
}


def test_round10_window_composition():
    names = list(all_queries())
    window = names[:WINDOW]
    assert window == MUST_BE_IN_WINDOW, (
        "driver first-50 window diverged from _WINDOW_PRIORITY:\n"
        f"got:      {window}\nexpected: {MUST_BE_IN_WINDOW}"
    )


def _last_driver_signal(through_round: int) -> dict[str, int]:
    """query -> latest round <= through_round whose committed
    CORRECTNESS artifact contains it; absent = never driver-checked.
    Regex round parse so r10+ artifacts are counted (ADVICE r8)."""
    repo = Path(__file__).resolve().parents[1]
    last: dict[str, int] = {}
    for art in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", art.name)
        if not m or int(m.group(1)) > through_round:
            continue
        rnd = int(m.group(1))
        for q in json.loads(art.read_text()):
            last[q] = max(last.get(q, 0), rnd)
    return last


def test_round10_window_head_is_never_checked_row():
    """dedup_semantic_agreement was added in r9 with zero lifetime
    driver signal — it must head the window."""
    assert MUST_BE_IN_WINDOW[0] == "dedup_semantic_agreement"
    last = _last_driver_signal(through_round=9)
    if last:
        assert "dedup_semantic_agreement" not in last


def test_round10_window_slots_justified():
    """Every window slot must go to (a) a never-driver-checked query,
    (b) an r9-reimplemented query, or (c) a query whose last signal is
    r5 or r6 — the two stalest cohorts (r6 slots are the streaming
    pack). No slot may be wasted on a fresher query."""
    last = _last_driver_signal(through_round=9)
    if not last:  # artifacts absent in a bare checkout — nothing to pin
        return
    wasted = [
        n
        for n in MUST_BE_IN_WINDOW
        if n in last
        and last[n] not in (5, 6)
        and n not in R9_REIMPLEMENTED
    ]
    assert wasted == [], f"window slots wasted on fresh queries: {wasted}"
    r6 = [n for n in MUST_BE_IN_WINDOW if last.get(n) == 6]
    assert set(r6) == STREAMING_PACK, (
        f"r6 slots must be exactly the streaming pack, got: {sorted(r6)}"
    )


def test_round10_window_covers_all_r5_stale():
    """The r5-stale cohort must be retired COMPLETELY this round —
    after r10 no registered query's last signal predates r6."""
    last = _last_driver_signal(through_round=9)
    if not last:
        return
    registered = set(all_queries())
    oldest = sorted(n for n, r in last.items() if r == 5 and n in registered)
    missing = [n for n in oldest if n not in set(MUST_BE_IN_WINDOW)]
    assert missing == [], f"r5-stale queries left out of the window: {missing}"


def test_round10_window_covers_all_r9_reimplementations():
    missing = sorted(R9_REIMPLEMENTED - set(MUST_BE_IN_WINDOW))
    assert missing == [], f"r9 reimplementations without a slot: {missing}"


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
