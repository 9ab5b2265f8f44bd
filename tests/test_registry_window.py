"""Pin the registration order contract: the driver's correctness sweep
snapshots only the FIRST 50 entries of all_queries() per round, so which
queries get hard driver signal is decided by registry._WINDOW_PRIORITY
(+ _MODULE_ORDER for the tail). These tests fail loudly if a refactor
reshuffles the window (VERDICT r2: 18 queries went a full round with no
driver signal because of exactly such a reorder)."""

from __future__ import annotations

import json
from pathlib import Path

from gresearch_parquet_benchmarking_spark.operators.registry import (
    _WINDOW_PRIORITY,
    all_oracle_sql,
    all_queries,
)

WINDOW = 50

# Round-7 window (VERDICT r6 "Next round" #1, judge directive): ALL 50
# slots drawn from the 71 queries with ZERO lifetime driver signal
# (every r6 addition), algorithmically riskiest first. The canonical
# list lives in registry._WINDOW_PRIORITY; this test pins that the
# listing actually honors it AND that every windowed query really had
# no prior driver signal (checked against the committed CORRECTNESS
# artifacts, r1–r6).
MUST_BE_IN_WINDOW = list(_WINDOW_PRIORITY)


def test_round7_window_composition():
    names = list(all_queries())
    window = names[:WINDOW]
    assert window == MUST_BE_IN_WINDOW, (
        "driver first-50 window diverged from _WINDOW_PRIORITY:\n"
        f"got:      {window}\nexpected: {MUST_BE_IN_WINDOW}"
    )


def test_round7_window_is_never_driver_checked():
    """Every r7 window slot must be spent on a query with no lifetime
    driver CORRECTNESS signal (r6 VERDICT: the backlog of 71 such
    queries outgrew the window; r7 must retire 50 of them)."""
    repo = Path(__file__).resolve().parents[1]
    seen: set[str] = set()
    for art in sorted(repo.glob("CORRECTNESS_r0[1-6].json")):
        seen |= set(json.loads(art.read_text()))
    if not seen:  # artifacts absent in a bare checkout — nothing to pin
        return
    already = [n for n in MUST_BE_IN_WINDOW if n in seen]
    assert already == [], f"window slots wasted on driver-green queries: {already}"


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
