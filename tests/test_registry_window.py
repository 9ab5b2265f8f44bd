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

# Round-9 window (VERDICT r8 "Next round" #1, rotation planned in
# CLAUDE.md during r8): all r3-stale (12) + all r4-stale (27, with the
# r8-reimplemented window_range_frame promoted to slot 0) + the 11
# riskiest r5-stale rows. The canonical list lives in
# registry._WINDOW_PRIORITY; these tests pin that the listing honors it
# AND that the composition matches the staleness ledger in the
# committed CORRECTNESS artifacts.
MUST_BE_IN_WINDOW = list(_WINDOW_PRIORITY)


def test_round9_window_composition():
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


def test_round9_window_head_is_reimplemented_row():
    """window_range_frame was reimplemented in r8 (value-binned RANGE
    frame) with only local-gate cover — it must head the window."""
    assert MUST_BE_IN_WINDOW[0] == "window_range_frame"


def test_round9_window_is_the_stalest_cohort():
    """Every window slot must go to a query whose last driver signal
    (as of the committed r1–r8 artifacts) is r3, r4, or r5 — the three
    stalest cohorts. No slot may be wasted on a fresher query."""
    last = _last_driver_signal(through_round=8)
    if not last:  # artifacts absent in a bare checkout — nothing to pin
        return
    fresh = [n for n in MUST_BE_IN_WINDOW if last.get(n, 0) not in (3, 4, 5)]
    assert fresh == [], f"window slots wasted on non-r3/r4/r5-stale queries: {fresh}"


def test_round9_window_covers_all_r3_and_r4_stale():
    """The r3-stale and r4-stale cohorts must be retired COMPLETELY this
    round — after r9 no registered query's last signal predates r5."""
    last = _last_driver_signal(through_round=8)
    if not last:
        return
    registered = set(all_queries())
    oldest = sorted(
        n for n, r in last.items() if r in (3, 4) and n in registered
    )
    missing = [n for n in oldest if n not in set(MUST_BE_IN_WINDOW)]
    assert missing == [], f"r3/r4-stale queries left out of the window: {missing}"


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
