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

# Round-8 window (VERDICT r7 "Next round" #2, rotation planned in
# CLAUDE.md during r7): the final 21 queries with zero lifetime driver
# signal (analytics 12 + analytics2 9) followed by relational's 29
# r1-stale rows. The canonical list lives in registry._WINDOW_PRIORITY;
# these tests pin that the listing honors it AND that the composition
# matches the staleness ledger in the committed CORRECTNESS artifacts.
MUST_BE_IN_WINDOW = list(_WINDOW_PRIORITY)
N_NEVER_CHECKED = 21  # window[:21] must have zero r1–r7 driver signal
# window[21:] must be exactly the r1-stale set (green in r1, unseen
# since)


def test_round8_window_composition():
    names = list(all_queries())
    window = names[:WINDOW]
    assert window == MUST_BE_IN_WINDOW, (
        "driver first-50 window diverged from _WINDOW_PRIORITY:\n"
        f"got:      {window}\nexpected: {MUST_BE_IN_WINDOW}"
    )


def _last_driver_signal() -> dict[str, int]:
    """query -> latest round (1–7) whose committed CORRECTNESS artifact
    contains it; absent = never driver-checked."""
    repo = Path(__file__).resolve().parents[1]
    last: dict[str, int] = {}
    for art in sorted(repo.glob("CORRECTNESS_r0[1-7].json")):
        rnd = int(art.stem.split("r0")[1])
        for q in json.loads(art.read_text()):
            last[q] = max(last.get(q, 0), rnd)
    return last


def test_round8_window_head_is_never_driver_checked():
    """The first 21 slots must be spent on the queries with NO lifetime
    driver CORRECTNESS signal — after this round that backlog is zero
    and lifetime coverage reaches 237/237."""
    last = _last_driver_signal()
    if not last:  # artifacts absent in a bare checkout — nothing to pin
        return
    wasted = [n for n in MUST_BE_IN_WINDOW[:N_NEVER_CHECKED] if n in last]
    assert wasted == [], f"head slots wasted on driver-green queries: {wasted}"


def test_round8_window_tail_is_r1_stale():
    """The remaining 29 slots must be spent on queries whose ONLY driver
    signal is CORRECTNESS_r01 (the stalest cohort in the registry)."""
    last = _last_driver_signal()
    if not last:
        return
    not_stale = [
        n for n in MUST_BE_IN_WINDOW[N_NEVER_CHECKED:] if last.get(n) != 1
    ]
    assert not_stale == [], (
        f"tail slots not drawn from the r1-stale cohort: {not_stale}"
    )


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
