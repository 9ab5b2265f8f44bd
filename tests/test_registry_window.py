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

# Round-13 window (VERDICT r12 "Next round" #3, rotation planned in
# CLAUDE.md during r12): the 38 remaining r8-stale rows + the 5
# multimodal_* rows (r11 signal but the audio container went WAVT→
# RIFF/WAVE in r12, so no driver hash covers the current payload
# semantics) + the 7 oldest r9-stale, all in staleness-ledger order.
# The canonical list lives in registry._WINDOW_PRIORITY; these tests
# pin that the listing honors it AND that the composition matches the
# staleness ledger in the committed CORRECTNESS artifacts.
MUST_BE_IN_WINDOW = list(_WINDOW_PRIORITY)

# The 5 rows with r11 signal granted slots because their payload
# semantics changed AFTER that signal (r12 RIFF/WAVE upgrade).
MULTIMODAL_RESEED = {
    "multimodal_binary_meta",
    "multimodal_decode_features",
    "multimodal_size_by_kind",
    "multimodal_resize",
    "multimodal_frame_sample",
}

# The 7 r9-stale rows granted slots after the r8 cohort (oldest in the
# ledger, per the written plan).
R9_OLDEST = {
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_type_profit",
    "q11_important_stock",
    "q12_late_shipments",
    "q15_top_supplier",
    "q16_supplier_part_count",
}

# Rotation discipline bound (VERDICT r10 "Next round" #2): once the
# window rotates every round, no registered query's last driver signal
# may lag the newest committed CORRECTNESS artifact by more than
# MAX_STALENESS rounds. After r12 the oldest signal is r8 (lag 4);
# each planned rotation keeps the lag at 4 — 5 is the tripwire.
MAX_STALENESS = 5


def test_round13_window_composition():
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


def _latest_committed_round() -> int:
    repo = Path(__file__).resolve().parents[1]
    rounds = [
        int(m.group(1))
        for art in repo.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"_r(\d+)\.json$", art.name))
    ]
    return max(rounds, default=0)


def test_round13_window_slots_justified():
    """Every window slot must go to (a) a never-driver-checked query,
    (b) an r8-stale query (the stalest cohort after r12), (c) one of
    the 5 multimodal rows whose payload semantics changed after their
    r11 signal, or (d) one of the 7 named oldest r9-stale rows. No slot
    may be wasted on a fresher query."""
    last = _last_driver_signal(through_round=12)
    if not last:  # artifacts absent in a bare checkout — nothing to pin
        return
    wasted = [
        n
        for n in MUST_BE_IN_WINDOW
        if n in last
        and last[n] != 8
        and n not in R9_OLDEST
        and n not in MULTIMODAL_RESEED
    ]
    assert wasted == [], f"window slots wasted on fresh queries: {wasted}"
    r9 = [
        n
        for n in MUST_BE_IN_WINDOW
        if last.get(n) == 9 and n not in MULTIMODAL_RESEED
    ]
    assert set(r9) == R9_OLDEST, (
        f"r9 slots must be exactly the named oldest seven, got: {sorted(r9)}"
    )


def test_round13_window_covers_all_r8_stale():
    """The r8-stale cohort must be retired COMPLETELY this round —
    after r13 no registered query's last signal predates r9."""
    last = _last_driver_signal(through_round=12)
    if not last:
        return
    registered = set(all_queries())
    oldest = sorted(n for n, r in last.items() if r == 8 and n in registered)
    missing = [n for n in oldest if n not in set(MUST_BE_IN_WINDOW)]
    assert missing == [], f"r8-stale queries left out of the window: {missing}"


def test_standing_staleness_bound():
    """Rotation-discipline tripwire (VERDICT r10 #2): against the newest
    committed CORRECTNESS artifact, (a) every registered query that has
    EVER been driver-checked must have signal within MAX_STALENESS
    rounds, and (b) any registered query with NO lifetime signal must
    hold a window slot (it cannot wait a round). This must keep passing
    under every future rotation — if a planned window would violate it,
    fix the window, not this test."""
    latest = _latest_committed_round()
    if latest == 0:
        return
    last = _last_driver_signal(through_round=latest)
    registered = set(all_queries())
    window = set(MUST_BE_IN_WINDOW)
    too_stale = sorted(
        n for n in registered if n in last and latest - last[n] > MAX_STALENESS
    )
    assert too_stale == [], (
        f"queries staler than {MAX_STALENESS} rounds (vs r{latest}): "
        f"{too_stale} — rotate them into _WINDOW_PRIORITY"
    )
    never = sorted(n for n in registered if n not in last and n not in window)
    assert never == [], (
        f"never-driver-checked queries without a window slot: {never}"
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
