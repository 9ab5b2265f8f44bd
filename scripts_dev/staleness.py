"""Print the driver-signal staleness ledger: for every registered
query, the latest round whose committed CORRECTNESS_r*.json contains
it (the canonical computation — tests/test_registry_window.py pins the
window against the same ledger). Use when rotating _WINDOW_PRIORITY:
schedule never-checked first, then oldest-signal first.

Usage: python scripts_dev/staleness.py
"""

from __future__ import annotations

import collections
import glob
import json
import re
import sys

sys.path.insert(0, ".")

from gresearch_parquet_benchmarking_spark.operators.registry import all_queries


def main() -> None:
    last: dict[str, int] = {}
    # Regex round parse so r10+ artifacts are counted (ADVICE r8: the
    # old "r0*" glob + split("r0") silently ignored CORRECTNESS_r10+).
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for q in json.load(open(path)):
            last[q] = max(last.get(q, 0), rnd)
    by_round: dict[int | None, list[str]] = collections.defaultdict(list)
    for name, fn in all_queries().items():
        by_round[last.get(name)].append(f"{name} ({fn.__module__.split('.')[-1]})")
    for rnd in sorted(by_round, key=lambda r: (r is not None, r)):
        tag = "NEVER" if rnd is None else f"r{rnd}"
        print(f"== last driver signal: {tag} ({len(by_round[rnd])}) ==")
        for q in by_round[rnd]:
            print("  ", q)

    # Next-window proposal: never-checked first, then oldest-signal
    # first (ledger order within a cohort) — the exact rule every
    # rotation since r9 followed. Risk-reordering within the window is
    # the planner's call; the SET should match this list. The standing
    # bound (test_registry_window.test_standing_staleness_bound) fails
    # if any query lags the newest artifact by >5 rounds.
    latest = max(last.values(), default=0)
    ranked = [n for n in all_queries() if n not in last] + sorted(
        (n for n in all_queries() if n in last), key=lambda n: last[n]
    )
    proposal = ranked[:50]
    print(f"\n== proposed next window (50 of {len(ranked)}; newest artifact r{latest}) ==")
    for n in proposal:
        tag = "NEVER" if n not in last else f"r{last[n]}"
        print(f"   {tag:5s} {n}")


if __name__ == "__main__":
    main()
