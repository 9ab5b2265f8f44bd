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


if __name__ == "__main__":
    main()
