"""Measure the flagship ops' scale shapes at two SFs and print the
BENCH.md table: candidate-work cardinality and real shuffle bytes must
grow near-linearly with the corpus (the banded/bucketed claim).

Usage: python scripts_dev/scale_shapes.py [sf_small sf_big]
       python scripts_dev/scale_shapes.py --axis   # production-axis
       table (BENCH.md r8): 10x timespan / 10 disjoint-vocab domains
       at constant density — candidate work must grow ~linearly
       python scripts_dev/scale_shapes.py --state  # streaming
       state-store growth table (BENCH.md r12): peak numRowsTotal
       must track input near-linearly (watermark eviction bound)
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from gresearch_parquet_benchmarking_spark.plans.scale_probes import PROBES, measure
from gresearch_parquet_benchmarking_spark.session import get_spark


def main_axis() -> None:
    """The production growth axis (VERDICT r7 #5): candidate probes on
    the axis-separation fixtures vs sf0.01 — linear expected."""
    from gresearch_parquet_benchmarking_spark.sources.datagen import (
        timespan_extended_events,
        vocab_sharded_documents,
        vocab_sharded_parts,
    )

    sf_small = "/root/testdata/sf0.01"
    spark = get_spark()
    fixtures = {
        "interval_overlap_users": (
            "timespan ×10, density const",
            timespan_extended_events(sf_small, copies=10),
        ),
        "dedup_containment_bottomk": (
            "+10 disjoint domains, density const",
            vocab_sharded_documents(sf_small, shards=10),
        ),
        "fuzzy_join_part_names": (
            "+10 part families, density const",
            vocab_sharded_parts(sf_small, shards=10),
        ),
    }
    print("| op | axis | rows | candidate work | cand/rows |")
    print("|---|---|---|---|---|")
    for name, (axis, synth) in fixtures.items():
        small = PROBES[name](spark, sf_small)
        big = PROBES[name](spark, synth)
        rg = big["rows"] / max(small["rows"], 1)
        cg = big["candidates"] / max(small["candidates"], 1)
        print(f"| {name} | {axis} | {rg:.1f}× | {cg:.1f}× | {cg / rg:.2f} |")


def main_state() -> None:
    """Streaming state-store growth (VERDICT r11 #5): peak
    Σ numRowsTotal across the replay's batches vs input rows."""
    from gresearch_parquet_benchmarking_spark.plans.scale_probes import (
        STATE_PROBES,
    )

    sf_small = "/root/testdata/sf0.01"
    sf_big = "/root/testdata/sf0.1"
    spark = get_spark()
    print("| op | input rows | peak state rows | growth | batches |")
    print("|---|---|---|---|---|")
    for name, probe in STATE_PROBES.items():
        s, b = probe(spark, sf_small), probe(spark, sf_big)
        rg = b["rows"] / max(s["rows"], 1)
        sg = b["candidates"] / max(s["candidates"], 1)
        print(
            f"| {name} | {s['rows']:,}→{b['rows']:,} ({rg:.1f}×) "
            f"| {s['candidates']:,}→{b['candidates']:,} | {sg:.2f}× "
            f"| {s['n_batches']}→{b['n_batches']} |"
        )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--axis":
        main_axis()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--state":
        main_state()
        return
    sf_small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sf_big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark()
    results: dict[str, dict] = {}
    for name in PROBES:
        t0 = time.monotonic()
        small = measure(spark, sf_small, name)
        big = measure(spark, sf_big, name)
        results[name] = {"small": small, "big": big, "sec": round(time.monotonic() - t0, 1)}
        print(f"## {name} ({results[name]['sec']}s)", file=sys.stderr)

    rows_hdr = (
        "| op | rows sf0.01→sf0.1 | growth | candidates sf0.01→sf0.1 | growth |"
        " shuffle MiB sf0.01→sf0.1 | growth | cand growth / rows growth |"
    )
    print(rows_hdr)
    print("|---|---|---|---|---|---|---|---|")
    for name, r in results.items():
        s, b = r["small"], r["big"]
        rg = b["rows"] / max(s["rows"], 1)
        cg = b["candidates"] / max(s["candidates"], 1)
        sg = b["shuffle_bytes"] / max(s["shuffle_bytes"], 1)
        mib = lambda x: f"{x / 1048576:.2f}"  # noqa: E731
        print(
            f"| {name} | {s['rows']:,}→{b['rows']:,} | {rg:.1f}× "
            f"| {s['candidates']:,}→{b['candidates']:,} | {cg:.1f}× "
            f"| {mib(s['shuffle_bytes'])}→{mib(b['shuffle_bytes'])} | {sg:.1f}× "
            f"| {cg / rg:.2f} |"
        )
    print(json.dumps(results), file=sys.stderr)


if __name__ == "__main__":
    main()
