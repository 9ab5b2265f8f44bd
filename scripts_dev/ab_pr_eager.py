"""A/B: eager (persist+count per iteration) vs lazy nested-lineage
ranks in graph_pagerank_bipartite.

Alternating windows (lazy, eager, lazy, eager) in ONE session so JIT/
host drift cancels; each window is bench-shaped: 1 untimed warm pass +
3 timed trials with persists kept, release_persists() between windows
(the ab_sem_eager protocol).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gresearch_parquet_benchmarking_spark.operators import graph  # noqa: E402
from gresearch_parquet_benchmarking_spark.operators.registry import (  # noqa: E402
    release_persists,
)
from gresearch_parquet_benchmarking_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run_window(spark, eager: bool) -> list[float]:
    # explicit keyword, not __defaults__ mutation (ADVICE r12): this
    # stays correct even if @query ever wraps the builder
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        graph.graph_pagerank_bipartite(spark, SF, eager_ranks=eager).write.format(
            "noop"
        ).mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    release_persists()
    return times


def main() -> None:
    spark = get_spark(app_name="ab-pr-eager")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    res = {False: [], True: []}
    for window in (False, True, False, True):
        res[window] += run_window(spark, window)
    for eager in (False, True):
        v = res[eager]
        print(
            f"graph_pagerank_bipartite eager={eager}: "
            f"median={statistics.median(v):.3f}s min={min(v):.3f}s "
            f"trials={[round(t, 3) for t in v]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
