"""A/B: eager vs lazy final-centroid materialization in _sem_clustering.

Alternating windows (lazy, eager, lazy, eager) in ONE session so JIT/
host drift cancels; each window is bench-shaped: 1 untimed warm pass +
3 timed trials with persists kept, release_persists() between windows.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gresearch_parquet_benchmarking_spark.operators import similarity as sim  # noqa: E402
from gresearch_parquet_benchmarking_spark.operators.registry import (  # noqa: E402
    release_persists,
)
from gresearch_parquet_benchmarking_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = sys.argv[1:] or ["dedup_semantic_agreement", "dedup_semantic"]


def run_window(spark, fn, eager: bool) -> list[float]:
    sim._sem_clustering.__defaults__ = (eager,)
    times = []
    for i in range(4):
        t0 = time.perf_counter()
        fn(spark, SF).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    release_persists()
    return times


def main() -> None:
    from gresearch_parquet_benchmarking_spark.operators.registry import all_queries

    spark = get_spark(app_name="ab-sem-eager")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    q = all_queries()
    for name in QUERIES:
        fn = q[name]
        res = {False: [], True: []}
        for window in (False, True, False, True):
            res[window] += run_window(spark, fn, window)
        for eager in (False, True):
            v = res[eager]
            print(
                f"{name} eager={eager}: median={statistics.median(v):.3f}s "
                f"min={min(v):.3f}s trials={[round(t, 3) for t in v]}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
