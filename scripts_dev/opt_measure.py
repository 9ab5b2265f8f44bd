"""Optimization-round per-query measurement harness (guide §1).

Times individual registered queries in isolation with the noop sink
(median + min of N trials after W warm passes, same execution shape as
bench.py's query section) and captures `.explain("formatted")` to
plans/<round>/<name>_<tag>.txt for the before/after evidence the
optimization deliverable requires.

Usage:
  python scripts_dev/opt_measure.py [--sf DIR] [--trials N] [--warmups N]
      [--tag before|after] [--plans-dir plans/r12] [--no-plan] name...

Timing note: single-process runs carry the in-session JVM-warmth
envelope (BENCH.md r6/r10) — compare medians from like-shaped runs
(same query list, same trial counts), never a lone number against the
bench floors.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gresearch_parquet_benchmarking_spark.operators.registry import (  # noqa: E402
    all_queries,
    release_persists,
)
from gresearch_parquet_benchmarking_spark.session import get_spark  # noqa: E402


def capture_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument("--tag", default=None, help="suffix for plan files (e.g. before/after)")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    spark = get_spark(app_name="opt-measure")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    queries = all_queries()
    unknown = [n for n in args.names if n not in queries]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")

    for name in args.names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"opt_measure: {name}")
        try:
            if not args.no_plan and args.plans_dir and args.tag:
                os.makedirs(args.plans_dir, exist_ok=True)
                df = fn(spark, args.sf)
                plan = capture_plan(df)
                with open(os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                    f.write(plan)
                release_persists()
            # Bench trial semantics (bench.py bench_queries): persists
            # tracked by track_persist are released once per KEY, after
            # the whole trial window — so trials after the first reuse
            # the caches trial 1 built, exactly like the driver's
            # median-of-3. The first (warmup) time is reported as the
            # cold-cache cost.
            times = []
            cold = None
            for i in range(args.warmups + args.trials):
                t0 = time.perf_counter()
                fn(spark, args.sf).write.format("noop").mode("overwrite").save()
                dt = time.perf_counter() - t0
                if i == 0:
                    cold = dt
                if i >= args.warmups:
                    times.append(dt)
            print(
                f"{name}: median={statistics.median(times):.3f}s "
                f"min={min(times):.3f}s cold={cold:.3f}s "
                f"trials={[round(t, 3) for t in times]}",
                flush=True,
            )
        finally:
            release_persists()
            spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
