"""Capture batch + per-micro-batch plans for streaming queries into
plans/<dir>/<name>_<tag>.txt (the optimization-round evidence format,
extended with the streaming executed plans where the state-store
Exchange partition count actually appears).

Usage: python scripts_dev/capture_stream_plans.py --tag before \
           --plans-dir plans/r13 name...
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gresearch_parquet_benchmarking_spark.operators.registry import (  # noqa: E402
    all_queries,
    release_persists,
)
from gresearch_parquet_benchmarking_spark.session import get_spark  # noqa: E402
from gresearch_parquet_benchmarking_spark.streaming.events_stream import (  # noqa: E402
    drain_captured_plans,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", required=True)
    ap.add_argument("--plans-dir", default="plans/r13")
    args = ap.parse_args()

    spark = get_spark(app_name="capture-stream-plans")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    queries = all_queries()
    os.makedirs(args.plans_dir, exist_ok=True)
    for name in args.names:
        drain_captured_plans()
        df = queries[name](spark, args.sf)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        micro = drain_captured_plans()
        path = os.path.join(args.plans_dir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write("== Batch (post-stream) plan ==\n")
            fh.write(buf.getvalue())
            for i, p in enumerate(micro):
                fh.write(f"\n== Streaming micro-batch plan {i} ==\n")
                fh.write(p)
        release_persists()
        print(f"wrote {path} ({len(micro)} micro-batch plans)")
    spark.stop()


if __name__ == "__main__":
    main()
