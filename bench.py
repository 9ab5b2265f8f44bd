"""Per-round benchmark entry (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once as warm-up (JIT + parquet footer cache)
and then timed over the median of TRIALS runs — mirroring the
reference's repeated-trial protocol (BASELINE.md §Engine comparison).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gresearch_parquet_benchmarking_spark.operators.registry import all_queries  # noqa: E402
from gresearch_parquet_benchmarking_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "window_running_total",
    "topk_per_group",
    "agg_rollup",
    "text_term_frequency",
    "text_quality_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    "sessionization",
    "asof_join_purchase_click",
]

TRIALS = 3
WARMUPS = 1


def _run_once(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # force full materialization
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="engine-bench")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    queries = all_queries()
    per_query: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        for _ in range(WARMUPS):
            _run_once(fn, spark, sf_dir)
        times = [_run_once(fn, spark, sf_dir) for _ in range(TRIALS)]
        per_query[name] = round(statistics.median(times), 4)

    total = round(sum(per_query.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_query_median_total",
                "value": total,
                "unit": "sec",
                "queries": per_query,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
