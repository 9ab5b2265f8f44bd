"""Round-13 alternating same-session A/Bs (the ab_sem_eager protocol:
windows of 1 untimed warm pass + 3 timed noop-sink trials, alternated
A,B,A,B so JIT/host drift cancels; release_persists() between windows).

Targets (VERDICT r12 #4-#6):
  funnel  — stream_funnel_stateful: legacy string/pandas kernel vs the
            r13 tinyint/numpy kernel (legacy pipeline reconstructed
            here verbatim so production code carries no dead toggle)
  ivf     — _ivf_topk eager_cents=False vs True (nprobe=1)
  ivf2    — same at nprobe=2
  pq      — ann_ivf_pq_topk eager_sub=False vs True
  kmeans  — kmeans_train eager_centroids=False vs True

Usage: python scripts_dev/ab_r13.py [target ...]   (default: all)
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from collections.abc import Iterator

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from gresearch_parquet_benchmarking_spark.operators import similarity as sim  # noqa: E402
from gresearch_parquet_benchmarking_spark.operators.registry import (  # noqa: E402
    release_persists,
)
from gresearch_parquet_benchmarking_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# --- legacy funnel kernel (pre-r13), verbatim, for the A side ---------

LEGACY_OUTPUT_SCHEMA = "user_id long, v long, c long, p long"
LEGACY_STATE_SCHEMA = "v long, c long, p long"


def _legacy_advance(v, c, p, pdf: pd.DataFrame):
    et, ts = pdf["event_type"], pdf["ts_us"]
    if v is None:
        views = ts[et == "view"]
        if len(views):
            v = int(views.min())
    if v is not None and c is None:
        clicks = ts[(et == "click") & (ts >= v)]
        if len(clicks):
            c = int(clicks.min())
    if c is not None and p is None:
        purchases = ts[(et == "purchase") & (ts >= c)]
        if len(purchases):
            p = int(purchases.min())
    return v, c, p


def _legacy_funnel_group(key, batches: Iterator[pd.DataFrame], state):
    v = c = p = None
    if state.exists:
        sv, sc, sp = state.get
        v = None if sv is None else int(sv)
        c = None if sc is None else int(sc)
        p = None if sp is None else int(sp)
    chunks = [pdf for pdf in batches if len(pdf)]
    if chunks:
        v, c, p = _legacy_advance(v, c, p, pd.concat(chunks))
    state.update((v, c, p))
    yield pd.DataFrame({"user_id": [key[0]], "v": [v], "c": [c], "p": [p]})


def _legacy_streaming_funnel(stream):
    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = stream.select("user_id", "event_type", "ts_us")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _legacy_funnel_group,
        outputStructType=LEGACY_OUTPUT_SCHEMA,
        stateStructType=LEGACY_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _funnel_run(spark, legacy: bool):
    from gresearch_parquet_benchmarking_spark.streaming.events_stream import (
        _funnel_rollup,
        _read_event_stream,
        _run_to_table,
    )
    from gresearch_parquet_benchmarking_spark.streaming.stateful_funnel import (
        streaming_funnel,
    )

    ev = _read_event_stream(spark, SF)
    kern = _legacy_streaming_funnel if legacy else streaming_funnel
    out = _run_to_table(kern(ev), "update", state_partitions=8)
    return _funnel_rollup(out)


# --- generic alternating window driver --------------------------------


def run_window(spark, build, trials: int = 3) -> list[float]:
    times = []
    for i in range(trials + 1):
        t0 = time.perf_counter()
        build(spark).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        if i > 0:
            times.append(dt)
    release_persists()
    return times


TARGETS = {
    "funnel": (
        "stream_funnel_stateful kernel",
        lambda s: _funnel_run(s, legacy=True),
        lambda s: _funnel_run(s, legacy=False),
        ("legacy-pandas", "tinyint-numpy"),
    ),
    "ivf": (
        "ann_ivf_topk eager_cents",
        lambda s: sim._ivf_topk(s, SF, nprobe=1, eager_cents=False),
        lambda s: sim._ivf_topk(s, SF, nprobe=1, eager_cents=True),
        ("lazy", "eager"),
    ),
    "ivf2": (
        "ann_ivf_topk_nprobe2 eager_cents",
        lambda s: sim._ivf_topk(s, SF, nprobe=2, eager_cents=False),
        lambda s: sim._ivf_topk(s, SF, nprobe=2, eager_cents=True),
        ("lazy", "eager"),
    ),
    "pq": (
        "ann_ivf_pq_topk eager_sub",
        lambda s: sim.ann_ivf_pq_topk(s, SF, eager_sub=False),
        lambda s: sim.ann_ivf_pq_topk(s, SF, eager_sub=True),
        ("lazy", "eager"),
    ),
    "kmeans": (
        "kmeans_train eager_centroids",
        lambda s: sim.kmeans_train(s, SF, eager_centroids=False),
        lambda s: sim.kmeans_train(s, SF, eager_centroids=True),
        ("lazy", "eager"),
    ),
    "psi": (
        "stream_psi_value_drift state_partitions",
        lambda s: _trending().stream_psi_value_drift(s, SF, state_partitions=None),
        lambda s: _trending().stream_psi_value_drift(s, SF, state_partitions=8),
        ("default-32", "parts-8"),
    ),
    "trend": (
        "stream_topk_trending state_partitions",
        lambda s: _trending().stream_topk_trending(s, SF, state_partitions=None),
        lambda s: _trending().stream_topk_trending(s, SF, state_partitions=8),
        ("default-32", "parts-8"),
    ),
    "chk": (
        "stream_integrity_checksum state_partitions",
        lambda s: _trending().stream_integrity_checksum(s, SF, state_partitions=None),
        lambda s: _trending().stream_integrity_checksum(s, SF, state_partitions=8),
        ("default-32", "parts-8"),
    ),
    "tri": (
        "graph_triangle_count eager_base",
        lambda s: _graph().graph_triangle_count(s, SF, eager_base=False),
        lambda s: _graph().graph_triangle_count(s, SF, eager_base=True),
        ("lazy", "eager"),
    ),
}


def _graph():
    from gresearch_parquet_benchmarking_spark.operators import graph

    return graph


def _trending():
    from gresearch_parquet_benchmarking_spark.streaming import trending

    return trending


def main() -> None:
    names = sys.argv[1:] or list(TARGETS)
    spark = get_spark(app_name="ab-r13")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for name in names:
        title, build_a, build_b, (la, lb) = TARGETS[name]
        res = {la: [], lb: []}
        for label, build in ((la, build_a), (lb, build_b)) * 2:
            res[label] += run_window(spark, build)
        for label in (la, lb):
            v = res[label]
            print(
                f"{title} [{label}]: median={statistics.median(v):.3f}s "
                f"min={min(v):.3f}s trials={[round(t, 3) for t in v]}",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
