"""Focused pins for the r13 optimization-round changes — properties
the oracle gate can't see.

* stateful_funnel._advance (tinyint/numpy kernel): must reproduce the
  legacy pandas-Series mask semantics exactly, including the
  state-carried partial-stage cases and non-funnel event codes.
* The r13 eager defaults (decided by alternating A/Bs, BENCH.md r13)
  must stay ON — a silent default flip would undo the measured wins.
"""

from __future__ import annotations

import inspect

import numpy as np
import pandas as pd


def _legacy_advance(v, c, p, pdf: pd.DataFrame):
    """The pre-r13 kernel, verbatim (string event types)."""
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


_NAMES = ["view", "click", "purchase", "error", "signup"]
_CODE = {"view": 0, "click": 1, "purchase": 2, "error": 3, "signup": 3}


def test_numpy_advance_matches_legacy_pandas_kernel():
    from gresearch_parquet_benchmarking_spark.streaming.stateful_funnel import (
        _advance,
    )

    rng = np.random.default_rng(13)
    for case in range(300):
        n = int(rng.integers(0, 12))
        ets = [(_NAMES[i]) for i in rng.integers(0, len(_NAMES), n)]
        tss = rng.integers(0, 50, n).astype("int64")
        # carried state: every combination of already-reached stages,
        # including the monotone v <= c <= p constraint real state has
        v0 = c0 = p0 = None
        stage = int(rng.integers(0, 4))
        if stage >= 1:
            v0 = int(rng.integers(0, 20))
        if stage >= 2:
            c0 = v0 + int(rng.integers(0, 20))
        if stage >= 3:
            p0 = c0 + int(rng.integers(0, 20))
        pdf = pd.DataFrame({"event_type": ets, "ts_us": tss})
        want = _legacy_advance(v0, c0, p0, pdf)
        got = _advance(
            v0,
            c0,
            p0,
            np.array([_CODE[e] for e in ets], dtype="int8"),
            tss,
        )
        assert got == want, f"case {case}: {got} != {want} on {list(zip(ets, tss))}"


def test_r13_eager_defaults_stay_on():
    """The A/B-decided defaults (BENCH.md r13): ivf eager_cents,
    pq eager_sub, kmeans eager_centroids all True."""
    from gresearch_parquet_benchmarking_spark.operators import similarity as sim

    assert inspect.signature(sim._ivf_topk).parameters["eager_cents"].default is True
    assert (
        inspect.signature(sim.ann_ivf_pq_topk).parameters["eager_sub"].default is True
    )
    assert (
        inspect.signature(sim.kmeans_train).parameters["eager_centroids"].default
        is True
    )


def test_pagerank_keeps_superseded_iteration_caches():
    """Regression pin for the reverted ADVICE r12 #2: unpersisting the
    superseded iteration's ranks inside the loop makes the CacheManager
    rebuild the DEPENDENT new cache (non-cascading uncache re-compiles
    and clears dependents), discarding the barrier's materialized data
    — measured 2.9 s → 28 s (BENCH.md r13). The loop body must not call
    unpersist."""
    from gresearch_parquet_benchmarking_spark.operators import graph

    src = inspect.getsource(graph.graph_pagerank_bipartite)
    assert "unpersist" not in src.replace(
        "Do NOT unpersist", ""
    ), "mid-loop unpersist reintroduced — see BENCH.md r13 cache-rebuild lesson"


def test_trending_trio_state_partitions_default():
    """The trending-module stateful aggregates (topk/psi/checksum)
    default to TREND_STATE_PARTITIONS=8 state-store partitions (r13
    A/B: psi 5.17->2.79 s, trend 2.75->1.68, chk 1.87->0.99 median —
    their state is aggregate-cardinality-bounded, so the fixed
    per-partition store cost dominated at 32). The parameter stays
    exposed so a cluster caller can size to state volume."""
    from gresearch_parquet_benchmarking_spark.streaming import trending

    assert trending.TREND_STATE_PARTITIONS == 8
    for fn in (
        trending.stream_topk_trending,
        trending.stream_psi_value_drift,
        trending.stream_integrity_checksum,
    ):
        default = inspect.signature(fn).parameters["state_partitions"].default
        assert default == trending.TREND_STATE_PARTITIONS, fn.__name__
