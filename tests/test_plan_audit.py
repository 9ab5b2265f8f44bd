"""Repo-wide physical-plan audit: every registered query's plan is
checked for the scale anti-patterns the per-operator pins can miss —
an unconstrained CartesianProduct anywhere, or a Python evaluator
outside the one documented Python surface (the Arrow-batched
multimodal decode). New queries get this gate automatically just by
registering."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators.registry import (
    all_queries,
    release_persists,
)

# Streaming operators EXECUTE on call (the builder drives the query to
# completion so the driver can hash a batch result). They get their own
# audit below: ONE run per query at smoke scale, with the FINAL
# micro-batch executed plan of each _run_to_table call captured
# (events_stream.drain_captured_plans; explainInternal reports the
# last batch, so the steady-state shape is what's audited) — the same
# invariants, no per-invariant re-runs.
AUDIT_SKIP_PREFIX = "stream_"

# The documented Python surface: multimodal decode/feature/resize/
# frame-sample run vectorized pandas kernels over mapInPandas by
# design (SURVEY §2.8; the codec is a swappable deterministic stub).
PYTHON_ALLOWED = {
    "multimodal_decode_features",
    "multimodal_resize",
    "multimodal_frame_sample",
    "dedup_multimodal_phash",
}

_PY_MARKERS = ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "PythonMapInArrow")


@pytest.mark.parametrize(
    "name", [n for n in all_queries() if not n.startswith(AUDIT_SKIP_PREFIX)]
)
def test_no_cartesian_no_stray_python(spark, name):
    fn = all_queries()[name]
    df = fn(spark, SF_SMOKE)
    try:
        # planning only — queryExecution() does not run jobs for batch plans
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        release_persists()
    assert "CartesianProduct" not in plan, f"{name}: unconstrained cartesian\n{plan}"
    if any(m in plan for m in _PY_MARKERS):
        assert name in PYTHON_ALLOWED, f"{name}: Python evaluator in plan\n{plan}"


# The sanctioned streaming Python surface: the three custom stateful
# operators run applyInPandasWithState by design (SURVEY §2.9 —
# arbitrary stateful processing has no JVM-declarative equivalent).
STREAM_PYTHON_ALLOWED = {
    "stream_dedup_incremental",
    "stream_funnel_stateful",
    "stream_funnel_buffered_ooo",
}

_STREAM_PY_MARKERS = _PY_MARKERS + (
    "FlatMapGroupsInPandasWithState",
    "ApplyInPandasWithState",
)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", [n for n in all_queries() if n.startswith(AUDIT_SKIP_PREFIX)]
)
def test_streaming_no_cartesian_no_stray_python(spark, name):
    """One real run per streaming query at smoke scale; the final
    micro-batch plan of every _run_to_table call (the steady-state
    shape — see the capture note in events_stream.py) passes the same
    audit as batch plans. Closes the r6 VERDICT blind spot: a new
    streaming query now gets the cartesian/Python audit
    automatically."""
    from gresearch_parquet_benchmarking_spark.streaming.events_stream import (
        drain_captured_plans,
    )

    drain_captured_plans()
    fn = all_queries()[name]
    try:
        fn(spark, SF_SMOKE)  # driving the stream happens inside the builder
        plans = drain_captured_plans()
    finally:
        release_persists()
    assert plans, f"{name}: no micro-batch plan captured — audit has no evidence"
    for plan in plans:
        assert "CartesianProduct" not in plan, f"{name}: unconstrained cartesian\n{plan}"
        if any(m in plan for m in _STREAM_PY_MARKERS):
            assert name in STREAM_PYTHON_ALLOWED, (
                f"{name}: Python evaluator in streaming plan\n{plan}"
            )
