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
# completion so the driver can hash a batch result) — auditing them
# here would re-run ~20 s of streaming per entry; their plans are
# pinned by the streaming test files instead.
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
