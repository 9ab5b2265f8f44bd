"""IVF nprobe knob: recall@k must be monotonically non-decreasing in
nprobe (the nprobe=1 candidate set is a strict subset of nprobe=2's),
and the recall table must cover every (nprobe, query) cell."""

from __future__ import annotations

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators.similarity import (
    N_QUERIES,
    RECALL_NPROBES,
    ann_ivf_recall,
)


def test_ivf_recall_monotone_in_nprobe(spark):
    rows = ann_ivf_recall(spark, SF_SMOKE).collect()
    by_probe = {p: {} for p in RECALL_NPROBES}
    for r in rows:
        by_probe[r.nprobe][r.query_id] = r.recall
    for p in RECALL_NPROBES:
        assert len(by_probe[p]) == N_QUERIES
    for q in by_probe[RECALL_NPROBES[0]]:
        assert by_probe[2][q] >= by_probe[1][q], (
            f"recall dropped when probing more buckets: query {q}: "
            f"nprobe1={by_probe[1][q]} nprobe2={by_probe[2][q]}"
        )
    # probing more buckets must help at least one query at this SF,
    # otherwise the knob (and this test) is vacuous
    assert any(by_probe[2][q] > by_probe[1][q] for q in by_probe[1])
