"""Connected-components semantics: planted chains must merge into one
cluster; isolated pairs stay pairs."""

from __future__ import annotations

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators import dedup
from gresearch_parquet_benchmarking_spark.operators.graph import (
    connected_components,
    dedup_connected_components,
)


def test_chain_merges_to_one_component(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22)],
        "src long, dst long",
    )
    comp = {r.node: r.component for r in connected_components(edges).collect()}
    assert comp[1] == comp[2] == comp[3] == comp[4] == 1
    assert comp[10] == comp[11] == 10
    assert comp[20] == comp[21] == comp[22] == 20


def test_dedup_clusters_over_planted_pairs(spark):
    out = dedup_connected_components(spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    rep = dict(zip(out.doc_id, out.cluster_rep))
    # every planted copy lands in the SAME cluster as its original
    # (the representative may be an even smaller doc when natural
    # near-dup pairs chain two planted clusters together)
    planted = out[out.doc_id >= dedup.INJECT_OFFSET]
    assert len(planted) > 0
    for copy_id in planted.doc_id:
        orig = copy_id - dedup.INJECT_OFFSET
        assert rep[copy_id] == rep.get(orig, rep[copy_id]), (copy_id, orig)
    assert (out.cluster_size >= 2).all()
