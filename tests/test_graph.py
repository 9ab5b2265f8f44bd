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


def test_contamination_safe_split_keeps_clusters_together(spark):
    """Every planted near-dup pair (doc, doc + offset) must land on the
    SAME split side; the aggregate split_clean flag must be TRUE; the
    90/10 proportions must be roughly respected."""
    from conftest import SF_CORRECT

    from pyspark.sql import functions as F

    from gresearch_parquet_benchmarking_spark.functions.text_funcs import md5_hash64
    from gresearch_parquet_benchmarking_spark.operators import dedup, graph
    from gresearch_parquet_benchmarking_spark.operators.registry import (
        release_persists,
    )

    out = graph.split_contamination_safe(spark, SF_CORRECT).toPandas()
    release_persists()
    assert set(out.side) == {"train", "eval"}
    assert out.split_clean.all()
    train = out[out.side == "train"].n_docs.iloc[0]
    total = out.n_docs.sum()
    assert 0.8 <= train / total <= 0.97  # hash split, cluster-granular
    # clustered docs exist on at least one side (planting guarantees
    # near-dup pairs), and per-side cluster counts are consistent
    assert out.n_clustered.sum() > 0
    assert (out.n_clusters <= out.n_clustered).all()
