"""Semantics tests for the round-6 retrieval / linkage / graph /
segmentation operators — planted-input invariants the oracle gate
can't see (it only proves Spark == DuckDB, not that both are right)."""

from __future__ import annotations

import math

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators.graph import (
    graph_triangle_count,
)
from gresearch_parquet_benchmarking_spark.operators.retrieval import (
    BM25_TERMS,
    BM25_TOP,
    FUZZY_MAX_DIST,
    fuzzy_join_part_names,
    text_bm25_search,
)
from gresearch_parquet_benchmarking_spark.operators.analytics import (
    RFM_TILES,
    events_rfm_scores,
)
from gresearch_parquet_benchmarking_spark.operators.similarity import (
    MRL_DIMS,
    TOP_K,
    embedding_matryoshka_recall,
)
from gresearch_parquet_benchmarking_spark.operators.registry import (
    release_persists,
)


def test_triangle_count_identities(spark):
    """Triangles ≤ wedges/3; clustering ∈ [0,1]; the planted K4 lower
    bound: a 4-clique order contributes C(4,3)=4 triangles."""
    row = graph_triangle_count(spark, SF_SMOKE).collect()[0]
    release_persists()
    assert row.n_triangles * 3 <= row.n_wedges
    assert 0.0 <= row.global_clustering <= 1.0
    assert row.n_edges > 0 and row.n_nodes > 0
    # wedge identity: sum C(deg,2) >= edges when any node has deg >= 2
    assert row.n_wedges >= row.n_edges - row.n_nodes + 1


def test_triangle_count_exact_on_planted_graph(spark, tmp_path):
    """K4 + one pendant edge: exactly 4 triangles, 7 edges,
    wedges = 3·C(3,2) + C(4,2) = 15 (pendant attaches to node 1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # orders encode the edges: each order = one edge (2 parts)
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (1, 5)]
    rows = []
    for oid, (u, v) in enumerate(k4):
        rows.append((oid, u))
        rows.append((oid, v))
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    d = tmp_path / "planted"
    d.mkdir()
    pq.write_table(tbl, d / "lineitem.parquet")
    row = graph_triangle_count(spark, str(d)).collect()[0]
    release_persists()
    assert row.n_nodes == 5
    assert row.n_edges == 7
    assert row.n_triangles == 4
    # deg: 1→4, 2/3/4→3, 5→1 ⇒ wedges = 6 + 3*3 = 15
    assert row.n_wedges == 15
    assert abs(row.global_clustering - 12 / 15) < 1e-9


def test_bm25_shape_and_idf_monotonicity(spark):
    out = text_bm25_search(spark, SF_SMOKE).toPandas()
    release_persists()
    assert set(out.term) == set(BM25_TERMS)
    for t, grp in out.groupby("term"):
        assert len(grp) <= BM25_TOP
        assert list(grp.rnk) == list(range(1, len(grp) + 1))
        # scores non-increasing down the ranking
        assert all(a >= b for a, b in zip(grp.score, grp.score[1:]))
    assert (out.score > 0).all()  # the +1 idf floor forbids negatives


def test_bm25_matches_local_formula(spark):
    """Recompute the winning score for one term with plain Python over
    the collected corpus — pins the formula itself, not just the
    cross-engine agreement."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }
    n = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n
    term = BM25_TERMS[0]
    tf = {d: toks.count(term) for d, toks in docs.items() if term in toks}
    df = len(tf)
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    k1, b = 1.2, 0.75

    def score(d):
        f = tf[d]
        dl = len(docs[d])
        return idf * (f * (k1 + 1.0)) / (f + k1 * (1.0 - b + b * dl / avgdl))

    best = sorted(tf, key=lambda d: (-score(d), d))[:BM25_TOP]
    got = (
        text_bm25_search(spark, SF_SMOKE)
        .filter(f"term = '{term}'")
        .orderBy("rnk")
        .collect()
    )
    release_persists()
    assert [r.doc_id for r in got] == best
    for r in got:
        assert abs(r.score - score(r.doc_id)) < 1e-5


def test_fuzzy_join_blocking_and_threshold(spark):
    out = fuzzy_join_part_names(spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    assert (out.n_matches <= out.n_pairs).all()
    assert (out.min_dist <= out.max_dist).all()
    # same-noun same-size names differ only in the adjective, so the
    # block design guarantees SOME matches under the threshold overall
    assert out.n_matches.sum() > 0
    assert int(out.min_dist.min()) >= 0
    # matches honor the threshold by construction: any block whose
    # min_dist exceeds it must report zero matches
    over = out[out.min_dist > FUZZY_MAX_DIST]
    assert (over.n_matches == 0).all()


def test_rfm_partition_and_tile_bounds(spark):
    out = events_rfm_scores(spark, SF_SMOKE).toPandas()
    release_persists()
    for c in ("r_score", "f_score", "m_score"):
        assert out[c].between(1, RFM_TILES).all()
    # cells partition the user base: per-axis marginals are balanced
    # ntiles, so each axis's total equals the user count
    n_users = out.n_users.sum()
    assert n_users > 0
    r_marginal = out.groupby("r_score").n_users.sum()
    # NTILE balance: bucket sizes differ by at most 1
    assert r_marginal.max() - r_marginal.min() <= 1


def test_matryoshka_recall_monotone_in_dim(spark):
    """More prefix dims ⇒ (weakly) better mean recall, and the full
    table covers every (dim, query) cell with n_true = TOP_K."""
    out = embedding_matryoshka_recall(spark, SF_SMOKE).toPandas()
    release_persists()
    assert set(out.mrl_dim) == set(MRL_DIMS)
    assert (out.n_true == TOP_K).all()
    assert (out.n_hits <= out.n_true).all()
    means = out.groupby("mrl_dim").recall.mean()
    dims = sorted(MRL_DIMS)
    # not guaranteed pointwise, but mean recall across 10 queries
    # rising with dim is the property the sweep exists to show; allow
    # equality (both arms can saturate on an easy corpus)
    assert means[dims[0]] <= means[dims[-1]] + 1e-9


def test_knn_eval_vote_bounds(spark):
    from gresearch_parquet_benchmarking_spark.operators.similarity import (
        N_QUERIES,
        ann_knn_classifier_eval,
    )

    out = ann_knn_classifier_eval(spark, SF_SMOKE).toPandas()
    release_persists()
    assert len(out) == N_QUERIES
    assert out.votes.between(1, TOP_K).all()
    # a correct row's winning vote count is the majority's size; the
    # accuracy is derivable and bounded
    acc = out.correct.mean()
    assert 0.0 <= acc <= 1.0


def test_power_user_concentration_invariants(spark):
    from gresearch_parquet_benchmarking_spark.operators.analytics import (
        TOP_SHARE_PCT,
        events_power_user_concentration,
    )

    row = events_power_user_concentration(spark, SF_SMOKE).collect()[0]
    release_persists()
    assert row.p50 <= row.p90 <= row.p99 <= row.max_events
    # top-X% share is at least X% (heaviest users can't be below par)
    assert row.top_share >= TOP_SHARE_PCT / 100.0 - 1e-9
    assert row.top_share <= 1.0
    assert row.k_top >= 1
    assert row.n_events >= row.n_users  # every user has >= 1 event


def test_kcore_clique_survives_star_peels(spark, tmp_path):
    """A (k+1)-clique IS a k-core (every degree exactly k — survives,
    converged); a star's leaves have degree 1 — the whole component
    peels. Edges encoded as 2-line orders, the operator's input shape."""
    import itertools

    import pyarrow as pa
    import pyarrow.parquet as pq

    from gresearch_parquet_benchmarking_spark.operators.graph import (
        K_CORE,
        graph_kcore_bounded,
    )

    clique = list(itertools.combinations(range(1, K_CORE + 2), 2))
    hub = 10_000
    star = [(hub, hub + i) for i in range(1, 40)]
    rows = []
    for oid, (u, v) in enumerate(clique + star):
        rows.append((oid, u))
        rows.append((oid, v))
    tbl = pa.table(
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    d = tmp_path / "kcore"
    d.mkdir()
    pq.write_table(tbl, d / "lineitem.parquet")
    row = graph_kcore_bounded(spark, str(d)).collect()[0]
    release_persists()
    assert row.n_nodes_remaining == K_CORE + 1          # the clique
    assert row.n_edges_remaining == len(clique)
    assert bool(row.converged)                          # clique is stable
