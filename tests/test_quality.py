"""Semantic tests for the round-5 diagnostics operators
(operators/quality.py) and embedding statistics (similarity.py):
the oracle twins pin cross-engine equality; these pin that the
SEMANTICS are right — confusion shares sum to one, calibration is
consistent with the LSH thresholding story, lift averages out to one,
covariance diagonals are variances, whitening standardizes."""

from __future__ import annotations

import math

import pytest

from conftest import SF_CORRECT

from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators import quality, similarity
from gresearch_parquet_benchmarking_spark.operators.registry import release_persists
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


@pytest.fixture(autouse=True)
def _release():
    yield
    release_persists()


def test_langid_confusion_shares_and_totals(spark):
    out = quality.text_langid_confusion(spark, SF_CORRECT).toPandas()
    docs = load_table(spark, SF_CORRECT, "documents")
    per_lang = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # every labeled row's cells sum to the language's doc count and its
    # recall shares sum to 1
    for lang, grp in out.groupby("labeled_lang"):
        assert grp.n_docs.sum() == per_lang[lang]
        assert abs(grp.recall_share.sum() - 1.0) < 1e-5
    for _, grp in out.groupby("predicted_lang"):
        assert abs(grp.precision_share.sum() - 1.0) < 1e-5


def test_minhash_calibration_covers_planted_neardups(spark):
    out = quality.dedup_minhash_calibration(spark, SF_CORRECT).toPandas()
    # candidates exist, estimates live in [0,1], and the pair mass at
    # full signature agreement has near-1 exact Jaccard (the planted
    # neardup copies differ by 2 leading tokens only)
    assert out.n_pairs.sum() > 0
    assert (out.n_match.between(0, quality.N_MINHASH)).all()
    assert (out.avg_exact_jaccard.between(0.0, 1.0)).all()
    full = out[out.n_match == quality.N_MINHASH]
    assert not full.empty and (full.avg_exact_jaccard > 0.8).all()
    # the estimator is unbiased-ish where the mass is: mean abs error
    # bounded well below the 1/N_MINHASH quantization step x 2
    assert (out.avg_abs_err <= 0.25).all()


def test_quality_dup_lift_averages_to_one(spark):
    out = quality.quality_vs_dup_lift(spark, SF_CORRECT).toPandas()
    # doc-weighted mean of tier rates == overall rate  =>  weighted
    # mean lift == 1
    total = out.n_docs.sum()
    weighted = (out.lift * out.n_docs).sum() / total
    assert abs(weighted - 1.0) < 1e-3
    assert (out.n_dups <= out.n_docs).all()
    assert out.n_dups.sum() > 0  # planting guarantees dups


def test_covariance_diagonal_is_variance(spark):
    out = similarity.embedding_dim_covariance(spark, SF_CORRECT).toPandas()
    d = int(out.j.max()) + 1
    assert len(out) == d * (d + 1) // 2
    diag = out[out.i == out.j]
    assert len(diag) == d
    assert (diag["cov"] >= 0).all()
    # Cauchy-Schwarz: |cov(i,j)| <= sd_i * sd_j
    sd = {int(r.i): math.sqrt(r.cov) for r in diag.itertuples()}
    off = out[out.i != out.j]
    assert all(
        abs(r.cov) <= sd[int(r.i)] * sd[int(r.j)] + 1e-9 for r in off.itertuples()
    )


def test_whitening_standardizes(spark):
    out = similarity.embedding_whitening(spark, SF_CORRECT).toPandas()
    n = len(out)
    # sum over vectors of ||z||^2 = n * d exactly (per-dim z has unit
    # variance and mean ~0 across the corpus)
    d = 64
    total_sq = (out.l2_white**2).sum()
    assert abs(total_sq / (n * d) - 1.0) < 1e-3
    assert (out.max_abs_z > 0).all()
    assert (out.l2_raw > 0).all()


def test_pq_codebook_partitions_and_distortion(spark):
    out = similarity.ann_pq_codebook(spark, SF_CORRECT).toPandas()
    emb = load_table(spark, SF_CORRECT, "embeddings")
    n = emb.count()
    # every (vector, subspace) assigned exactly once
    for m, grp in out.groupby("subspace"):
        assert grp.n_assigned.sum() == n
    assert out.subspace.nunique() == similarity.PQ_SUBSPACES
    assert (out.avg_sq_dist >= 0).all()


def test_pmi_collocations_consistency(spark):
    out = quality.text_pmi_collocations(spark, SF_CORRECT).toPandas()
    assert (out.c_xy >= quality.PMI_MIN_COUNT).all()
    assert len(out) > 0
    # PMI is bounded above by -log2 P(xy) (= log2(T_bi / c_xy))
    import numpy as np

    tb = None  # recompute total bigrams from the corpus
    docs = load_table(spark, SF_CORRECT, "documents")
    n_tokens = docs.select(F.sum(F.size(F.split("text", " ")))).first()[0]
    n_docs = docs.count()
    tb = n_tokens - n_docs  # bigrams per doc = tokens - 1
    assert (out.pmi <= np.log2(tb / out.c_xy) + 1e-6).all()


def test_attribution_partitions_purchases(spark):
    from gresearch_parquet_benchmarking_spark.operators import analytics
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    out = analytics.event_attribution_last_touch(spark, SF_CORRECT).toPandas()
    ev = load_events(spark, SF_CORRECT)
    n_purch = ev.filter(F.col("event_type") == "purchase").count()
    assert out.n_purchases.sum() == n_purch
    assert set(out.channel) <= {"view", "click", "none"}
    attributed = out[out.channel != "none"]
    assert (attributed.avg_lag_us <= analytics.ATTR_WINDOW_US).all()
    assert (attributed.avg_lag_us > 0).all()


def test_ivf_pq_ranks_and_self_exclusion(spark):
    out = similarity.ann_ivf_pq_topk(spark, SF_CORRECT).toPandas()
    assert (out.neighbor_id != out.query_id).all()
    assert (out.adc >= -1e-9).all()  # squared distances
    for _, grp in out.groupby("query_id"):
        grp = grp.sort_values("rank")
        assert list(grp["rank"]) == list(range(1, len(grp) + 1))
        # adc non-decreasing with rank
        assert (grp.adc.diff().dropna() >= -1e-9).all()


def test_ivf_pq_recall_bounded_by_ivf_ceiling(spark):
    """PQ searches the SAME nprobe=1 candidate set as exact-cosine IVF,
    so per query its hits cannot exceed IVF@1's (the index ceiling —
    0.18 mean on this near-random corpus); ADC quantization must still
    retain most of that attainable recall."""
    out = similarity.ann_ivf_pq_recall(spark, SF_CORRECT).toPandas()
    ivf = similarity.ann_ivf_recall(spark, SF_CORRECT).toPandas()
    ivf1 = ivf[ivf.nprobe == 1].set_index("query_id")
    assert len(out) == similarity.N_QUERIES
    assert (out.n_true == similarity.TOP_K).all()
    assert (out.recall.between(0.0, 1.0)).all()
    for r in out.itertuples():
        assert r.n_hits <= ivf1.loc[r.query_id].n_hits, (r, ivf1)
    assert out.n_hits.sum() >= 0.5 * ivf1.n_hits.sum(), (out, ivf1)


def test_winnowing_invariants(spark):
    from gresearch_parquet_benchmarking_spark.operators import text

    out = text.text_winnowing_fingerprints(spark, SF_CORRECT).toPandas()
    # a doc with g grams has g - W + 1 windows; distinct minima can't
    # exceed that, and shared can't exceed selected
    win_cap = (out.n_grams - text.WINNOW_W + 1).clip(lower=0)
    assert (out.n_fp <= win_cap).all()
    assert (out.n_shared <= out.n_fp).all()
    # winnowing density ~ 2/(w+1): long docs must select >1 fingerprint
    long_docs = out[out.n_grams >= 20]
    assert (long_docs.n_fp > 1).all()
    # common phrases exist in a natural-language-ish corpus
    assert out.n_shared.sum() > 0


def test_pca_power_iteration_invariants(spark):
    import numpy as np

    out = similarity.embedding_pca_power_iteration(spark, SF_CORRECT).toPandas()
    assert len(out) == similarity.EMB_DIM
    v = out.sort_values("i").loading.to_numpy()
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # unit direction
    eig = out.eigenvalue.iloc[0]
    assert (out.eigenvalue == eig).all()
    # Rayleigh quotient of a unit vector lies within the covariance
    # spectrum; compare against numpy's exact eigenvalues
    emb = load_table(spark, SF_CORRECT, "embeddings").toPandas()
    X = np.array(emb.embedding.tolist(), dtype=np.float64)
    C = np.cov(X, rowvar=False, bias=True)
    lams = np.linalg.eigvalsh(C)
    assert lams[0] - 1e-9 <= eig <= lams[-1] + 1e-9
    # power iteration monotonically improves on the start direction
    v0 = np.full(similarity.EMB_DIM, 1.0 / np.sqrt(similarity.EMB_DIM))
    assert eig >= float(v0 @ C @ v0) - 1e-9


def test_bigram_logprob_consistency(spark):
    """Conditional bigram probabilities sum to 1 per context, so every
    per-bigram logprob is <= 0 and a doc of pure repetition ('a a a')
    would score 0; corpus docs must land strictly below."""
    out = quality.bigram_logprob_score(spark, SF_CORRECT).toPandas()
    docs = load_table(spark, SF_CORRECT, "documents")
    n_docs = docs.count()
    assert len(out) == n_docs
    assert (out.avg_logprob <= 1e-9).all()
    assert (out.avg_logprob < 0).any()
    # every doc's bigram count = tokens - 1
    n_tok = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n")
        ).collect()
    }
    assert all(r.n_bigrams == n_tok[r.doc_id] - 1 for r in out.itertuples())


def test_ablation_consistent_with_gopher_dashboard(spark):
    """n_fail per rule must equal n_docs - n_pass_<rule> summed over
    languages (same flag expressions by construction), and unique
    failures can never exceed total failures."""
    from gresearch_parquet_benchmarking_spark.operators.quality import (
        quality_filter_ablation,
        quality_gopher_rules,
    )
    from gresearch_parquet_benchmarking_spark.operators.registry import (
        release_persists,
    )
    from conftest import SF_SMOKE

    ab = {r.rule: r for r in quality_filter_ablation(spark, SF_SMOKE).collect()}
    release_persists()
    g = quality_gopher_rules(spark, SF_SMOKE).toPandas()
    release_persists()
    n_docs = int(g.n_docs.sum())
    pass_cols = {
        "words": "n_pass_words",
        "wlen": "n_pass_wordlen",
        "symbol": "n_pass_symbol",
        "uniq": "n_pass_uniq",
        "stop": "n_pass_stopword",
    }
    for rule, col in pass_cols.items():
        assert ab[rule].n_docs == n_docs
        assert ab[rule].n_fail == n_docs - int(g[col].sum()), rule
        assert ab[rule].n_fail_only <= ab[rule].n_fail


def test_top_paths_shape(spark):
    from gresearch_parquet_benchmarking_spark.operators.analytics import (
        PATH_TOP,
        events_top_paths,
    )
    from conftest import SF_SMOKE

    out = events_top_paths(spark, SF_SMOKE).toPandas()
    assert 0 < len(out) <= PATH_TOP
    assert list(out.rnk) == list(range(1, len(out) + 1))
    assert all(a >= b for a, b in zip(out.n_users, out.n_users[1:]))
    # paths are '>'-joined event types, at most PATH_LEN long
    assert out.path.str.split(">").map(len).le(3).all()
