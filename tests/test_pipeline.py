"""Semantic + plan tests for the pipeline operators (contamination,
redaction, repetition, sampling, chunking, k-means step, similarity
histogram): recomputed ground truth in plain Python at sf0.001, plus
the scale-shape assertions (no pairwise joins, no Python in plans)."""

from __future__ import annotations

import hashlib
import math

import pytest

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators import pipeline
from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs_pdf(spark):
    return (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text", "lang")
        .toPandas()
        .set_index("doc_id")
    )


def test_chunking_reconstructs_documents(spark, docs_pdf):
    out = pipeline.text_chunk_tokens(spark, SF_SMOKE).toPandas()
    c = pipeline.CHUNK_TOKENS
    # every doc appears with ceil(n/C) chunks whose digests match a
    # plain-Python re-chunking
    for doc_id, text in docs_pdf["text"].head(25).items():
        toks = text.split(" ")
        rows = out[out.doc_id == doc_id].sort_values("chunk_id")
        assert len(rows) == math.ceil(len(toks) / c)
        for _, r in rows.iterrows():
            piece = toks[int(r.chunk_id) * c : (int(r.chunk_id) + 1) * c]
            assert r.n_chunk_tokens == len(piece)
            assert r.chunk_md5 == hashlib.md5(" ".join(piece).encode()).hexdigest()


def test_redaction_counts_and_digests(spark, docs_pdf):
    out = pipeline.text_redact_blocklist(spark, SF_SMOKE).toPandas().set_index("doc_id")
    block = set(pipeline.BLOCKLIST)
    assert (out.n_redacted > 0).any(), "blocklist terms should occur in the corpus"
    for doc_id, text in docs_pdf["text"].head(50).items():
        toks = text.split(" ")
        expect = [pipeline.REDACTED if t in block else t for t in toks]
        row = out.loc[doc_id]
        assert row.n_redacted == sum(t in block for t in toks)
        assert row.redacted_md5 == hashlib.md5(" ".join(expect).encode()).hexdigest()


def test_repetition_ratio_bounds(spark):
    out = pipeline.text_repetition_ratio(spark, SF_SMOKE).toPandas()
    assert (out.n_distinct_trigrams <= out.n_trigrams).all()
    assert ((out.repetition_ratio >= 0) & (out.repetition_ratio < 1)).all()
    # the synthetic corpus draws from a tiny vocabulary: trigram
    # repetition must actually occur somewhere
    assert (out.repetition_ratio > 0).any()


def test_contamination_rates(spark, docs_pdf):
    out = pipeline.text_contamination_overlap(spark, SF_SMOKE).toPandas()
    n_eval = sum(1 for d in docs_pdf.index if d % pipeline.EVAL_MOD == 0)
    assert len(out) == n_eval
    assert ((out.contamination_rate >= 0) & (out.contamination_rate <= 1)).all()
    assert (out.n_contaminated <= out.n_shingles).all()
    # tiny shared vocabulary ⇒ heavy trigram overlap with the corpus
    assert out.contamination_rate.mean() > 0.05


def test_stratified_sample_sizes(spark, docs_pdf):
    out = pipeline.sample_stratified_by_lang(spark, SF_SMOKE).toPandas()
    per_lang = docs_pdf.groupby("lang").size()
    for lang, n in per_lang.items():
        got = out[out.lang == lang]
        assert len(got) == min(n, pipeline.SAMPLE_PER_LANG)
        assert sorted(got.rk) == list(range(1, len(got) + 1))


def test_kmeans_matrix_partitions_corpus(spark):
    out = pipeline.kmeans_reassign_matrix(spark, SF_SMOKE).toPandas()
    emb = load_table(spark, SF_SMOKE, "embeddings")
    assert out.n.sum() == emb.count()
    assert (out.avg_cos <= 1.0).all()
    # labeled clusters carry real (if noisy) structure: diagonal mass
    # is well above the 1/k = 10% a random assignment would give
    diag = out[out.label == out.assigned].n.sum()
    assert diag / out.n.sum() > 0.2


def test_sim_histogram_covers_all_pairs(spark):
    out = pipeline.embedding_sim_histogram(spark, SF_SMOKE).toPandas()
    emb = load_table(spark, SF_SMOKE, "embeddings")
    # vec_ids are contiguous 0..n-1 ⇒ exactly n-1 consecutive pairs
    assert out.n_pairs.sum() == emb.count() - 1
    assert out.bucket.between(0, 19).all()


def test_contamination_plan_is_hash_join(spark):
    plan = formatted_plan(pipeline.text_contamination_overlap(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_plan_broadcasts_centroids(spark):
    plan = formatted_plan(pipeline.kmeans_reassign_matrix(spark, SF_SMOKE))
    # centroid table is tiny and explicitly broadcast; the corpus is
    # scanned, never nested-loop-joined against itself
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
