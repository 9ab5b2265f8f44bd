"""Semantic tests for the round-4 batch-composition operators
(operators/pipeline3.py): the oracle twins pin cross-engine equality;
these pin that the SEMANTICS are right — packing conserves tokens,
incremental dedup finds exactly the planted duplicates, sampling hits
its tier rates, the rebalanced mixture equalizes budgets, deciles are
monotone."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE

from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.functions.text_funcs import (
    md5_hash64,
    tokens_col,
)
from gresearch_parquet_benchmarking_spark.operators import pipeline3
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


def test_sequence_packing_conserves_tokens_and_bins(spark, docs):
    out = pipeline3.sequence_packing(spark, SF_SMOKE).toPandas()
    expect = docs.select(
        F.sum(F.size(tokens_col("text"))).alias("t"), F.count(F.lit(1)).alias("n")
    ).first()
    # every doc starts in exactly one bin; every token is attributed once
    assert int(out.n_docs_started.sum()) == expect["n"]
    assert int(out.tokens_started.sum()) == expect["t"]
    assert (out.n_spanning <= out.n_docs_started).all()
    # bins are the dense prefix 0..max within each lang (concat model
    # leaves no holes: a bin is only skipped if a doc spans across it,
    # and such a doc still STARTS in an earlier bin)
    for lang, grp in out.groupby("lang"):
        bins = sorted(grp.bin)
        assert bins[0] == 0
        # per-lang total fills ceil(tokens/BUDGET) bins; started-bins
        # are a subset but the last bin index matches the token total
        t = int(grp.tokens_started.sum())
        assert bins[-1] <= (t - 1) // pipeline3.PACK_BUDGET


def test_dedup_incremental_finds_exactly_planted(spark, docs):
    out = pipeline3.dedup_incremental(spark, SF_SMOKE).toPandas()
    h = md5_hash64(F.col("doc_id").cast("string")) % 100
    hashed = docs.withColumn("h", h)
    n_p1 = hashed.filter(
        (F.col("h") < pipeline3.SPLIT_PCT) & (F.col("doc_id") % pipeline3.PLANT_EVERY == 0)
    ).count()
    n_p2 = hashed.filter(
        (F.col("h") >= pipeline3.SPLIT_PCT) & (F.col("doc_id") % pipeline3.PLANT_EVERY == 0)
    ).count()
    n_batch_base = hashed.filter(F.col("h") >= pipeline3.SPLIT_PCT).count()
    # the corpus has no natural dups (seeded-random text), so the only
    # cross-corpus hits are the planted copies of corpus docs, and the
    # only in-batch collapses are the planted second copies of batch docs
    assert int(out.n_batch.sum()) == n_batch_base + n_p1 + n_p2
    assert int(out.n_dup_corpus.sum()) == n_p1
    assert int(out.n_dup_in_batch.sum()) == n_p2
    assert int(out.n_kept.sum()) == n_batch_base


def test_importance_sampling_rates_and_determinism(spark):
    out = pipeline3.sample_importance_weighted(spark, SF_SMOKE).toPandas()
    again = pipeline3.sample_importance_weighted(spark, SF_SMOKE).toPandas()
    assert out.equals(again)  # salted-hash decisions, not rand()
    assert (out.n_kept <= out.n_docs).all()
    # high tier keeps everything by construction (threshold 1000/1000)
    high = out[out.tier == "high"]
    assert (high.n_kept == high.n_docs).all()


def test_mixture_rebalance_equalizes_budget(spark):
    out = pipeline3.mixture_rebalance(spark, SF_SMOKE).toPandas()
    assert (out.sample_rate <= 1.0).all() and (out.sample_rate > 0).all()
    assert (out.n_docs_after <= out.n_docs).all()
    fair = out.chars_total.sum() / len(out)
    # languages over the fair share are cut to ~fair; under-share keep all
    over = out[out.chars_total > fair]
    kept_chars = over.chars_total * over.sample_rate
    assert ((kept_chars - fair).abs() / fair < 0.01).all()
    assert (out[out.chars_total <= fair].sample_rate == 1.0).all()


def test_curriculum_deciles_monotone(spark):
    out = pipeline3.curriculum_deciles(spark, SF_SMOKE).toPandas()
    for lang, grp in out.groupby("lang"):
        grp = grp.sort_values("decile")
        assert list(grp.decile) == list(range(1, len(grp) + 1))
        # score ranges of successive deciles never invert
        assert (grp.min_score.values <= grp.max_score.values).all()
        assert (grp.max_score.values[:-1] <= grp.min_score.values[1:] + 1e-12).all()


def test_curriculum_approx_matches_exact_decile_populations(spark):
    """The approx (map-side) bucketing must reproduce the exact NTILE
    decile populations within tolerance: same per-language totals, all
    10 buckets populated, every bucket within ±5 docs of the exact
    decile size at sf0.01 (near-exact cutpoints at accuracy=10000)."""
    sf = "/root/testdata/sf0.01"
    approx = pipeline3.curriculum_buckets_approx(spark, sf).toPandas()
    exact = pipeline3.curriculum_deciles(spark, sf).toPandas()
    ex_tot = exact.groupby("lang").n_docs.sum()
    for _, row in approx.iterrows():
        assert row.ten_buckets, row
        assert row.balanced, row
        assert row.n_docs == ex_tot[row.lang]
