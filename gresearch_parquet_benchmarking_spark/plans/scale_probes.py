"""Empirical scale-shape probes for the flagship LLM-pipeline operators.

The banded/bucketed designs (LSH bands, IVF buckets, hour bins,
degree-oriented wedges, term-pruned postings) claim NEAR-LINEAR growth
of candidate work in corpus size — the property that makes them viable
at 100 TB, where an all-pairs formulation is quadratic. Plan inspection
proves the join keys are bucket ids; this module proves the resulting
CARDINALITIES: each probe computes, from exactly the intermediate
relation the registered query builds (shared helpers — no parallel
reimplementation), the candidate count that relation feeds into the
downstream join, plus the query's real end-to-end shuffle bytes from
the executed plan.

`tests/test_scale_shapes.py` asserts sub-quadratic growth between
sf0.01 and sf0.1; `scripts_dev/scale_shapes.py` prints the BENCH.md
table.

Candidate-count identities (bucket sizes → join output, exact):

* self-join pairs inside a bucket of n rows with a `<` tiebreak:
  n·(n−1)/2 (LSH bands, hour bins)
* query-to-corpus join: n_queries·(n_bucket − 1) (IVF probes exclude
  the query row itself — query vectors are part of the corpus)
* oriented wedge join at a src of out-degree n: n·(n−1)/2
* postings: the tf relation IS the candidate set (count it)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import (
    all_queries,
    release_persists,
    track_persist,
)
from gresearch_parquet_benchmarking_spark.plans.explain import executed_shuffle_bytes


def _pairs_within_groups(grouped_counts: DataFrame) -> int:
    """Σ n·(n−1)/2 over a (…, n) per-group count frame."""
    row = grouped_counts.agg(
        F.sum(F.expr("n * (n - 1) div 2")).cast("long").alias("pairs")
    ).collect()[0]
    return int(row["pairs"] or 0)


def probe_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> dict:
    from gresearch_parquet_benchmarking_spark.operators.dedup import (
        _band_exploded,
        _signature_df,
    )

    sig = track_persist(_signature_df(spark, sf_dir))
    bands = _band_exploded(sig)
    buckets = bands.groupBy("band", "k1", "k2").agg(F.count(F.lit(1)).alias("n"))
    out = {
        "rows": sig.count(),
        "candidates": _pairs_within_groups(buckets),
    }
    release_persists()
    return out


def probe_ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> dict:
    from gresearch_parquet_benchmarking_spark.operators.similarity import (
        N_QUERIES,
        _bucket_assignment,
        _vectors,
    )

    vec = _vectors(spark, sf_dir)
    bucketed = track_persist(_bucket_assignment(vec))
    per_bucket = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("vec_id") < N_QUERIES).cast("long")).alias("nq"),
    )
    row = per_bucket.agg(
        F.sum(F.expr("nq * (n - 1)")).cast("long").alias("cand")
    ).collect()[0]
    out = {"rows": bucketed.count(), "candidates": int(row["cand"] or 0)}
    release_persists()
    return out


def probe_interval_overlap_users(spark: SparkSession, sf_dir: str) -> dict:
    from gresearch_parquet_benchmarking_spark.operators.analytics import _session_bins

    binned = track_persist(_session_bins(spark, sf_dir))
    per_bin = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("n"))
    out = {
        "rows": binned.select("user_id", "session_id").distinct().count(),
        "candidates": _pairs_within_groups(per_bin),
    }
    release_persists()
    return out


def probe_graph_triangle_count(spark: SparkSession, sf_dir: str) -> dict:
    from gresearch_parquet_benchmarking_spark.operators.graph import (
        _oriented_copurchase,
    )

    pairs, _deg, oriented = _oriented_copurchase(spark, sf_dir)
    per_src = oriented.groupBy("src").agg(F.count(F.lit(1)).alias("n"))
    out = {
        "rows": pairs.count(),  # distinct co-purchase edges
        "candidates": _pairs_within_groups(per_src),  # oriented wedges
    }
    release_persists()
    return out


def probe_text_bm25_search(spark: SparkSession, sf_dir: str) -> dict:
    from gresearch_parquet_benchmarking_spark.operators.retrieval import _postings

    toks, tf = _postings(spark, sf_dir)
    out = {
        "rows": toks.select("doc_id").distinct().count(),
        "candidates": tf.count(),
    }
    release_persists()
    return out


def probe_dedup_containment_bottomk(spark: SparkSession, sf_dir: str) -> dict:
    """Candidate work of the r8 rule: pair-join output rows =
    Σ C(n,2) over (h1,h2) posting-pair buckets, plus the 1-shingle
    side channel's n_one·(n−1) per single-hash bucket."""
    from gresearch_parquet_benchmarking_spark.operators.dedup import (
        _bottomk_sketch,
        _pair_postings,
    )

    sk = track_persist(_bottomk_sketch(spark, sf_dir))
    per_pair = (
        _pair_postings(sk).groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("n"))
    )
    pair_work = _pairs_within_groups(per_pair)
    per_hash = (
        sk.select(
            "doc_id", (F.size("hs") == 1).cast("long").alias("one"),
            F.explode("hs").alias("h"),
        )
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("one").alias("n_one"))
    )
    row = per_hash.agg(
        F.sum(F.expr("n_one * (n - 1)")).cast("long").alias("w")
    ).collect()[0]
    out = {
        "rows": sk.count(),
        "candidates": pair_work + int(row["w"] or 0),
    }
    release_persists()
    return out


def probe_dedup_semantic(spark: SparkSession, sf_dir: str) -> dict:
    """E-step assignment work of the FINAL Lloyd iteration under the
    two-level rule (r9): each row scores the G coarse seeds plus the
    fine centroids of its coarse cell, so candidates = N·G + Σ_rows
    |cell(row)| ≈ N·2·sqrt(k) centroid dots — vs the flat rule's N·k,
    which grows quadratically in N once k ∝ N (the r8 VERDICT's one
    remaining 100×-scale liability)."""
    from gresearch_parquet_benchmarking_spark.operators.similarity import (
        _sem_clustering,
    )

    assigned, fcell, kval = _sem_clustering(spark, sf_dir)
    g = int(kval.collect()[0]["gv"])
    cellsize = fcell.groupBy("cell").agg(F.count(F.lit(1)).alias("n"))
    cellof = fcell.select(F.col("c_label").alias("c_id"), "cell")
    row = (
        assigned.join(cellof, "c_id")
        .join(cellsize, "cell")
        .agg(
            F.sum(F.col("n") + F.lit(g)).cast("long").alias("work"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .collect()[0]
    )
    out = {"rows": int(row["n_rows"]), "candidates": int(row["work"])}
    release_persists()
    return out


def probe_window_ntile_percent(spark: SparkSession, sf_dir: str) -> dict:
    """Two-pass global rank (_global_row_number, r10 — the helper is
    load-bearing for 10 queries): the corpus shuffles exactly once
    (range exchange) and the driver-side offset probe collects one row
    per NON-EMPTY RANGE, a plan constant ≤ RANK_RANGES independent of
    corpus size. candidates = that probe cardinality; `bound` = the
    claimed cap, asserted at both SFs by test_scale_shapes."""
    from gresearch_parquet_benchmarking_spark.operators.analytics import (
        RANK_RANGES,
        _global_row_number,
    )
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    pa = load_table(spark, sf_dir, "part").select("p_partkey", "p_size")
    ranked, n = _global_row_number(pa, ["p_size", "p_partkey"], alias="rn")
    cand = ranked.select("rid").distinct().count()
    release_persists()
    return {"rows": n, "candidates": cand, "bound": RANK_RANGES}


def probe_events_inter_arrival_percentiles(spark: SparkSession, sf_dir: str) -> dict:
    """Two-pass grouped rank (_grouped_row_number, r10): probe
    cardinality ≤ |groups|·RANK_RANGES — event_type is a handful of
    catalog values, so the offset map stays a bounded plan constant
    while the ranked corpus grows."""
    from gresearch_parquet_benchmarking_spark.operators.analytics import (
        RANK_RANGES,
        _grouped_row_number,
        _inter_arrival_gaps,
    )

    seq = _inter_arrival_gaps(spark, sf_dir)
    g = _grouped_row_number(
        seq,
        ["event_type"],
        [F.asc("gap_us"), F.asc("event_id")],
        alias="rn",
        n_alias="n",
    )
    cand = g.select("event_type", "rid").distinct().count()
    n_types = g.select("event_type").distinct().count()
    rows = g.count()
    release_persists()
    return {"rows": rows, "candidates": cand, "bound": n_types * RANK_RANGES}


def probe_fuzzy_join_part_names(spark: SparkSession, sf_dir: str) -> dict:
    from gresearch_parquet_benchmarking_spark.operators.retrieval import _blocked_parts

    parts = track_persist(_blocked_parts(spark, sf_dir))
    per_block = parts.groupBy("noun", "p_size").agg(F.count(F.lit(1)).alias("n"))
    out = {"rows": parts.count(), "candidates": _pairs_within_groups(per_block)}
    release_persists()
    return out


def probe_dedup_substring_coverage(spark: SparkSession, sf_dir: str) -> dict:
    """Gram-occurrence cardinality of the substring-coverage scan: the
    corpus explodes to ~token-count rows EXACTLY ONCE (candidates =
    |occ|, linear in corpus tokens); the dup-gram set then reduces on
    constant-width md5 keys. A regression that exploded per-pair or
    re-exploded per consumer would show here as super-linear growth."""
    from gresearch_parquet_benchmarking_spark.operators.dedup import _coverage_occ

    occ = _coverage_occ(spark, sf_dir)
    row = occ.agg(
        F.count_distinct("doc_id").alias("docs"),
        F.count(F.lit(1)).alias("grams"),
    ).collect()[0]
    out = {"rows": int(row["docs"]), "candidates": int(row["grams"])}
    release_persists()
    return out


def probe_text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> dict:
    """Winnowing candidate work = the exploded fingerprint relation
    (feeds the shared-count groupBy and the join back): selection
    density is ≈ 2/(w+1) of grams, so fingerprints grow linearly with
    corpus tokens. The probe reads the SAME persisted (gs, hv, fps)
    relation the query builds (_winnow_base); the companion test in
    test_scale_shapes additionally pins that the md5-per-gram chain
    stays behind that persist boundary (re-inlining measured 56 s vs
    0.6 s at sf0.01 — the r5 Catalyst projection-collapse lesson)."""
    from gresearch_parquet_benchmarking_spark.operators.text import _winnow_base

    base = _winnow_base(spark, sf_dir)
    row = base.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size("fps")).cast("long").alias("fps"),
    ).collect()[0]
    out = {"rows": int(row["docs"]), "candidates": int(row["fps"] or 0)}
    release_persists()
    return out


def probe_sequence_packing(spark: SparkSession, sf_dir: str) -> dict:
    """Distributed prefix sum (two-pass): candidates = the per-range
    totals table (pass 1) — corpus_rows/RANGE_DOCS-sized metadata, the
    only relation the cumulative window ever sees; max_window_rows =
    the widest (lang, rid) local-window partition, bounded by
    RANGE_DOCS at ANY corpus size (the whole point of the two-pass
    shape: no language's token stream lands in one task)."""
    from gresearch_parquet_benchmarking_spark.operators.pipeline3 import (
        RANGE_DOCS,
        _pack_base,
    )

    base = _pack_base(spark, sf_dir)
    per_range = base.groupBy("lang", "rid").agg(F.count(F.lit(1)).alias("n"))
    row = per_range.agg(
        F.count(F.lit(1)).alias("ranges"), F.max("n").alias("mx")
    ).collect()[0]
    out = {
        "rows": base.count(),
        "candidates": int(row["ranges"]),
        "max_window_rows": int(row["mx"]),
        "bound": RANGE_DOCS,
    }
    release_persists()
    return out


def _streaming_state_probe(name: str):
    """Probe factory for streaming queries (r12, VERDICT r11 #5): run
    the registered query's full replay and harvest the state-store
    row counts _run_to_table captured from recentProgress. "rows" is
    the INPUT event count (several streaming results are 1-row
    rollups, so output cardinality can't anchor the growth ratio);
    "candidates" is the peak Σ numRowsTotal across batches — the
    bounded-state claim watermark eviction makes."""

    def probe(spark: SparkSession, sf_dir: str) -> dict:
        from gresearch_parquet_benchmarking_spark.sources.events import (
            load_events,
        )
        from gresearch_parquet_benchmarking_spark.streaming.events_stream import (
            drain_state_metrics,
        )

        drain_state_metrics()  # clear any prior run's capture
        df = all_queries()[name](spark, sf_dir)
        df.collect()
        runs = drain_state_metrics()
        release_persists()
        return {
            "rows": load_events(spark, sf_dir).count(),
            "candidates": max((r["peak_state_rows"] for r in runs), default=0),
            "final_state_rows": max(
                (r["final_state_rows"] for r in runs), default=0
            ),
            "n_batches": sum(r["n_batches"] for r in runs),
        }

    return probe


# Streaming state-growth probes: NOT in PROBES/measure() — the batch
# shuffle-bytes leg reads the executed plan of the returned frame,
# which for streaming queries is just the memory-sink scan. These get
# their own near-linearity test (tests/test_scale_shapes.py).
STATE_PROBES = {
    "stream_stream_join": _streaming_state_probe("stream_stream_join"),
    "stream_funnel_buffered_ooo": _streaming_state_probe(
        "stream_funnel_buffered_ooo"
    ),
}

PROBES = {
    "dedup_minhash_lsh": probe_dedup_minhash_lsh,
    "ann_ivf_pq_topk": probe_ann_ivf_pq_topk,
    "interval_overlap_users": probe_interval_overlap_users,
    "graph_triangle_count": probe_graph_triangle_count,
    "text_bm25_search": probe_text_bm25_search,
    "dedup_containment_bottomk": probe_dedup_containment_bottomk,
    "dedup_semantic": probe_dedup_semantic,
    "fuzzy_join_part_names": probe_fuzzy_join_part_names,
    "window_ntile_percent": probe_window_ntile_percent,
    "events_inter_arrival_percentiles": probe_events_inter_arrival_percentiles,
    "text_winnowing_fingerprints": probe_text_winnowing_fingerprints,
    "sequence_packing": probe_sequence_packing,
    "dedup_substring_coverage": probe_dedup_substring_coverage,
}


def measure(spark: SparkSession, sf_dir: str, name: str) -> dict:
    """Candidate-shape probe + the registered query's real end-to-end
    shuffle bytes (post-AQE executed plan, every distinct exchange)."""
    stats = PROBES[name](spark, sf_dir)
    df = all_queries()[name](spark, sf_dir)
    df.collect()
    stats["shuffle_bytes"] = executed_shuffle_bytes(df)
    release_persists()
    return stats
