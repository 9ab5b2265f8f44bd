"""Physical-plan assertions: the scale behaviors the engine depends on
(pushdown, pruning, broadcast, codegen) must hold — these are the
'would this survive 100×' checks, pinned."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators import relational, similarity
from gresearch_parquet_benchmarking_spark.plans.explain import (
    has_broadcast_join,
    pushed_filters,
    scan_read_schemas,
    wholestage_codegen_spans,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


def test_filter_pushdown_reaches_scan(spark):
    df = relational.q6_forecast_revenue(spark, SF_SMOKE)
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters
    assert any("l_quantity" in f for f in filters), filters


def test_column_pruning_q1(spark):
    df = relational.q1_pricing_summary(spark, SF_SMOKE)
    schemas = scan_read_schemas(df)
    assert len(schemas) == 1
    # 7 needed columns, not all 11
    assert "l_partkey" not in schemas[0]
    assert "l_returnflag" in schemas[0]


def test_projection_prunes_to_two_columns(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    df = li.select("l_orderkey", "l_quantity")
    (schema,) = scan_read_schemas(df)
    assert schema.count(":") == 2, schema


def test_dim_joins_broadcast(spark):
    df = relational.q5_local_supplier_volume(spark, SF_SMOKE)
    assert has_broadcast_join(df)


def test_topk_uses_window_group_limit(spark):
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    df = relational.topk_per_group(spark, SF_SMOKE)
    assert "WindowGroupLimit" in formatted_plan(df)


def test_vector_math_stays_in_codegen(spark):
    # higher-order-function cosine must not introduce a Python worker
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    df = similarity.embedding_norms(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_q1_has_codegen(spark):
    df = relational.q1_pricing_summary(spark, SF_SMOKE)
    df.collect()  # AQE: codegen markers appear in the final plan
    assert wholestage_codegen_spans(df) >= 1


def test_broadcast_hint_respected_small_dim(spark):
    na = load_table(spark, SF_SMOKE, "nation")
    li = load_table(spark, SF_SMOKE, "lineitem")
    df = li.join(F.broadcast(na), li.l_suppkey == na.n_nationkey)
    assert has_broadcast_join(df)


def test_q7_nation_pair_broadcast_and_pushdown(spark):
    from gresearch_parquet_benchmarking_spark.operators import tpch2

    df = tpch2.q7_volume_shipping(spark, SF_SMOKE)
    # ship-date window reaches the lineitem scan
    filters = pushed_filters(df)
    assert any("l_shipdate" in f for f in filters), filters
    # both 25-row nation copies broadcast — no shuffle for the pair filter
    assert has_broadcast_join(df)


def test_q11_scalar_subquery_is_broadcast_not_collect(spark):
    from gresearch_parquet_benchmarking_spark.operators import tpch2
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    df = tpch2.q11_important_stock(spark, SF_SMOKE)
    plan = formatted_plan(df)
    # the global-total comparison must be a broadcast nested loop over a
    # 1-row relation, never a driver-side collect stitched into the plan
    assert "BroadcastNestedLoopJoin" in plan, plan[:2000]


def test_q16_anti_join_broadcast(spark):
    from gresearch_parquet_benchmarking_spark.operators import tpch2
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    df = tpch2.q16_supplier_part_count(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan and "Broadcast" in plan


def test_dedup_exact_no_pre_aggregation_exchange(spark):
    """Round-3 fix: the exact-dedup path must not round-robin-shuffle
    the corpus text before the md5 groupBy — the only exchanges are the
    groupBy's own hash partitioning and the final sort (VERDICT r2:
    the unconditional repartition tripled dedup_exact)."""
    from gresearch_parquet_benchmarking_spark.operators import dedup
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    df = dedup.dedup_exact(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "roundrobin" not in plan.lower(), "repartition leaked back into exact dedup"


def test_vocab_cooccurrence_broadcasts_vocab(spark):
    """The 12-row vocabulary must broadcast; the only shuffling join is
    the per-doc-bounded doc_id self-join."""
    from gresearch_parquet_benchmarking_spark.operators import pipeline2

    df = pipeline2.vocab_cooccurrence(spark, SF_SMOKE)
    assert has_broadcast_join(df)


def test_bigrams_stay_in_codegen(spark):
    """zip_with/slice bigram construction is pure Catalyst — no Python
    evaluator may appear in the plan."""
    from gresearch_parquet_benchmarking_spark.operators import pipeline2
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    df = pipeline2.text_bigram_counts(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_ivf_nprobe2_probe_side_broadcast_no_cartesian(spark):
    """The nprobe=2 candidate join must stay a broadcast equi-join on
    the bucket id: probes (10 queries × 2 buckets) broadcast, corpus
    never replicated, no cartesian product anywhere."""
    from gresearch_parquet_benchmarking_spark.plans.explain import simple_plan

    df = similarity.ann_ivf_topk_nprobe2(spark, SF_SMOKE)
    plan = simple_plan(df)
    assert has_broadcast_join(df)
    assert "CartesianProduct" not in plan, plan


def test_zorder_single_range_shuffle_no_python(spark):
    """The Z-order rewrite is one range shuffle over a codegen key
    expression: exactly one Exchange (rangepartitioning on the Morton
    key), no Python evaluator, no extra hash shuffle."""
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan, simple_plan
    from gresearch_parquet_benchmarking_spark.sources.layout import zorder_by

    li = load_table(spark, SF_SMOKE, "lineitem")
    df = zorder_by(li, ["l_shipdate", "l_partkey"])
    plan = simple_plan(df)
    fplan = formatted_plan(df)
    assert plan.count("Exchange rangepartitioning") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "BatchEvalPython" not in fplan and "ArrowEvalPython" not in fplan


def test_sequence_packing_text_never_shuffled(spark):
    """Tokenization must collapse to n_tok BEFORE any exchange —
    shipping document text through a shuffle is the 100 TB killer."""
    from gresearch_parquet_benchmarking_spark.operators import pipeline3
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    plan = formatted_plan(pipeline3.sequence_packing(spark, SF_SMOKE))
    # explain("formatted") puts operator details in footer blocks
    blocks = [b for b in plan.split("\n\n") if "Exchange" in b and "hashpartitioning(" in b]
    assert blocks, plan
    # the shuffled attributes are (doc_id, lang, rid, n_tok) — never `text`
    assert all("text#" not in b for b in blocks), blocks
    assert "Python" not in plan


def test_sequence_packing_prefix_sum_is_range_partitioned(spark):
    """The doc-level prefix-sum window must partition by (lang, rid),
    never by lang alone — a lang-only window puts an entire language's
    token stream in ONE task at 100 TB. The only lang-partitioned
    window allowed is the cumulative pass over the tiny per-range
    totals (which orders by rid, not doc_id)."""
    import re

    from gresearch_parquet_benchmarking_spark.operators import pipeline3
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    plan = formatted_plan(pipeline3.sequence_packing(spark, SF_SMOKE))
    # pass-2 window: partition spec includes rid before the doc_id sort
    assert re.search(r"windowspecdefinition\(lang#\d+, rid#\d+L?, doc_id#", plan), plan
    # no doc-level window partitioned by lang alone
    assert not re.search(r"windowspecdefinition\(lang#\d+, doc_id#", plan), plan


def test_abc_pareto_no_single_partition_window(spark):
    """orders_abc_pareto (r8, VERDICT r7 #6): the exact Pareto prefix
    sum must be the two-pass range-partitioned shape — the cumulative
    window partitions by rid (widest partition |parts|/ABC_RANGES) and
    NO stage collapses to a single partition; the per-range offsets
    enter as plan constants (bounded scalar probe), not a window."""
    import re

    from gresearch_parquet_benchmarking_spark.operators import analytics2
    from gresearch_parquet_benchmarking_spark.operators.registry import (
        release_persists,
    )
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    try:
        plan = formatted_plan(analytics2.orders_abc_pareto(spark, SF_SMOKE))
    finally:
        release_persists()
    assert "SinglePartition" not in plan, plan
    # the cumulative window partitions by rid, ordered by the rank key
    assert re.search(
        r"windowspecdefinition\(rid#\d+, rev#\d+ DESC", plan
    ), plan


def test_dedup_incremental_no_forced_broadcast(spark):
    """The corpus fingerprint index carries no broadcast HINT (CLAUDE.md
    rule 10): at sf it may broadcast by AQE size estimate, but the
    LOGICAL plan must leave the choice to the optimizer so the same
    code degrades to a shuffled join at 100 TB."""
    from gresearch_parquet_benchmarking_spark.operators import pipeline3

    df = pipeline3.dedup_incremental(spark, SF_SMOKE)
    logical = df._jdf.queryExecution().logical().toString()
    assert "hint" not in logical.lower(), logical


def test_kmeans_iterations_broadcast_centroids_no_python(spark):
    """Every Lloyd iteration broadcasts K centroids (never shuffles the
    corpus against them) and stays JVM-side."""
    from gresearch_parquet_benchmarking_spark.operators import similarity
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    plan = formatted_plan(similarity.kmeans_train(spark, SF_SMOKE))
    assert plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastExchange") >= similarity.KMEANS_ITERS
    assert "Python" not in plan
    assert "CartesianProduct" not in plan


def test_ivf_assignment_is_map_side(spark):
    """Nearest-centroid assignment must not shuffle the corpus: no
    exchange hash-partitions on vec_id (the old window-ranking shape);
    the centroid array arrives as a broadcast single-row nested-loop
    join. (Whether AQE additionally surfaces the shared broadcast as a
    ReusedExchange varies with session history — not pinned.)"""
    df = similarity.ann_ivf_topk(spark, SF_SMOKE)
    df.collect()  # finalize AQE
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(vec_id" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan


def test_semantic_dedup_assignment_is_map_side(spark):
    """Same contract for dedup_semantic: cluster assignment is in-row
    arithmetic against the broadcast centroid array; the only shuffles
    are the pair join's bucket key and the final election window."""
    df = similarity.dedup_semantic(spark, SF_SMOKE)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(vec_id" not in plan, plan


def test_attribution_single_user_exchange(spark):
    """Both carried-forward last-touch windows share one
    (user_id, ts_us, event_id) spec — the plan must hash-partition on
    user_id exactly once (window reuse), the funnel/sessionization
    single-exchange contract."""
    import re

    from gresearch_parquet_benchmarking_spark.operators import analytics
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    plan = formatted_plan(analytics.event_attribution_last_touch(spark, SF_SMOKE))
    # formatted mode puts "Exchange" and its arguments on separate lines
    assert len(re.findall(r"hashpartitioning\(user_id", plan)) == 1, plan
    assert "Python" not in plan


def test_pmi_text_never_shuffled(spark):
    """Bigrams and unigrams collapse to (token(s), count) BEFORE any
    exchange — document text crossing the wire is the 100 TB killer."""
    from gresearch_parquet_benchmarking_spark.operators import quality
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    plan = formatted_plan(quality.text_pmi_collocations(spark, SF_SMOKE))
    blocks = [b for b in plan.split("\n\n") if "Exchange" in b]
    assert blocks, plan
    assert all("text#" not in b for b in blocks), blocks
    assert "Python" not in plan


def test_covariance_expansion_aggregated_before_hash_exchange(spark):
    """The d(d+1)/2-per-row expansion must partial-aggregate map-side:
    no HASH exchange may carry the vector column (the only exchange
    allowed to ship vectors is the conditional round-robin spread of
    the raw scan)."""
    from gresearch_parquet_benchmarking_spark.operators import similarity
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    plan = formatted_plan(similarity.embedding_dim_covariance(spark, SF_SMOKE))
    blocks = [
        b for b in plan.split("\n\n") if "Exchange" in b and "hashpartitioning(" in b
    ]
    assert blocks, plan
    assert all("v#" not in b for b in blocks), blocks
    assert "Python" not in plan


def test_vectors_spread_repartitions_single_split_scan(spark):
    """The embeddings file is one input split at test scale, so
    _vectors_spread must inject a round-robin repartition ahead of
    per-row-heavy pipelines (and would be a no-op on a many-split
    corpus — the conditional is split-count-based, not unconditional)."""
    from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan

    plan = formatted_plan(similarity._vectors_spread(spark, SF_SMOKE))
    assert "roundrobin" in plan.lower(), plan
    # plain loader stays repartition-free (the dedup_exact lesson:
    # never round-robin text/vector payloads without downstream need)
    plain = formatted_plan(similarity._vectors(spark, SF_SMOKE))
    assert "roundrobin" not in plain.lower(), plain
