"""Empirical scale-shape gate for the flagship LLM-pipeline operators
(VERDICT r6 "Next round" #3): the banded/bucketed designs claim the
candidate work AND the shuffled bytes grow near-linearly with corpus
size — verified here by MEASUREMENT at sf0.01 vs sf0.1, not by plan
inspection. The probes (plans/scale_probes.py) compute candidate
cardinalities from the SAME intermediate relations the registered
queries build (shared helpers), and shuffle bytes come from the real
executed plans (persist build plans included).

Expected shapes (measured r7; BENCH.md "Scale shapes" table):

* dedup_minhash_lsh — band-bucket pairs ~1.4× super-linear (buckets
  densify mildly); shuffle linear.
* ann_ivf_pq_topk — probed-bucket candidates linear in corpus (the
  embeddings table grows 4× between these SFs); shuffle sub-linear.
* graph_triangle_count — oriented wedges ~1.03× linear in edges (the
  degree orientation's whole point); shuffle sub-linear.
* text_bm25_search — term-pruned postings linear in docs; shuffle
  sub-linear.
* dedup_containment_bottomk — (h1,h2) posting-pair join work ~1.1×
  linear (r8 rule; the r6 single-minimum rule measured 7.78×/1× —
  collision noise, fixed); shuffle ~linear.
* interval_overlap_users — candidate pair CHECKS are inherently
  quadratic in per-hour session density (the true co-activity output
  itself is), and these SFs grow density, not timespan. The banding
  claim is about movement, not checks: SHUFFLE stays linear (binned
  rows ship once; pair checks run in-task, salt-bounded per task).
"""

from __future__ import annotations

import pytest

from gresearch_parquet_benchmarking_spark.plans.scale_probes import measure

# both-SF end-to-end probes: the expensive tier (ADVICE r7) — runs by
# default, deselect with -m 'not slow' while iterating
pytestmark = pytest.mark.slow

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

# candidate-growth / rows-growth upper bounds (measured: 1.42, 1.02,
# 1.03, 1.01 — quadratic would be ~rows_growth, i.e. ~10)
CAND_SLACK = {
    "dedup_minhash_lsh": 3.0,
    "ann_ivf_pq_topk": 3.0,
    "graph_triangle_count": 3.0,
    "text_bm25_search": 3.0,
    # r8 rule (≥3 shared bottom-k minima via (h1,h2) posting pairs):
    # pair-join work measured 11.15× for 10× rows — the r6 rule's
    # collision-quadratic 77.8× is gone (BENCH.md r8)
    "dedup_containment_bottomk": 3.0,
    # two-level E-step (r9): work = N·(G + |cell|) ≈ N·2√k with k ∝ N
    # — measured 8.4× for 4× rows (the flat rule's N·k would be 17.7×
    # and FAIL this bound; the slack admits √-growth, not linear-in-k)
    "dedup_semantic": 3.0,
    # density-quadratic by nature (see module docstring + BENCH.md);
    # bounded at rows_growth² × slack below
    "interval_overlap_users": None,
    # (noun, p_size) blocks have ~fixed key cardinality on this
    # corpus, so occupancy — and the TRUE pair output — grows with
    # density: quadratic between these SFs, linear in timespan/
    # partition growth at production. Measured r7: 99.2× for 10× rows.
    "fuzzy_join_part_names": None,
    # r10 (VERDICT r9 #7): the two-pass rank helpers. "candidates" is
    # the driver-side offset-probe cardinality — a plan CONSTANT
    # (≤ ranges, resp. ≤ |groups|·ranges), so growth ≈ 1× while rows
    # grow 10×; the probes also return the claimed `bound`, asserted
    # exactly in test_rank_probe_cardinality_bounded below.
    "window_ntile_percent": 3.0,
    "events_inter_arrival_percentiles": 3.0,
    # r11 (VERDICT r10 #7): winnowing fingerprints select ≈ 2/(w+1) of
    # grams — linear in corpus tokens; the persist-boundary pin is the
    # dedicated test below.
    "text_winnowing_fingerprints": 3.0,
    # r11: two-pass prefix sum — candidates = the per-range totals
    # table (rows/RANGE_DOCS metadata), linear in corpus; the widest
    # local-window partition is bounded by RANGE_DOCS (test below).
    "sequence_packing": 3.0,
    # r11: gram occurrences explode to ~token-count rows exactly once —
    # linear in corpus tokens by construction.
    "dedup_substring_coverage": 3.0,
}
# shuffle-growth / rows-growth upper bound (measured: 0.4–1.04;
# containment's 1.04 includes the per-candidate verification payload,
# now linear under the r8 rule)
SHUFFLE_SLACK = 2.0
SHUFFLE_TRACKS_CANDIDATES: set[str] = set()


@pytest.mark.parametrize("name", list(CAND_SLACK))
def test_scale_shape_near_linear(spark, name):
    small = measure(spark, SF_SMALL, name)
    big = measure(spark, SF_BIG, name)
    rows_g = big["rows"] / max(small["rows"], 1)
    cand_g = big["candidates"] / max(small["candidates"], 1)
    shuf_g = big["shuffle_bytes"] / max(small["shuffle_bytes"], 1)
    assert rows_g > 2, f"{name}: SFs did not scale the input ({rows_g:.1f}x)"
    slack = CAND_SLACK[name]
    if slack is not None:
        assert cand_g <= slack * rows_g, (
            f"{name}: candidate work grew {cand_g:.1f}x for {rows_g:.1f}x rows "
            f"(bound {slack}x rows growth) — the bucketed claim is broken"
        )
    else:
        # inherently density-quadratic: candidates may track rows², but
        # never worse (worse would mean the binning replicates pairs)
        assert cand_g <= 1.5 * rows_g * rows_g, (
            f"{name}: candidates grew {cand_g:.1f}x — above the inherent "
            f"density-quadratic bound ({rows_g:.1f}x rows)"
        )
    if name in SHUFFLE_TRACKS_CANDIDATES:
        assert shuf_g <= 1.5 * cand_g, (
            f"{name}: shuffle grew {shuf_g:.1f}x vs candidates {cand_g:.1f}x — "
            f"shipping more than the verification payload"
        )
    else:
        assert shuf_g <= SHUFFLE_SLACK * rows_g, (
            f"{name}: shuffle bytes grew {shuf_g:.1f}x for {rows_g:.1f}x rows "
            f"(bound {SHUFFLE_SLACK}x rows growth) — data movement is no longer linear"
        )
    assert big["shuffle_bytes"] > 0, f"{name}: no shuffle metrics captured"


# ---------------------------------------------------------------------------
# Third scale point (r8, VERDICT r7 #5): the PRODUCTION growth axis.
# The sf0.01→sf0.1 pair grows density, so for the density-quadratic
# ops it can't separate "quadratic in density" from "quadratic, full
# stop". These fixtures grow the OTHER axis — 10× timespan at sf0.01's
# per-hour density (events), 10 disjoint-vocabulary domains at
# sf0.01's phrase density (documents) — along which the banded claims
# predict LINEAR candidate work. Measured r8: ratio 1.00 and 0.98
# (vs 9.99 and, pre-fix, 7.78 on the density pair).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name", ["stream_stream_join", "stream_funnel_buffered_ooo"]
)
def test_streaming_state_near_linear(spark, name):
    """Streaming state-growth probe (r12, VERDICT r11 #5): the 13 batch
    probes pin candidate/shuffle scaling, but stateful streaming has
    its own 100 TB liability — state-store rows. Peak Σ numRowsTotal
    (from recentProgress, captured by _run_to_table) must grow
    near-linearly with the input between SFs: watermark eviction keeps
    the join's 30-min interval state and the funnel's per-user buffers
    bounded by input density, never accumulating the whole stream."""
    from gresearch_parquet_benchmarking_spark.plans.scale_probes import (
        STATE_PROBES,
    )

    small = STATE_PROBES[name](spark, SF_SMALL)
    big = STATE_PROBES[name](spark, SF_BIG)
    rows_g = big["rows"] / max(small["rows"], 1)
    state_g = big["candidates"] / max(small["candidates"], 1)
    assert rows_g > 2, f"{name}: SFs did not scale the input ({rows_g:.1f}x)"
    assert small["candidates"] > 0 and big["candidates"] > 0, (
        f"{name}: no state metrics captured ({small} / {big})"
    )
    assert state_g <= 3.0 * rows_g, (
        f"{name}: peak state rows grew {state_g:.1f}x for {rows_g:.1f}x input "
        f"(bound 3x rows growth) — watermark eviction is not bounding state"
    )


@pytest.mark.parametrize(
    "name", ["window_ntile_percent", "events_inter_arrival_percentiles"]
)
def test_rank_probe_cardinality_bounded(spark, name):
    """The two-pass rank helpers' whole scale claim: the driver-side
    offset probe stays under its plan-constant cap (ranges, resp.
    |groups|·ranges) at BOTH SFs — the collected map never grows with
    the corpus."""
    from gresearch_parquet_benchmarking_spark.plans.scale_probes import PROBES

    for sf_dir in (SF_SMALL, SF_BIG):
        out = PROBES[name](spark, sf_dir)
        assert out["candidates"] <= out["bound"], (
            f"{name}@{sf_dir}: offset probe collected {out['candidates']} "
            f"rows, above the claimed plan-constant bound {out['bound']}"
        )


def test_sequence_packing_window_partition_bounded(spark):
    """The two-pass prefix sum's scale claim: the widest (lang, rid)
    local-window partition holds at most RANGE_DOCS rows at BOTH SFs —
    no language's token stream ever lands in one task."""
    from gresearch_parquet_benchmarking_spark.plans.scale_probes import PROBES

    for sf_dir in (SF_SMALL, SF_BIG):
        out = PROBES["sequence_packing"](spark, sf_dir)
        assert out["max_window_rows"] <= out["bound"], (
            f"sequence_packing@{sf_dir}: a (lang, rid) window partition "
            f"holds {out['max_window_rows']} rows, above RANGE_DOCS "
            f"{out['bound']} — the prefix-sum range contract is broken"
        )


def test_winnowing_md5_stays_behind_persist(spark):
    """The winnowing persist boundary is load-bearing: if a refactor
    (or a Catalyst change) re-inlines the md5-per-gram chain into the
    sliding-window slices, the executed plan shows md5 in a Project
    OUTSIDE the cached build — measured 56 s vs 0.6 s at sf0.01
    (CLAUDE.md projection-collapse lesson)."""
    from gresearch_parquet_benchmarking_spark.operators.registry import (
        all_queries,
        release_persists,
    )
    from gresearch_parquet_benchmarking_spark.plans.explain import (
        expr_nodes_outside_caches,
    )

    df = all_queries()["text_winnowing_fingerprints"](spark, SF_SMALL)
    df.collect()
    hits = expr_nodes_outside_caches(df, "md5(")
    release_persists()
    assert hits == [], (
        "md5-per-gram chain escaped the persist boundary into "
        f"{len(hits)} executed node(s): {hits[:2]}"
    )


def test_interval_overlap_candidates_linear_in_timespan(spark):
    from gresearch_parquet_benchmarking_spark.plans.scale_probes import PROBES
    from gresearch_parquet_benchmarking_spark.sources.datagen import (
        timespan_extended_events,
    )

    synth = timespan_extended_events(SF_SMALL, copies=10)
    small = PROBES["interval_overlap_users"](spark, SF_SMALL)
    big = PROBES["interval_overlap_users"](spark, synth)
    rows_g = big["rows"] / max(small["rows"], 1)
    cand_g = big["candidates"] / max(small["candidates"], 1)
    assert rows_g > 8, f"fixture did not extend the timespan ({rows_g:.1f}x)"
    assert cand_g <= 1.3 * rows_g, (
        f"per-bin pair checks grew {cand_g:.1f}x for {rows_g:.1f}x timespan — "
        f"candidate work is NOT linear along the production axis"
    )


def test_containment_candidates_linear_in_corpus_extension(spark):
    from gresearch_parquet_benchmarking_spark.plans.scale_probes import PROBES
    from gresearch_parquet_benchmarking_spark.sources.datagen import (
        vocab_sharded_documents,
    )

    synth = vocab_sharded_documents(SF_SMALL, shards=10)
    small = PROBES["dedup_containment_bottomk"](spark, SF_SMALL)
    big = PROBES["dedup_containment_bottomk"](spark, synth)
    rows_g = big["rows"] / max(small["rows"], 1)
    cand_g = big["candidates"] / max(small["candidates"], 1)
    assert rows_g > 8, f"fixture did not extend the corpus ({rows_g:.1f}x)"
    assert cand_g <= 1.3 * rows_g, (
        f"pair-join work grew {cand_g:.1f}x for {rows_g:.1f}x disjoint-domain "
        f"corpus growth — candidate work is NOT linear along the production axis"
    )


def test_fuzzy_join_candidates_linear_in_part_families(spark):
    from gresearch_parquet_benchmarking_spark.plans.scale_probes import PROBES
    from gresearch_parquet_benchmarking_spark.sources.datagen import (
        vocab_sharded_parts,
    )

    synth = vocab_sharded_parts(SF_SMALL, shards=10)
    small = PROBES["fuzzy_join_part_names"](spark, SF_SMALL)
    big = PROBES["fuzzy_join_part_names"](spark, synth)
    rows_g = big["rows"] / max(small["rows"], 1)
    cand_g = big["candidates"] / max(small["candidates"], 1)
    assert rows_g > 8, f"fixture did not extend the catalog ({rows_g:.1f}x)"
    assert cand_g <= 1.3 * rows_g, (
        f"block pairs grew {cand_g:.1f}x for {rows_g:.1f}x new-part-family "
        f"growth — candidate work is NOT linear along the production axis"
    )
