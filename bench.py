"""Per-round benchmark entry (driver contract).

Prints ONE JSON line: {"metric", "value" (total sec), "unit": "sec",
"queries": {name: sec}, "sf"}.

Two sections inside "queries":
* relational/LLM headline queries at $SPARK_GRAFT_SF_DIR (default
  /root/testdata/sf0.1) — median of 3 after 1 warmup;
* io_* micro-benchmarks re-measuring the reference's BASELINE.md
  sections 1/2/5/7 at the same (cols × rows) points: footer decode,
  stats decode, full/projection/single-column scans, codec
  encode/decode. Read-path fixtures are pyarrow-generated with the
  reference's file layout (bench/fixtures.py); write benchmarks use
  the engine's Spark writers. Fixtures cache under
  $ENGINE_BENCH_CACHE (default /tmp/engine_bench_cache) so later
  rounds skip generation.

BASELINE analog map (values in seconds here; BASELINE.md is ms):
  io_meta_{N}c          ↔ §1 footer decode+schema (pyarrow, same lib family)
  io_stats_{N}c         ↔ §5 stats decode (stats-on files)
  io_schema_full_{N}c   ↔ §3 full schema: thrift + build (pyarrow)
  io_schema_subset_{N}c ↔ §3 subset schema (max(10, N/10) cols)
  io_meta_100kr_{N}c    ↔ §2 metadata decode
  io_fullread_{N}c      ↔ §2 full table read (Spark noop sink)
  io_fullread_arrow_{N}c↔ §2 full table read (pyarrow — reference's own API)
  io_halfread_{N}c      ↔ §2 random half-columns read
  io_pageread_{N}c      ↔ §2 single-column read
  io_enc_{codec}_1000c  ↔ §7 encode (Spark write, 1000×10k)
  io_dec_{codec}_1000c  ↔ §7 decode (Spark full read)
"""

from __future__ import annotations

import json
import math
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gresearch_parquet_benchmarking_spark.bench.fixtures import ensure_wide_fixture  # noqa: E402
from gresearch_parquet_benchmarking_spark.operators.registry import (  # noqa: E402
    all_queries,
    release_persists,
)
from gresearch_parquet_benchmarking_spark.session import get_spark  # noqa: E402
from gresearch_parquet_benchmarking_spark.sources import io as eio  # noqa: E402
from gresearch_parquet_benchmarking_spark.sources.datagen import wide_table  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "window_running_total",
    "topk_per_group",
    "agg_rollup",
    "text_term_frequency",
    "text_quality_score",
    "text_bigram_counts",
    "unigram_logprob_score",
    "dedup_exact",
    "dedup_minhash_lsh",
    "ann_topk_bruteforce",
    "ann_ivf_topk",
    "ann_ivf_topk_nprobe2",
    "sessionization",
    "asof_join_purchase_click",
    "stream_stream_join",
    "sequence_packing",
    "dedup_incremental",
    "kmeans_train",
    "dedup_semantic",
    "layout_bucketed_join",
    "event_funnel_conversion",
    "cohort_retention",
    "interval_overlap_users",
    # r6: promoted from the full-only tier (VERDICT r5 #7) — the two
    # most expensive r5 operators now get driver-visible history.
    # Adds ~4 s to the headline total vs r5; noted in BENCH.md.
    "ann_ivf_pq_topk",
    "stream_funnel_stateful",
]

# Measured like HEADLINE (floors, history, bench_full.json) but kept
# OUT of the printed compact line — the driver tail capture is ~2000
# bytes and the headline set already fills it (COMPACT_IO_KEYS note).
FULL_ONLY_QUERIES = [
    "dedup_minhash_calibration",
    "embedding_dim_covariance",
    "curriculum_buckets_approx",
    "text_pmi_collocations",
    "event_attribution_last_touch",
    "text_winnowing_fingerprints",
    "quality_vs_dup_lift",
    "ann_pq_codebook",
    "embedding_pca_power_iteration",
    # r6 additions (local-gate ops measured for history; the
    # stream_funnel_buffered_ooo harness stages+replays files and is
    # correctness surface, not a perf row — deliberately absent)
    "quality_gopher_rules",
    "text_novelty_coverage",
    "mixture_temperature_sampling",
    "ann_mmr_diversified_topk",
    "layout_partition_pruned_scan",
    "events_markov_transitions",
    "text_zipf_fit",
    "events_scd2_intervals",
    "graph_pagerank_bipartite",
    "ann_range_search",
    "graph_degree_distribution",
    "orders_seasonality_trailing",
    "basket_part_affinity",
    "supplier_concentration_hhi",
    "stream_user_latest_state",
    # r6 late additions (retrieval/linkage/graph/DQ surface)
    "text_bm25_search",
    "fuzzy_join_part_names",
    "graph_triangle_count",
    "events_rfm_scores",
    "embedding_matryoshka_recall",
    "ann_hard_negative_mining",
    "dq_constraint_suite",
    "stream_topk_trending",
    "ann_knn_classifier_eval",
    "events_power_user_concentration",
    "event_funnel_latency",
    "events_daily_anomaly_mad",
    "drift_ks_doc_length",
    "drift_psi_doc_length",
    "dedup_containment_bottomk",
    # r9 addition: audit row for the two-level E-step graduation
    "dedup_semantic_agreement",
    "stream_psi_value_drift",
    "graph_kcore_bounded",
    "quality_filter_ablation",
    "events_top_paths",
    # analytics2 pack (warehouse patterns round 2)
    "customer_order_streaks",
    "orders_date_spine_fill",
    "sample_weighted_aes",
    "integrity_partition_checksums",
    "orders_ewma_forecast",
    "snapshot_diff_orders",
    # fusion / tokenizer / streaming-audit additions
    "ann_rrf_fusion",
    "bpe_top_merges",
    "stream_integrity_checksum",
    "lineitem_weighted_median_price",
    "orders_abc_pareto",
    "drift_embedding_centroid",
    "events_freshness_lag",
    "retrieval_ndcg_bm25",
    "tokenizer_vocab_coverage",
    "dedup_substring_coverage",
    "orders_cohort_ltv",
    "events_inter_arrival_percentiles",
    "supplier_otd_scorecard",
    "drift_token_jsd",
    "graph_brand_modularity",
    "sketch_kmv_setops",
    "events_peak_concurrency",
    "events_value_twap_daily",
    "dq_benford_order_prices",
    "skew_key_histogram",
    "event_attribution_linear",
    "embedding_int8_quant_error",
    "graph_link_prediction_ra",
    "sketch_quantile_histogram",
    "dedup_multimodal_phash",
    "events_stickiness_dau_wau",
    "events_bot_screen",
    "ann_binary_hamming_recall",
    "events_ab_uplift_ztest",
]

# Prefixes of io evidence rows that, like FULL_ONLY_QUERIES, are
# measured + recorded but excluded from the headline total (they are
# layout-evidence diagnostics, not comparable workload rows — the
# 1-row-group pageread row would otherwise silently inflate the
# round-over-round metric; ADVICE r5 #2).
FULL_ONLY_PREFIXES = (
    "io_pageread_task_1rg_",
    "io_schemaplan_",
    "io_pointlookup_",
    # r10: JVM-free host-class twin for the widest scan — evidence row,
    # not a workload row; excluding it keeps `value` comparable across
    # rounds
    "io_fullread_arrow_10000c",
)

# io/scale rows the printed one-liner retains (the BASELINE.md
# comparison grid); everything else still lands in
# bench_results/bench_full.json. See the tail-capture note in main().
COMPACT_IO_KEYS = [
    "io_meta_10000c", "io_stats_10000c", "io_stats_off_10000c",
    "io_meta_100kr_1000c",
    "io_fullread_10c", "io_fullread_task_10c",
    "io_fullread_1000c", "io_fullread_arrow_1000c", "io_fullread_10000c",
    "io_fullread_arrow_10000c",
    "io_halfread_1000c", "io_halfread_arrow_1000c",
    "io_pageread_1000c", "io_pageread_arrow_1000c", "io_pageread_task_1000c",
    "io_enc_none_1000c", "io_enc_snappy_1000c", "io_enc_gzip_1000c",
    "io_enc_zstd_1000c", "io_enc_brotli_1000c", "io_enc_brotli_1000c_spark",
    "io_dec_none_1000c", "io_dec_snappy_1000c", "io_dec_gzip_1000c",
    "io_dec_zstd_1000c", "io_dec_brotli_1000c", "io_dec_brotli_1000c_spark",
    "skew_join_lineitem", "skew_join_uniform",
    "join_bucketed_colocated", "join_shuffle_baseline",
    "layout_zorder_lineitem", "layout_compact_lineitem",
]
# The tail of COMPACT_IO_KEYS that is engine diagnostics rather than a
# BASELINE.md §1/§2/§5/§7 comparable. The compact-line trimmer (main())
# evicts these first, then suspect NAMES, and only then a BASELINE
# comparable — so a contended day's long contention_suspects list can
# never again blind the driver to the io grid (VERDICT r12 #2: 35
# suspect names evicted all 28 io keys from the driver-visible JSON).
COMPACT_IO_DIAG_KEYS = COMPACT_IO_KEYS[-6:]
# Names shown in the compact line even on a clean day; the full sorted
# list always lands in the full artifact, and suspects_n carries the
# true count regardless of trimming.
SUSPECTS_COMPACT_MAX = 8


def _sig4(v: float) -> float:
    """Round a seconds value to 4 significant digits (but never wider
    than round(.,4)) — the compact line's last-resort width compressor
    before a BASELINE io comparable would have to spill."""
    if v >= 1:
        return round(v, max(0, 4 - len(str(int(v)))))
    return round(v, 4)
TAIL_BUDGET = 1900  # driver tail capture is ~2000 bytes (BENCH_r0*.json)

TRIALS = 3
WARMUPS = 1
META_COLS = (10, 100, 1000, 10000)   # BASELINE §1/§5
READ_COLS = (10, 100, 1000)          # BASELINE §2
READ_ROWS = 100_000
CODECS = ("none", "snappy", "gzip", "zstd")  # parquet-mr codecs; brotli runs through the Arrow-codec sink below

# --- contention robustness (round-3, VERDICT r2 "What's wrong" #3) --------
# The r2 driver bench ran on a contended host: even unchanged pure-pyarrow
# entries recorded 57-170x their r1 values. Three defenses, none of which
# ever substitutes a historical number for a fresh measurement:
#   1. adaptive best-of: if max/min spread across trials exceeds
#      SPREAD_LIMIT, a noisy neighbor hit part of the window — extend it
#      (up to EXTRA_TRIALS more) so at least one trial lands clean;
#   2. history-triggered re-measure: per-entry best-ever values persist
#      under $ENGINE_BENCH_CACHE; a fresh value >3x the entry's recorded
#      best re-runs that entry once before being accepted;
#   3. the JSON line carries contention_suspects — how many entries
#      STAYED >3x their historical best after re-measure — so a
#      contaminated artifact is visibly flagged instead of silently wrong.
SPREAD_LIMIT = 3.0
EXTRA_TRIALS = 4
SUSPECT_RATIO = 3.0

CACHE_DIR = os.environ.get("ENGINE_BENCH_CACHE", "/tmp/engine_bench_cache")
HISTORY_PATH = os.path.join(CACHE_DIR, "bench_history.json")
HISTORY: dict[str, float] = {}
SUSPECTS: list[str] = []
# Fresh-value / best-ever-floor ratios collected by measured() for every
# entry with a usable floor. Their MEDIAN is emitted as drift_vs_floor:
# the r5 driver artifact carried a uniform ~1.2x tax across the query
# block — real host/JVM state, but invisible to the 3x contention
# detector and only diagnosed a round later by A/B reruns. A global
# sub-3x drift indicator makes that state legible in the artifact
# itself (healthy quiet host: ~1.0-1.2; cold/contended: 1.3+).
DRIFT_RATIOS: list[float] = []
DRIFT_MIN_FLOOR = 0.02  # ignore sub-20ms floors: timer noise dominates
# Wall-clock offset (s since run start) at which each entry finished
# measuring — full-artifact only. The r10 host proved it can shift
# speed MID-RUN (two fast host_index endpoints bracketing a 1.44-drift
# run); a per-key timeline makes that visible as drift-vs-offset
# correlation instead of another round of narrative adjudication.
RUN_T0: float | None = None
AT: dict[str, float] = {}


SEED_HISTORY_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "bench_results", "bench_history_seed.json"
)


def _load_history() -> None:
    # Committed seed first (quiet-machine best-evers from the round the
    # seed was recorded), then the local cache overrides with anything
    # better seen on THIS host — so even a cold-cache driver run gets
    # re-measure protection against a contended host.
    for path in (SEED_HISTORY_PATH, HISTORY_PATH):
        try:
            with open(path) as f:
                for k, v in json.load(f).items():
                    v = float(v)
                    if k not in HISTORY or v < HISTORY[k]:
                        HISTORY[k] = v
        except (OSError, ValueError):
            pass


def _save_history() -> None:
    try:
        os.makedirs(CACHE_DIR, exist_ok=True)
        with open(HISTORY_PATH, "w") as f:
            json.dump(HISTORY, f, indent=0, sort_keys=True)
    except OSError:
        pass


_SAT_LOOP_CODE = (
    "import time\n"
    "t0 = time.perf_counter()\n"
    "x = 0\n"
    "for i in range(5_000_000):\n"
    "    x += i\n"
    "print(time.perf_counter() - t0)\n"
)


def _max_ignoring_nan(batches: list[float]) -> float | None:
    """Max of the batch medians, skipping NaN (a batch whose probes all
    died) — bare max() propagates NaN, which would poison the index and
    serialize as non-JSON ``NaN`` in the compact line, defeating the
    don't-lose-a-completed-run goal (ADVICE r11). All batches dead →
    None (json null)."""
    vals = [v for v in batches if not math.isnan(v)]
    return round(max(vals), 3) if vals else None


def _saturated_loop_median(width: int) -> float:
    """Median per-process time of ``width`` concurrent interpreter
    loops, each in its own bare ``python -c`` subprocess (no heavy
    imports, no fork-with-threads hazards). This is the load shape a
    32-thread local Spark stage puts on the box — which the single-core
    ``py`` index cannot see: the r10 host measured py=0.19-0.23
    (fast) across three whole runs while the 32-wide per-core
    throughput sat 1.39-1.49x BELOW single-core, matching the runs'
    1.32-1.44 drift_vs_floor almost exactly. drift ≈ py_sat/py means
    host tax, numerically, with no A/B reruns."""
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SAT_LOOP_CODE],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(width)
    ]
    vals = []
    for p in procs:
        out, _ = p.communicate()
        # a probe subprocess can die under the very pressure it
        # measures (OOM/signal) — skip it rather than abort the run
        # (at the host_end call site that would lose a COMPLETED run)
        if p.returncode != 0:
            continue
        try:
            vals.append(float(out))
        except (TypeError, ValueError):
            continue
    return statistics.median(vals) if vals else float("nan")


def host_index() -> dict[str, float]:
    """Pure-Python/numpy host-speed micro-index, recorded in every
    artifact so cross-round deltas can be normalized by HOST CLASS as
    a number instead of a narrative (r9 and r10 both measured a
    uniform ~1.5× drift_vs_floor with EMPTY suspects — the slow-host
    signature — but had nothing quantitative to compare hosts with).
    Components (each min-of-3, JVM-free, run BEFORE Spark starts):

      py     — single-core interpreter loop (clock + IPC; 0.4-0.6 s on
               a fast core, ~1.6 s on the r10 host)
      py_sat — the SAME loop run 32-wide (all cores saturated, the
               Spark-stage load shape); py_sat/py is the saturation
               tax single-core probes cannot see — it matched the
               r10 runs' 1.32-1.44 drift_vs_floor while py read fast
      mm     — numpy 1200² matmul (SIMD + memory bandwidth)
      io     — cached re-read of a 64 MB scratch file (page-cache/VFS)

    Read a round's ratios vs another round's as the host-class factor;
    queries drifting uniformly by ≈ that factor are host tax, not
    regressions."""
    import numpy as np

    def _loop() -> float:
        t0 = time.perf_counter()
        x = 0
        for i in range(5_000_000):
            x += i
        return time.perf_counter() - t0

    a = np.random.default_rng(0).random((1200, 1200))

    def _mm() -> float:
        t0 = time.perf_counter()
        _ = a @ a
        return time.perf_counter() - t0

    os.makedirs(CACHE_DIR, exist_ok=True)
    p = os.path.join(CACHE_DIR, "host_io_scratch.bin")
    if not os.path.exists(p) or os.path.getsize(p) != (64 << 20):
        with open(p, "wb") as f:
            f.write(os.urandom(64 << 20))

    def _read() -> float:
        t0 = time.perf_counter()
        with open(p, "rb") as f:
            while f.read(1 << 20):
                pass
        return time.perf_counter() - t0

    _mm(), _read()  # warm BLAS threads + page cache
    width = min(32, os.cpu_count() or 1)
    return {
        "py": round(min(_loop() for _ in range(3)), 3),
        # saturated (all-core) per-loop median: the Spark-stage load
        # shape; py_sat/py is the per-run saturation tax. max of the
        # two batches — BENCH.md reads py_sat/py as the run's pressure
        # UPPER bound, and min would bias the tax estimate low when
        # pressure fluctuates between batches (ADVICE r10).
        "py_sat": _max_ignoring_nan(
            [_saturated_loop_median(width) for _ in range(2)]
        ),
        "mm": round(min(_mm() for _ in range(3)), 3),
        "io": round(min(_read() for _ in range(3)), 3),
    }


def med(fn, trials=TRIALS, warmups=WARMUPS) -> float:
    for _ in range(warmups):
        fn()
    return statistics.median(fn() for _ in range(trials))


def _window_disturbed(vals: list[float], base: int) -> bool:
    """Spread check over the ``base`` SMALLEST trials only: once enough
    clean trials dominate, a contaminated outlier kept in ``vals`` can
    no longer force the window to keep extending. Sub-resolution
    timings (spread below 0.1 ms) are clean by definition — a raw 0
    from a sub-µs thunk must not read as infinite spread."""
    k = sorted(vals)[:base]
    if k[-1] - k[0] < 1e-4:
        return False
    return k[-1] / max(k[0], 1e-9) > SPREAD_LIMIT


def best(fn, trials=TRIALS, warmups=WARMUPS) -> float:
    """Adaptive best-of-N for micro-benchmarks: the reference's numbers
    are single quiet-machine runs; min filters shared-JVM noise (GC,
    page-cache state) the same way. When the trial spread exceeds
    SPREAD_LIMIT the window was disturbed — extend it (until the
    ``trials`` cleanest measurements agree, or EXTRA_TRIALS runs out)."""
    for _ in range(warmups):
        fn()
    vals = [fn() for _ in range(trials)]
    extra = 0
    while _window_disturbed(vals, trials) and extra < EXTRA_TRIALS:
        vals.append(fn())
        extra += 1
    return min(vals)


def measured(
    out: dict, name: str, thunk, trials=TRIALS, warmups=WARMUPS, nd=4, stat=None,
    hkey: str | None = None,
) -> None:
    """Record stat(thunk) (default :func:`best`) under ``name`` with
    history-triggered re-measurement: a value >SUSPECT_RATIO x this
    entry's best-ever is re-run once (fresh measurement, never a
    substituted number); if it stays high it is recorded as measured
    AND flagged in SUSPECTS. Pass ``stat=med`` for the query section's
    median protocol — queries get the same contention protection as the
    io micro-benches (a bench run concurrent with any other Spark job
    would otherwise publish silently inflated query times)."""
    stat = stat or best
    hkey = hkey or name
    val = stat(thunk, trials=trials, warmups=warmups)
    ref = HISTORY.get(hkey)
    if ref is not None and ref >= DRIFT_MIN_FLOOR:
        DRIFT_RATIOS.append(val / ref)
    if ref is not None and val > SUSPECT_RATIO * ref:
        val = min(val, stat(thunk, trials=trials, warmups=0))
        if val > SUSPECT_RATIO * ref:
            SUSPECTS.append(name)
    HISTORY[hkey] = min(val, ref) if ref is not None else val
    out[name] = round(val, nd)
    if RUN_T0 is not None:
        AT[name] = round(time.perf_counter() - RUN_T0, 1)


def _task_or_wall(spark, thunk) -> float:
    """Executor task time of the stages ``thunk`` launched; falls back
    to wall time (the honest upper bound) if the UI REST probe is
    unavailable."""
    wall, task = eio.timed_with_task_time(spark, thunk)
    return task if task is not None else wall


def _run_query_once(fn, spark, sf_dir: str) -> float:
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _sf_hist_suffix(sf_dir: str) -> str:
    """History floors for query/scale entries are sf-dependent; only the
    default sf0.1 uses the bare (seeded) keys, so a local run at another
    SF can never poison the floors the driver's sf0.1 run checks
    against."""
    tag = os.path.basename(sf_dir.rstrip("/"))
    return "" if tag == "sf0.1" else f"@{tag}"


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    queries = all_queries()
    out: dict[str, float] = {}
    sfx = _sf_hist_suffix(sf_dir)
    names = HEADLINE + FULL_ONLY_QUERIES
    # Whole-suite warm circuit (VERDICT r10 #3): the per-key warmup is
    # MOVED to a single untimed pass over every query BEFORE any trial
    # — same 4 executions per key (1 warm + 3 trials), zero added wall
    # time, but by the time ANY key is timed the JVM has JIT-compiled
    # and codegen'd the whole suite and the page cache holds every
    # input. The r10 five-run sequence showed in-session warm state
    # dominates totals (63→45 s same-code); a first driver-triggered
    # run previously timed its early keys on a cold JVM.
    # ENGINE_BENCH_WARM_CIRCUIT=0 restores the old per-key-warmup
    # ordering for A/B.
    warm_circuit = os.environ.get("ENGINE_BENCH_WARM_CIRCUIT") != "0"
    if warm_circuit:
        for name in names:
            try:
                _run_query_once(queries[name], spark, sf_dir)
            finally:
                release_persists()
    for name in names:
        fn = queries[name]
        measured(
            out, name, lambda: _run_query_once(fn, spark, sf_dir), stat=med,
            warmups=0 if warm_circuit else WARMUPS,
            hkey=name + sfx,
        )
        release_persists()  # drop per-query tracked caches between entries
    return out


def bench_io(spark) -> dict[str, float]:
    import pyarrow.parquet as pq

    # drop query-section cached data: scan benchmarks must not compete
    # with persisted RDDs for executor memory
    spark.catalog.clearCache()
    out: dict[str, float] = {}

    # §1 + §5: footer/schema/stats decode vs width (1 row group, 10k
    # rows), with and without statistics (BASELINE §5 off→on pairs)
    for n in META_COLS:
        path = ensure_wide_fixture(n, 10_000)
        # the 10k-col footer ops run ~20-200 ms and swing ~3x with VM
        # cache/frequency state run-to-run; they sit closest to the 2x
        # gate (BASELINE §1/§3/§5), so give them a deep best-of window
        mt, mw = (11, 2) if n >= 10_000 else (TRIALS, WARMUPS)
        measured(out, f"io_meta_{n}c", lambda: eio.read_metadata_timed(path).total_s,
                 trials=mt, warmups=mw, nd=6)
        # stats timing re-opens the file inside the window, matching the
        # reference's BenchmarkStats measurement (metadata_benchmark.cc:44-79)
        measured(out, f"io_stats_{n}c", lambda: eio.read_stats_timed(path),
                 trials=mt, warmups=mw, nd=6)
        nostats = ensure_wide_fixture(n, 10_000, stats=False)
        measured(out, f"io_stats_off_{n}c", lambda: eio.read_stats_timed(nostats),
                 trials=mt, warmups=mw, nd=6)
        # §3: full vs subset schema build split (pyarrow, the
        # reference's own §3 measurement path)
        if n >= 100:
            measured(out, f"io_schema_full_{n}c",
                     lambda: eio.subset_schema_timed(path)["full_total_s"],
                     trials=mt, warmups=mw, nd=6)
            measured(out, f"io_schema_subset_{n}c",
                     lambda: eio.subset_schema_timed(path)["subset_total_s"],
                     trials=mt, warmups=mw, nd=6)

    # §2: read ops at 100k rows. Fixture layout matches the reference's
    # files (10k-row groups, data_generator.cc:35) — splittable scans;
    # 32 MB split size so a ~400 MB file parallelizes across local
    # cores (at 100 TB the 128 MB default is right; this is per-bench
    # scan tuning, restored after).
    prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
    try:
        spark.sparkContext._jvm.System.gc()  # quiet heap before scan timings
        for n in READ_COLS:
            path = ensure_wide_fixture(n, READ_ROWS, row_group_rows=10_000)
            half = eio.random_half_columns(spark, path)
            first = spark.read.parquet(path).columns[0]
            # extra trials on the heavy scans: a single GC pause can
            # span all of a 3-trial window, and io_halfread_1000c is
            # the least-headroom entry vs BASELINE (BENCH.md) — best-of-7
            scan_trials = 7 if n >= 1000 else TRIALS
            measured(out, f"io_meta_100kr_{n}c",
                     lambda: eio.read_metadata_timed(path).total_s, nd=6)
            measured(out, f"io_fullread_{n}c",
                     lambda: eio.read_full_timed(spark, path), trials=scan_trials, warmups=2)
            measured(out, f"io_fullread_arrow_{n}c", lambda: _arrow_read(pq, path))
            measured(out, f"io_halfread_{n}c",
                     lambda: eio.read_columns_timed(spark, path, half),
                     trials=scan_trials, warmups=2)
            measured(out, f"io_halfread_arrow_{n}c", lambda: _arrow_read(pq, path, half))
            measured(out, f"io_pageread_{n}c",
                     lambda: eio.read_single_column_timed(spark, path, first))
            measured(out, f"io_pageread_arrow_{n}c", lambda: _arrow_read(pq, path, [first]))
            # floor-honest companion (VERDICT r3 #3): ONE task (splits
            # disabled for the probe) and executor task time only —
            # wall minus the fixed per-job driver cost that dominates
            # these small-file rows and amortizes away at scale. The
            # single task makes the number directly comparable to the
            # reference's single-threaded read
            # (data_read_benchmark.cc:81-97); what remains above the
            # arrow twin is parquet-mr's in-task work (its per-task
            # footer decode grows with table width).
            def _single_split_task(thunk):
                # minPartitionNum=1 is load-bearing: without it,
                # maxSplitBytes is capped at totalBytes/parallelism and
                # the "single task" probe actually ran 32 tasks, summing
                # 32 redundant footer decodes (see make_report.py twin)
                spark.conf.set("spark.sql.files.maxPartitionBytes", str(8 << 30))
                spark.conf.set("spark.sql.files.minPartitionNum", "1")
                try:
                    return _task_or_wall(spark, thunk)
                finally:
                    spark.conf.unset("spark.sql.files.minPartitionNum")
                    spark.conf.set(
                        "spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024)
                    )

            measured(
                out, f"io_pageread_task_{n}c",
                lambda: _single_split_task(
                    lambda: eio.read_single_column_timed(spark, path, first)
                ),
            )
            if n >= 1000:
                # Layout-variant twin (full-detail JSON only): same data
                # in ONE 100k-row group. The reference fixture's 10
                # row groups make parquet-mr decode 10x the chunk
                # metadata and re-init the column reader per group —
                # this row isolates that per-row-group cost from the
                # engine's actual column-read cost (REPORT.md §2 note).
                path_1rg = ensure_wide_fixture(n, READ_ROWS, row_group_rows=READ_ROWS)
                measured(
                    out, f"io_pageread_task_1rg_{n}c",
                    lambda: _single_split_task(
                        lambda: eio.read_single_column_timed(spark, path_1rg, first)
                    ),
                )
            if n == 10:
                measured(
                    out, "io_fullread_task_10c",
                    lambda: _single_split_task(
                        lambda: eio.read_full_timed(spark, path)
                    ),
                )
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)

    # §7: codec encode/decode at 1000 cols × 10k rows. Spark-native
    # parallel write (one file per task) — the engine's honest write
    # path; the reference's single-file single-thread write is an
    # artifact of its one-process design.
    df = wide_table(spark, 1000, 10_000, n_partitions=16).persist()
    df.count()
    # two passes: all encodes, then all decodes — interleaving them
    # leaves write-churn (page cache, GC) inside the decode timings
    for codec in CODECS:
        path = f"/tmp/engine_bench_write_{codec}"
        measured(
            out, f"io_enc_{codec}_1000c",
            lambda codec=codec, path=path: eio.write_parquet(
                df, path, codec=codec, single_file=False
            ).write_time_s,
        )
    df.unpersist()
    spark.catalog.clearCache()
    for codec in CODECS:
        path = f"/tmp/engine_bench_write_{codec}"
        # io_dec_none_1000c shares io_halfread's low BASELINE headroom —
        # best-of-7 there too (BENCH.md variance note)
        dec_trials = 7 if codec == "none" else TRIALS
        measured(out, f"io_dec_{codec}_1000c",
                 lambda path=path: eio.read_full_timed(spark, path),
                 trials=dec_trials, warmups=2)

    # §7 brotli row (BASELINE §7 row 4): parquet-mr has no brotli codec
    # class in this environment, so df.write/df.read can't carry it.
    # Two measurements instead:
    #  * io_enc/dec_brotli_1000c — single-file pyarrow twin (the
    #    reference's own Arrow C++ writer/reader family,
    #    compression_benchmark.cc:52-64) — directly comparable numbers.
    #  * io_enc/dec_brotli_1000c_spark — the engine's DISTRIBUTED
    #    brotli path: executor-side pyarrow encoders/decoders inside
    #    mapInArrow (sources/io.py write_parquet_arrow_codec), one file
    #    per task / one task per file — the path a user actually runs
    #    on a cluster.
    import pyarrow as pa

    if pa.Codec.is_available("brotli"):
        src = ensure_wide_fixture(1000, 10_000, codec="none")
        table = pq.read_table(src)
        bpath = "/tmp/engine_bench_write_brotli.parquet"
        measured(out, "io_enc_brotli_1000c",
                 lambda: eio.arrow_write_timed(table, bpath, "brotli"))
        del table
        measured(out, "io_dec_brotli_1000c", lambda: _arrow_read(pq, bpath))

        bdf = wide_table(spark, 1000, 10_000, n_partitions=16).persist()
        bdf.count()
        bspark_path = "/tmp/engine_bench_write_brotli_spark"
        measured(
            out, "io_enc_brotli_1000c_spark",
            lambda: eio.write_parquet_arrow_codec(
                bdf, bspark_path, codec="brotli"
            ).write_time_s,
        )
        bdf.unpersist()
        spark.catalog.clearCache()
        measured(out, "io_dec_brotli_1000c_spark",
                 lambda: eio.read_arrow_codec_timed(spark, bspark_path))

    # Schema-evolution planning cost (sources/formats.py
    # read_merged_schema): mergeSchema reads EVERY footer at plan time
    # (a distributed footer-merge job), a pinned schema reads none —
    # the pair quantifies why evolving 100 TB datasets pin the merged
    # schema in a catalog. io_schemaplan_ prefix keeps both rows out
    # of the headline total (FULL_ONLY_PREFIXES).
    from gresearch_parquet_benchmarking_spark.bench.fixtures import (
        ensure_evolving_fixture,
    )

    evo = ensure_evolving_fixture(200)
    pinned = spark.read.option("mergeSchema", "true").parquet(evo).schema

    def _plan_merged() -> float:
        t0 = time.perf_counter()
        spark.read.option("mergeSchema", "true").parquet(evo).schema
        return time.perf_counter() - t0

    def _plan_pinned() -> float:
        t0 = time.perf_counter()
        spark.read.schema(pinned).parquet(evo).schema
        return time.perf_counter() - t0

    measured(out, "io_schemaplan_merge_200f", _plan_merged)
    measured(out, "io_schemaplan_pinned_200f", _plan_pinned)

    # Bloom-filter point lookup A/B (sources/io.py bloom rationale):
    # an absent in-range probe on an unsorted high-cardinality key.
    # With blooms every row group is skipped (the scan emits 0 rows);
    # without, the full column decodes — the needle-in-haystack
    # capability a 100 TB lookup lives on. io_pointlookup_ prefix
    # keeps the pair out of the headline total (evidence rows).
    from gresearch_parquet_benchmarking_spark.bench.fixtures import (
        ensure_bloom_fixture,
    )

    bloom_fx = ensure_bloom_fixture(spark)
    absent = (
        spark.read.parquet(bloom_fx).select("k").limit(1).collect()[0][0] + 1
    )
    measured(
        out, "io_pointlookup_bloom_2mr",
        lambda: eio.point_lookup_timed(spark, bloom_fx, "k", absent, True)[0],
    )
    measured(
        out, "io_pointlookup_nobloom_2mr",
        lambda: eio.point_lookup_timed(spark, bloom_fx, "k", absent, False)[0],
    )
    return out


def bench_scale(spark, sf_dir: str) -> dict[str, float]:
    """Scale-stress section (VERDICT r1 next-round #9): exercises the
    machinery a 100 TB run depends on but the uniform sf0.1 section
    never triggers.

    * skew_join_lineitem — lineitem with 30% of rows salted onto ONE
      hot orderkey, joined to orders under lowered AQE skew thresholds
      (the local-scale analog of a hot-key shuffle at 100 TB; AQE must
      split the skewed partition, not stall one reducer).
    * skew_join_uniform — the same join without the hot key, same
      confs: the comparator that makes the skew number interpretable.
    * io_fullread_10000c — the 10k-col wide scan with the wide-schema
      layout + reader tuning: 1000-row row groups (~40 MB each) so the
      scan parallelizes across tasks instead of one task decoding a
      400 MB row group, and 1024-row columnar batches (4096-row default
      batches on 10k columns allocate ~160 MB per task per batch and
      thrash GC).
    """
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    out: dict[str, float] = {}
    sfx = _sf_hist_suffix(sf_dir)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("jk"), "o_custkey"
    )
    skew_confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the SMJ path
    }
    prev = {k: spark.conf.get(k) for k in skew_confs}
    for k, v in skew_confs.items():
        spark.conf.set(k, v)
    try:
        skewed = li.withColumn(
            "jk", F.when(F.rand(7) < 0.3, F.lit(1)).otherwise(F.col("l_orderkey"))
        )
        measured(out, "skew_join_lineitem",
                 lambda: _noop_time(skewed.join(orders, "jk")), stat=med,
                 hkey="skew_join_lineitem" + sfx)
        uniform = li.withColumn("jk", F.col("l_orderkey"))
        measured(out, "skew_join_uniform",
                 lambda: _noop_time(uniform.join(orders, "jk")), stat=med,
                 hkey="skew_join_uniform" + sfx)
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)

    # Bucketed co-location vs shuffle join (sources/bucketing.py): the
    # same orders⋈lineitem with both sides pre-bucketed on the join key
    # (Exchange-free SMJ, pinned by tests/test_bucketing.py) against the
    # raw-parquet shuffle baseline. The one-time bucketed write is a
    # fixture, outside the timing.
    from gresearch_parquet_benchmarking_spark.sources.bucketing import (
        bucketed_orders_lineitem_join,
        plain_orders_lineitem_join,
    )

    prev_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bucketed_orders_lineitem_join(spark, sf_dir).collect()  # fixture write + warm
        measured(out, "join_bucketed_colocated",
                 lambda: _noop_time(bucketed_orders_lineitem_join(spark, sf_dir)),
                 stat=med, hkey="join_bucketed_colocated" + sfx)
        measured(out, "join_shuffle_baseline",
                 lambda: _noop_time(plain_orders_lineitem_join(spark, sf_dir)),
                 stat=med, hkey="join_shuffle_baseline" + sfx)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bc)

    # 1000-row row groups: 10k float cols x 1000 rows ~= 40 MB per row
    # group — standard Parquet sizing, and what any 100 TB layout would
    # use. A single 400 MB row group pins the whole decode on one task;
    # ten groups scan 10-way parallel (the recorded artifact is the
    # claim — measured ~5-6x faster than the single-row-group layout on
    # a quiet host; see BENCH.md). Batch 1024 keeps the per-task working
    # set ~40 MB; 512 halves batch amortization for no memory benefit at
    # this width.
    path = ensure_wide_fixture(10_000, 10_000, row_group_rows=1_000)
    prev_batch = spark.conf.get("spark.sql.parquet.columnarReaderBatchSize")
    spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", "1024")
    try:
        # trials=7/warmups=2 like the READ_COLS >=1000c scans: this row
        # runs right after the codec section churns the page cache, and
        # a 3-trial window lands on the re-read/GC transient (measured
        # 8.7-9.3 s in-bench vs a 5.2-5.6 s steady state in isolation,
        # 2026-08-14); the wider window measures the steady state the
        # row claims.
        measured(out, "io_fullread_10000c",
                 lambda: eio.read_full_timed(spark, path), trials=7, warmups=2)
        # JVM-free twin on the SAME file (r10): pure-pyarrow decode.
        # This key has been the hardest to adjudicate across rounds
        # (r7 flagged, r8 proved environmental, r9/r10 re-flagged on
        # slow hosts) — a frozen-code twin that moves with it proves
        # host class; a twin that doesn't proves a Spark-side
        # regression.
        import pyarrow.parquet as _pq
        measured(out, "io_fullread_arrow_10000c",
                 lambda: _arrow_read(_pq, path), trials=5, warmups=1)
    finally:
        spark.conf.set("spark.sql.parquet.columnarReaderBatchSize", prev_batch)

    # Z-order clustering rewrite (sources/layout.py): the one-time
    # OPTIMIZE cost a layout pays to buy multi-dimensional row-group
    # skipping (skipping ratios pinned by tests/test_layout_skipping).
    # Timed as key computation + range shuffle + sort → noop (the write
    # itself is codec-benched elsewhere).
    from gresearch_parquet_benchmarking_spark.sources.layout import zorder_by

    li_full = load_table(spark, sf_dir, "lineitem")
    measured(out, "layout_zorder_lineitem",
             lambda: _noop_time(zorder_by(li_full, ["l_shipdate", "l_partkey"])),
             stat=med, hkey="layout_zorder_lineitem" + sfx)

    # Small-file compaction rewrite (sources/compaction.py): the other
    # periodic layout job. Input fixture = lineitem sprayed into 64
    # tiny files (the streaming-sink debris pattern), cached like the
    # wide fixtures; the timed unit is plan + read + clustered rewrite.
    from gresearch_parquet_benchmarking_spark.sources.compaction import compact

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    frag = os.path.join(CACHE_DIR, f"fragmented_lineitem_{tag}")
    if not os.path.isdir(frag):
        load_table(spark, sf_dir, "lineitem").repartition(64).write.mode(
            "overwrite"
        ).parquet(frag)
    compact_out = os.path.join(CACHE_DIR, f"compacted_lineitem_{tag}")

    def _compact_once() -> float:
        t0 = time.perf_counter()
        compact(spark, frag, compact_out, sort_by=["l_orderkey"])
        return time.perf_counter() - t0

    measured(out, "layout_compact_lineitem", _compact_once,
             stat=med, hkey="layout_compact_lineitem" + sfx)
    return out


def _noop_time(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _arrow_read(pq, path: str, columns=None) -> float:
    f = eio._first_parquet_file(path)
    t0 = time.perf_counter()
    pq.read_table(f, columns=columns)
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    host = host_index()  # before the JVM exists — must measure the bare host
    global RUN_T0
    RUN_T0 = time.perf_counter()
    # UI on (random port): the io_*_task_* entries read per-stage
    # executorRunTime from the UI REST API to split the ~130 ms
    # driver/scheduler floor out of small-file read timings.
    spark = get_spark(
        app_name="engine-bench",
        extra_confs={"spark.ui.enabled": "true", "spark.ui.port": "0"},
    )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    _load_history()
    results: dict[str, float] = {}
    # io first: scan micro-benchmarks need a quiet JVM (query-section
    # cached data + GC pressure inflates them otherwise)
    if os.environ.get("ENGINE_BENCH_SKIP_IO") != "1":
        results.update(bench_io(spark))
    results.update(bench_queries(spark, sf_dir))
    if os.environ.get("ENGINE_BENCH_SKIP_SCALE") != "1":
        results.update(bench_scale(spark, sf_dir))

    _save_history()
    # all measurements done — stop Spark BEFORE the end-of-run host
    # probe so the 32-wide py_sat loop doesn't contend with JVM
    # background/GC threads (ADVICE r10: a JVM-alive host_end made the
    # bare-host start → loaded end comparison systematically biased)
    spark.stop()
    host_end = host_index()
    # headline metric stays comparable across rounds: the full-only
    # tier is measured and recorded but not part of the total
    total = round(
        sum(
            v
            for k, v in results.items()
            if k not in FULL_ONLY_QUERIES and not k.startswith(FULL_ONLY_PREFIXES)
        ),
        4,
    )
    payload = {
        "metric": "headline_queries_plus_io_median_total",
        "value": total,
        "unit": "sec",
        "queries": results,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # entries still >3x their recorded best after one fresh
        # re-measure — nonzero means the host was contended and
        # the affected rows should be read with that in mind
        "contention_suspects": sorted(SUSPECTS),
        # median fresh/floor ratio across all floored entries: a
        # uniform sub-3x host/JVM-warmth tax (the r5 drift cluster)
        # shows up here as >1.3 even when contention_suspects is empty
        "drift_vs_floor": (
            round(statistics.median(DRIFT_RATIOS), 3) if DRIFT_RATIOS else None
        ),
        # JVM-free host-class micro-index (host_index docstring): ratio
        # a round's values against another round's to separate host tax
        # from code regressions numerically
        "host": host,
        # same index at run END (JVM stopped first — both endpoints
        # are bare-host) — two fast endpoints around a drifted run
        # mean the shift happened mid-run (full artifact adds the
        # per-key "at" timeline to localize it)
        "host_end": host_end,
        "full": "bench_results/bench_full_latest.json",
    }
    # The driver records only the LAST ~2000 bytes of stdout and
    # json-parses them; every prior round's full-detail line overflowed
    # that window (BENCH_r01..r03 all have parsed=null, tail cut
    # mid-line). So: full detail goes to a file, and the printed line
    # keeps the headline queries plus the io rows that BASELINE.md
    # compares, trimmed under the capture window.
    #
    # Provenance (VERDICT r9 #4): the default detail path is GITIGNORED
    # so a driver-initiated run can never dirty the committed final-SHA
    # artifact. Promoting a run to bench_results/bench_full.json (the
    # committed artifact BENCH.md narrates) is a deliberate copy, not a
    # side effect. Override with ENGINE_BENCH_FULL_PATH.
    full_path = os.environ.get("ENGINE_BENCH_FULL_PATH") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "bench_results",
        "bench_full_latest.json",
    )
    payload["at"] = AT  # full-artifact only: per-key finish offsets
    with open(full_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    compact = dict(payload)
    # timeline + end-index + the constant full-artifact pointer stay out
    # of the compact line (TAIL_BUDGET; the path is documented in
    # BENCH.md and carried inside the full artifact itself)
    compact.pop("at")
    compact.pop("host_end")
    compact.pop("full")
    # Suspects cap (VERDICT r12 #2): the r12 driver run's 35-name list
    # (~900 B of host diagnostics) drained every COMPACT_IO_KEYS entry
    # from the printed line. The compact line now carries the COUNT
    # (suspects_n, never trimmed) plus at most SUSPECTS_COMPACT_MAX
    # names; the full sorted list is in the full artifact.
    compact["suspects_n"] = len(SUSPECTS)
    compact["contention_suspects"] = sorted(SUSPECTS)[:SUSPECTS_COMPACT_MAX]
    keep = [k for k in results if k in HEADLINE or k in COMPACT_IO_KEYS]
    # Trim priority (tightest-budget first to drop): 1) layout/join
    # diagnostic io rows (reverse COMPACT_IO_KEYS order), 2) suspect
    # NAMES (count survives), 3) BASELINE-grid comparables — reached
    # only if the headline set alone overflows the window.
    spill = sorted(
        (k for k in keep if k not in HEADLINE), key=COMPACT_IO_KEYS.index
    )
    spill_base = [k for k in spill if k not in COMPACT_IO_DIAG_KEYS]
    spill_diag = [k for k in spill if k in COMPACT_IO_DIAG_KEYS]
    compact["queries"] = {k: round(results[k], 4) for k in keep}
    line = json.dumps(compact, separators=(",", ":"))
    if len(line) > TAIL_BUDGET:
        # First lever: compress printed precision to 4 significant
        # digits (≤0.01% relative error — print-only; the full artifact
        # keeps round(.,4)).
        compact["queries"] = {
            k: _sig4(v) for k, v in compact["queries"].items()
        }
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > TAIL_BUDGET and spill_diag:
        compact["queries"].pop(spill_diag.pop())
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > TAIL_BUDGET and compact["contention_suspects"]:
        compact["contention_suspects"].pop()
        line = json.dumps(compact, separators=(",", ":"))
    while len(line) > TAIL_BUDGET and spill_base:
        compact["queries"].pop(spill_base.pop())
        line = json.dumps(compact, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
