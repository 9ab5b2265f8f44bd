"""Streaming trending top-k: windowed counts maintained by Structured
Streaming, ranked per window downstream.

The composition every real-time leaderboard uses: the STREAM maintains
the additive state (per-window per-key counts — mergeable, watermark-
evictable), and the non-additive ranking runs over the materialized
aggregate (here the memory-sink table; in production the serving read
or a foreachBatch hook — ranking inside the stream would need a
non-time window function, which streaming correctly forbids). Counts
are the only state, so the operator scales exactly like
stream_hourly_counts; the rank pass touches |windows|·|event types|
rows regardless of event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import (
    query,
    track_persist,
)
from gresearch_parquet_benchmarking_spark.streaming.events_stream import (
    _read_event_stream,
    _run_to_table,
)

TREND_WINDOW_US = 6 * 3600 * 1_000_000  # 6-hour tumbling windows
TREND_TOP = 3

# State-store partition count for this module's stateful aggregates
# (r13; the stream_stream_join precedent). Their state is bounded by
# the AGGREGATE cardinality — |windows|·|event types| counts,
# |windows|·PSI_STREAM_BINS bin counts — not by event volume, so the
# fixed per-partition-per-batch store cost (open + delta commit)
# dominates at 32 partitions at any scale. Size to state volume: a
# cluster deployment with more windows in flight passes a larger
# value through the builders' ``state_partitions`` parameter.
TREND_STATE_PARTITIONS = 8


@query(
    "stream_topk_trending",
    oracle=f"""
    WITH w AS (
        SELECT (epoch_us(ts) // {TREND_WINDOW_US}) * {TREND_WINDOW_US} AS ws,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    t AS (SELECT ws, CAST(SUM(n) AS BIGINT) AS total FROM w GROUP BY ws),
    ranked AS (
        SELECT w.ws AS window_start_us, w.event_type, w.n,
               ROUND(w.n * 1.0 / t.total, 6) AS share,
               CAST(ROW_NUMBER() OVER (PARTITION BY w.ws
                                       ORDER BY w.n DESC, w.event_type)
                    AS BIGINT) AS rnk
        FROM w JOIN t USING (ws)
    )
    SELECT window_start_us, event_type, n, share, rnk
    FROM ranked WHERE rnk <= {TREND_TOP}
    ORDER BY window_start_us, rnk
    """,
)
def stream_topk_trending(
    spark: SparkSession, sf_dir: str,
    state_partitions: int | None = TREND_STATE_PARTITIONS
) -> DataFrame:
    """Top-{TREND_TOP} event types per 6-hour tumbling window with
    their share of window traffic. The streaming half is a watermarked
    window count (epoch-aligned, so the batch oracle's integer-div
    bucketing is the identical window function); the ranking half is a
    per-window row_number over the tiny materialized aggregate.
    Determinism: integer counts; share = one double division; rank
    ties break on event_type."""
    ev = _read_event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts_ts", "6 hours")
        .groupBy(F.window("ts_ts", "6 hours"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    out = _run_to_table(agg, "complete", state_partitions=state_partitions)
    counts = out.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "event_type",
        "n",
    )
    totals = counts.groupBy("window_start_us").agg(
        F.sum("n").cast("long").alias("total")
    )
    w = W.partitionBy("window_start_us").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.join(totals, "window_start_us")
        .withColumn("share", F.round(F.col("n") * F.lit(1.0) / F.col("total"), 6))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= TREND_TOP)
        .select("window_start_us", "event_type", "n", "share", "rnk")
        .orderBy("window_start_us", "rnk")
    )


# ---------------------------------------------------------------------------
# Streaming distribution drift (round 6): per-window PSI vs reference
# ---------------------------------------------------------------------------

PSI_STREAM_BINS = 10
PSI_STREAM_EPS = 1e-6
PSI_STREAM_ACT = 0.2
PSI_STREAM_MIN_N = 100   # PSI is meaningless on a handful of samples
_PSI_CUT_LIST = ", ".join(
    str(i / PSI_STREAM_BINS) for i in range(1, PSI_STREAM_BINS)
)


@query(
    "stream_psi_value_drift",
    oracle=f"""
    WITH e AS (
        SELECT (epoch_us(ts) // {TREND_WINDOW_US}) * {TREND_WINDOW_US} AS ws,
               CAST(value AS DOUBLE) AS x
        FROM events
    ),
    cuts AS (
        SELECT quantile_cont(x, [{_PSI_CUT_LIST}]) AS cuts FROM e
    ),
    binned AS (
        SELECT ws, 1 + len(list_filter(cuts.cuts, c -> x > c)) AS bin
        FROM e CROSS JOIN cuts
    ),
    ref AS (
        SELECT bin, COUNT(*) AS n_ref FROM binned GROUP BY bin
    ),
    ref_tot AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS t_ref FROM ref),
    cur AS (
        SELECT ws, bin, COUNT(*) AS n_cur FROM binned GROUP BY ws, bin
    ),
    win_tot AS (
        SELECT ws, CAST(SUM(n_cur) AS BIGINT) AS t_cur FROM cur GROUP BY ws
    ),
    spine AS (
        SELECT w.ws, r.bin, r.n_ref, COALESCE(c.n_cur, 0) AS n_cur
        FROM (SELECT DISTINCT ws FROM cur) w
        CROSS JOIN ref r
        LEFT JOIN cur c ON c.ws = w.ws AND c.bin = r.bin
    ),
    terms AS (
        SELECT s.ws,
               GREATEST(s.n_cur * 1.0 / wt.t_cur, {PSI_STREAM_EPS}) AS q,
               GREATEST(s.n_ref * 1.0 / rt.t_ref, {PSI_STREAM_EPS}) AS p,
               wt.t_cur
        FROM spine s
        JOIN win_tot wt ON wt.ws = s.ws
        CROSS JOIN ref_tot rt
    )
    SELECT ws AS window_start_us,
           ROUND(CAST(SUM(CAST((q - p) * ln(q / p) AS DECIMAL(27,12)))
                 AS DOUBLE), 6) AS psi,
           CAST(MAX(t_cur) AS BIGINT) AS n_events,
           MAX(t_cur) < {PSI_STREAM_MIN_N} AS low_sample,
           CAST(SUM(CAST((q - p) * ln(q / p) AS DECIMAL(27,12)))
                AS DOUBLE) > {PSI_STREAM_ACT}
               AND MAX(t_cur) >= {PSI_STREAM_MIN_N} AS drift_detected
    FROM terms
    GROUP BY ws
    ORDER BY ws
    """,
)
def stream_psi_value_drift(
    spark: SparkSession, sf_dir: str,
    state_partitions: int | None = TREND_STATE_PARTITIONS
) -> DataFrame:
    """Per-window Population Stability Index of the event ``value``
    distribution against the full-history reference — distribution
    drift as a STREAMING monitor (the operators/drift.py PSI, deployed
    continuously): reference decile cutpoints come from the static
    table and enter the streaming plan as an array CONSTANT (the
    production shape — a daily batch job publishes cutpoints as
    config; a stream-static keyless join is not a supported streaming
    shape), each streaming event bins map-side against them, and the
    per-(window, bin) counts —
    the only state, additive and watermark-evictable — feed a
    downstream PSI with epsilon-floored shares and decimal-accumulated
    ln-terms per window. Windows under PSI_STREAM_MIN_N events are
    marked low_sample and never flag drift — with a handful of events
    the epsilon-floored empty bins alone produce a huge PSI, so an
    ungated monitor would page on every quiet hour (the standard
    minimum-sample guard).

    At 100 TB/day the state is |windows|·{PSI_STREAM_BINS} BIGINTs
    regardless of event volume; re-deriving the reference cutpoints
    periodically (daily batch job) is the documented production
    cadence. The oracle recomputes the whole thing in batch SQL —
    streaming and batch must agree exactly."""
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    static = load_events(spark, sf_dir).select(
        F.col("value").cast("double").alias("x")
    )
    probs = [i / PSI_STREAM_BINS for i in range(1, PSI_STREAM_BINS)]
    # one 9-value driver-side fetch (the n_docs-scalar precedent):
    # production pushes the batch job's cutpoints into the streaming
    # query as configuration — they are plan constants, not a join
    # (a stream-static keyless join is also not a supported shape)
    cut_row = static.agg(
        *[F.percentile("x", F.lit(p)).alias(f"c{i}") for i, p in enumerate(probs)]
    ).collect()[0]
    cuts_lit = F.array(*[F.lit(float(cut_row[i])) for i in range(len(probs))])

    ev = _read_event_stream(spark, sf_dir)
    binned = ev.select(
        "ts_ts",
        (
            F.lit(1)
            + F.size(
                F.filter(
                    cuts_lit,
                    lambda c: F.col("value").cast("double") > c,
                )
            )
        ).alias("bin"),
    )
    agg = (
        binned.withWatermark("ts_ts", "6 hours")
        .groupBy(F.window("ts_ts", "6 hours"), "bin")
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    cur = _run_to_table(agg, "complete", state_partitions=state_partitions).select(
        F.unix_micros(F.col("window.start")).alias("ws"), "bin", "n_cur"
    )
    cur = track_persist(cur)
    ref = cur.groupBy("bin").agg(F.sum("n_cur").alias("n_ref"))
    ref_tot = ref.agg(F.sum("n_ref").cast("long").alias("t_ref"))
    win_tot = cur.groupBy("ws").agg(F.sum("n_cur").cast("long").alias("t_cur"))
    # rename the right branch: ref derives FROM cur, so joining cur
    # back against it verbatim is a self-join with conflicting
    # attribute ids
    curb = cur.select(
        F.col("ws").alias("cws"),
        F.col("bin").alias("cbin"),
        F.col("n_cur").alias("cn_cur"),
    )
    spine = (
        cur.select("ws")
        .distinct()
        .crossJoin(F.broadcast(ref))
        .join(
            curb,
            (F.col("ws") == F.col("cws")) & (F.col("bin") == F.col("cbin")),
            "left",
        )
        .select(
            "ws", "bin", "n_ref", F.coalesce(F.col("cn_cur"), F.lit(0)).alias("n_cur")
        )
    )
    terms = (
        spine.join(win_tot, "ws")
        .crossJoin(F.broadcast(ref_tot))
        .select(
            "ws",
            "t_cur",
            F.greatest(
                F.col("n_cur") * F.lit(1.0) / F.col("t_cur"),
                F.lit(PSI_STREAM_EPS),
            ).alias("q"),
            F.greatest(
                F.col("n_ref") * F.lit(1.0) / F.col("t_ref"),
                F.lit(PSI_STREAM_EPS),
            ).alias("p"),
        )
    )
    psi_sum = F.sum(
        ((F.col("q") - F.col("p")) * F.log(F.col("q") / F.col("p"))).cast(
            "decimal(27,12)"
        )
    ).cast("double")
    out = (
        terms.groupBy("ws")
        .agg(
            F.round(psi_sum, 6).alias("psi"),
            F.max("t_cur").cast("long").alias("n_events"),
            (F.max("t_cur") < PSI_STREAM_MIN_N).alias("low_sample"),
            (
                (psi_sum > PSI_STREAM_ACT)
                & (F.max("t_cur") >= PSI_STREAM_MIN_N)
            ).alias("drift_detected"),
        )
        .select(
            F.col("ws").alias("window_start_us"),
            "psi",
            "n_events",
            "low_sample",
            "drift_detected",
        )
        .orderBy("window_start_us")
    )
    return out


@query(
    "stream_integrity_checksum",
    oracle=f"""
    WITH hashed AS (
        SELECT event_type,
               ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':'
                               || CAST(user_id AS VARCHAR) || ':'
                               || CAST(epoch_us(ts) AS VARCHAR)), 1, 14))::BIGINT
                 AS h
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           bit_xor(h) AS xor_checksum,
           MIN(h) AS min_hash,
           MAX(h) AS max_hash
    FROM hashed GROUP BY event_type ORDER BY event_type
    """,
)
def stream_integrity_checksum(
    spark: SparkSession, sf_dir: str,
    state_partitions: int | None = TREND_STATE_PARTITIONS
) -> DataFrame:
    """Streaming twin of ``integrity_partition_checksums``
    (operators/analytics2.py): per-event-type XOR content checksums
    maintained BY THE STREAM — the continuous-audit posture where a
    replicating pipeline carries its own mergeable checksum state and
    any batch-side re-read must reproduce it bit-for-bit.

    XOR/MIN/MAX/COUNT are all commutative-associative, so the
    streaming engine's incremental state merge across micro-batches
    is exactly the batch combiner algebra — the same answer regardless
    of how the input was split into batches (or tasks, at 100 TB).
    The hash covers integer fields only (ids + exact epoch-µs):
    float/string formatting never enters the hashed payload, so both
    engines hash identical bytes."""
    ev = _read_event_stream(spark, sf_dir)
    h = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.col("event_id").cast("string"),
                    F.col("user_id").cast("string"),
                    F.col("ts_us").cast("string"),
                )
            ),
            1,
            14,
        ),
        16,
        10,
    ).cast("bigint")
    agg = (
        ev.select("event_type", h.alias("h"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("xor_checksum"),
            F.min("h").alias("min_hash"),
            F.max("h").alias("max_hash"),
        )
    )
    return _run_to_table(
        agg, "complete", state_partitions=state_partitions
    ).orderBy("event_type")
