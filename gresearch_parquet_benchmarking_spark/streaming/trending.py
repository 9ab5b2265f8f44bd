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

from gresearch_parquet_benchmarking_spark.operators.registry import query
from gresearch_parquet_benchmarking_spark.streaming.events_stream import (
    _read_event_stream,
    _run_to_table,
)

TREND_WINDOW_US = 6 * 3600 * 1_000_000  # 6-hour tumbling windows
TREND_TOP = 3


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
def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    out = _run_to_table(agg, "complete")
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
