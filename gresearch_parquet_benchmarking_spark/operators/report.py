"""Events analytics + report-layer operators (reference A1–A10
analogs: unit conversion, recodes, pivots — SURVEY.md §2.4) plus the
temporal operators Spark lacks natively (as-of join, range join),
composed from DataFrame primitives.

The events table carries nanosecond timestamps (sources/events.py);
all time arithmetic is integer-exact on epoch ns/µs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import dsum, iso_date, query, sql_dsum
from gresearch_parquet_benchmarking_spark.sources.events import load_events
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

SESSION_GAP_NS = 30 * 60 * 1_000_000_000  # 30 minutes


@query(
    "json_extract_events",
    oracle=f"""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction (reference A9 parses google-benchmark JSON
    the same way: nested field → typed column → grouped series)."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


@query(
    "events_by_day",
    oracle=f"""
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS day,
           event_type,
           COUNT(*) AS n,
           {sql_dsum('value')} AS total_value,
           {sql_dsum('value / 1000.0', 8)} AS total_value_k
    FROM events
    GROUP BY 1, 2
    ORDER BY day, event_type
    """,
)
def events_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily rollup + unit conversion (reference A1: µs→ms, bytes→MB
    derived columns, visualize_stats.py:9-12)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(
            iso_date(F.date_trunc("day", "ts_ts"), alias="day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", alias="total_value"),
            dsum(F.col("value") / 1000.0, 8, alias="total_value_k"),
        )
        .orderBy("day", "event_type")
    )


@query(
    "events_pivot_by_type",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click')    AS click,
           COUNT(*) FILTER (WHERE event_type = 'error')    AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup')   AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view')     AS view
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot-table analog (reference A5: vizualize_row_groups.py:18)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
        .orderBy("user_id")
    )


@query(
    "sessionization",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us, value,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_NS // 1000}
                    OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
        SELECT user_id, event_id, ts_us, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events,
           MIN(ts_us) AS session_start_us,
           MAX(ts_us) AS session_end_us,
           CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS duration_us,
           {sql_dsum('value')} AS total_value
    FROM sessions
    GROUP BY user_id, session_id
    ORDER BY user_id, session_id
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running-sum session ids → per-session aggregates. One
    shuffle on user_id; everything else is within-partition window
    work. (The streaming twin uses session_window —
    streaming/events_stream.py.)"""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        "value",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > SESSION_GAP_NS // 1000)
            | F.lag("ts_us").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = marked.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        sessions.groupBy("user_id", F.col("session_id").cast("long").alias("session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            (F.max("ts_us") - F.min("ts_us")).cast("long").alias("duration_us"),
            dsum("value", alias="total_value"),
        )
        .orderBy("user_id", "session_id")
    )


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id,
           epoch_us(p.ts) AS purchase_ts_us,
           c.event_id AS last_click_id,
           epoch_us(c.ts) AS last_click_ts_us
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts > c.ts
    ORDER BY purchase_id
    """,
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one — SURVEY §2.9): for each
    purchase, the most recent strictly-earlier click of the same user.

    Composition: union both streams, per-user window ordered by time,
    last_value(click, ignoreNulls) over the preceding frame. One
    shuffle on user_id — same cost as any per-user window; no
    merge_asof Python path needed."""
    ev = load_events(spark, sf_dir)
    both = ev.filter(F.col("event_type").isin("purchase", "click")).select(
        "event_id", "user_id", "event_type", "ts", "ts_us"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ts = F.when(F.col("event_type") == "click", F.col("ts_us"))
    joined = both.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        F.last(click_id, ignorenulls=True).over(w).alias("last_click_id"),
        F.last(click_ts, ignorenulls=True).over(w).alias("last_click_ts_us"),
    )
    return (
        joined.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts_us").alias("purchase_ts_us"),
            "last_click_id",
            "last_click_ts_us",
        )
        .orderBy("purchase_id")
    )


@query(
    "range_join_price_bands",
    oracle="""
    WITH bands(band, lo, hi) AS (
        VALUES ('budget', 0.0, 950.0),
               ('mid', 950.0, 1350.0),
               ('premium', 1350.0, 100000.0)
    )
    SELECT band, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(27,4))) AS DOUBLE) AS total_price
    FROM part JOIN bands ON p_retailprice >= lo AND p_retailprice < hi
    GROUP BY band
    ORDER BY band
    """,
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join against a tiny band table → broadcast
    nested-loop, map-side; never a shuffle of the fact table."""
    pa = load_table(spark, sf_dir, "part")
    bands = pa.sparkSession.createDataFrame(
        [("budget", 0.0, 950.0), ("mid", 950.0, 1350.0), ("premium", 1350.0, 100000.0)],
        "band string, lo double, hi double",
    )
    return (
        pa.join(
            F.broadcast(bands),
            (F.col("p_retailprice") >= F.col("lo")) & (F.col("p_retailprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            dsum("p_retailprice", alias="total_price"),
        )
        .orderBy("band")
    )
