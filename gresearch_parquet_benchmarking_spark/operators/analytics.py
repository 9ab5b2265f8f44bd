"""Event-analytics operators: funnel conversion, cohort retention,
sliding-window active users.

The classic product-analytics trio every event warehouse runs
(SURVEY.md §2.9 extension surface — the reference has no event model at
all). All three are one-or-two-shuffle shapes over the events table:

* funnel — the ordered view→click→purchase progression per user is
  three chained conditional MINs over the SAME user partition (one
  exchange, window reuse), then a single global rollup row. At 100 TB
  the shuffle key is user_id and the state per user is three BIGINTs.
* cohort retention — two aggregates (first-seen day, distinct active
  days) joined on user_id, then a (cohort, offset) count-distinct.
  Every shuffle key is constant-width; nothing quadratic.
* sliding windows — Spark's native F.window(slide) assigns each event
  to window_size/slide windows map-side (here 2), so the only shuffle
  is the per-window aggregate — the batch twin of the streaming
  operator family in streaming/events_stream.py.

Timestamps follow CLAUDE.md rule 4: events load through
sources/events.py (schema-adaptive ts contract) and all day/window
arithmetic is integer (epoch-µs div), never double division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import (
    dsum,
    query,
    sql_davg,
    sql_dsum,
    track_persist,
)
from gresearch_parquet_benchmarking_spark.sources.events import load_events

US_PER_DAY = 86_400_000_000
RETENTION_MAX_OFFSET = 7


@query(
    "event_funnel_conversion",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    w1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
                      OVER (PARTITION BY user_id) AS v
        FROM e
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us >= v THEN ts_us END)
                      OVER (PARTITION BY user_id) AS c
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us >= c THEN ts_us END)
                      OVER (PARTITION BY user_id) AS p
        FROM w2
    ),
    u AS (
        SELECT user_id, MAX(v) AS v, MAX(c) AS c, MAX(p) AS p
        FROM w3 GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           COUNT(v) AS n_view,
           COUNT(c) AS n_click_after_view,
           COUNT(p) AS n_purchase_after_click,
           ROUND(COUNT(c) * 1.0 / NULLIF(COUNT(v), 0), 6) AS view_to_click,
           ROUND(COUNT(p) * 1.0 / NULLIF(COUNT(c), 0), 6) AS click_to_purchase
    FROM u
    """,
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: first view, first click AT-OR-AFTER that view,
    first purchase at-or-after that click, per user; one global
    conversion row. The three conditional MINs share one user_id
    window partitioning (single exchange); conversion rates are double
    divisions of exact integer counts (deterministic)."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    w = W.partitionBy("user_id")
    stepped = (
        ev.withColumn(
            "v",
            F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(w),
        )
        .withColumn(
            "c",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts_us") >= F.col("v")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
        .withColumn(
            "p",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") >= F.col("c")),
                    F.col("ts_us"),
                )
            ).over(w),
        )
    )
    users = stepped.groupBy("user_id").agg(
        F.max("v").alias("v"), F.max("c").alias("c"), F.max("p").alias("p")
    )
    n = F.count(F.lit(1))
    nv, nc, np_ = F.count("v"), F.count("c"), F.count("p")
    # Zero guards: a corpus with no view (or no click) events must yield
    # NULL rates on both engines, not an ANSI DIVIDE_BY_ZERO crash
    # (oracle twin: NULLIF(COUNT(v), 0)).
    v2c = F.when(nv > 0, F.round(nc.cast("double") / nv, 6))
    c2p = F.when(nc > 0, F.round(np_.cast("double") / nc, 6))
    return users.agg(
        n.alias("n_users"),
        nv.alias("n_view"),
        nc.alias("n_click_after_view"),
        np_.alias("n_purchase_after_click"),
        v2c.alias("view_to_click"),
        c2p.alias("click_to_purchase"),
    )


@query(
    "cohort_retention",
    oracle=f"""
    WITH e AS (
        SELECT user_id, epoch_us(ts) // {US_PER_DAY} AS day FROM events
    ),
    cohort AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
    activity AS (SELECT DISTINCT user_id, day FROM e),
    joined AS (
        SELECT c.cohort_day, a.day - c.cohort_day AS day_offset, a.user_id
        FROM activity a JOIN cohort c ON a.user_id = c.user_id
        WHERE a.day - c.cohort_day <= {RETENTION_MAX_OFFSET}
    ),
    grid AS (
        SELECT cohort_day, day_offset,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM joined GROUP BY cohort_day, day_offset
    )
    SELECT cohort_day, day_offset, n_users,
           ROUND(n_users * 1.0 /
                 MAX(CASE WHEN day_offset = 0 THEN n_users END)
                     OVER (PARTITION BY cohort_day), 6) AS retention
    FROM grid
    ORDER BY cohort_day, day_offset
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort retention grid: users grouped by first-seen day,
    distinct-user counts at day offsets 0..{RETENTION_MAX_OFFSET},
    rates relative to the cohort's own day-0 size (every user is active
    on their cohort day, so the denominator always exists). Day ids are
    integer epoch-days (µs div) — no date objects cross the oracle
    boundary (CLAUDE.md rule 2)."""
    e = load_events(spark, sf_dir).select(
        "user_id", F.expr(f"ts_us div {US_PER_DAY}").alias("day")
    )
    cohort = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    activity = e.distinct()
    joined = (
        activity.join(cohort, "user_id")
        .withColumn("day_offset", F.col("day") - F.col("cohort_day"))
        .filter(F.col("day_offset") <= RETENTION_MAX_OFFSET)
    )
    grid = joined.groupBy("cohort_day", "day_offset").agg(
        F.count_distinct("user_id").cast("long").alias("n_users")
    )
    wc = W.partitionBy("cohort_day")
    day0 = F.max(F.when(F.col("day_offset") == 0, F.col("n_users"))).over(wc)
    return (
        grid.withColumn(
            "retention", F.round(F.col("n_users").cast("double") / day0, 6)
        )
        .orderBy("cohort_day", "day_offset")
    )


@query(
    "events_sliding_active_users",
    oracle="""
    WITH e AS (
        SELECT user_id, ts, date_trunc('hour', ts) AS h FROM events
    ),
    x AS (
        SELECT user_id, ts, h - k * INTERVAL 1 HOUR AS ws
        FROM e CROSS JOIN (SELECT unnest([0, 1]) AS k)
    )
    SELECT epoch_us(ws) AS window_start_us,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           COUNT(*) AS n_events
    FROM x
    GROUP BY ws
    ORDER BY window_start_us
    """,
)
def events_sliding_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window activity: distinct users and event volume per
    2-hour window sliding every hour — the batch twin of a streaming
    sliding aggregate. Spark's F.window assigns each event to its 2
    overlapping windows map-side; the oracle replicates the assignment
    with an explicit 2-element unnest (hour-aligned windows, same
    epoch alignment as Spark's)."""
    ev = load_events(spark, sf_dir).select("user_id", "ts_ts")
    return (
        ev.groupBy(F.window("ts_ts", "2 hours", "1 hour").alias("win"))
        .agg(
            F.count_distinct("user_id").cast("long").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.unix_micros(F.col("win.start")).alias("window_start_us"),
            "n_users",
            "n_events",
        )
        .orderBy("window_start_us")
    )


US_PER_HOUR = 3_600_000_000
_SESSION_GAP_US = 30 * 60 * 1_000_000  # mirror report.SESSION_GAP_NS // 1000
HOT_BIN_SESSIONS = 1024  # sessions per bin above which the bin is salted
MAX_BIN_SALT = 64        # replication cap for a single pathological bin


def _session_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-sessionized user sessions exploded into their hour bins:
    (user_id, session_id, s, e, bin). Shared by interval_overlap_users
    and the scale-shape probe (plans/scale_probes.py), which counts
    per-bin candidate pairs from exactly this relation."""
    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.select(
        "user_id",
        "event_id",
        "ts_us",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(w) > _SESSION_GAP_US)
            | F.lag("ts_us").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = (
        marked.withColumn(
            "session_id",
            F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("ts_us").alias("s"), F.max("ts_us").alias("e"))
    )
    return sessions.select(
        "user_id",
        "session_id",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.expr(f"s div {US_PER_HOUR}"), F.expr(f"e div {US_PER_HOUR}")
            )
        ).alias("bin"),
    )


def _overlap_pairs(binned: DataFrame) -> DataFrame:
    """Distinct (user_a, user_b, sid_a, sid_b) overlapping-session pairs
    from a bin-exploded session table (user_id, session_id, s, e, bin).

    Hot-bin skew guard — ADAPTIVE salt: the candidate join's only
    equi-key is the bin id, so a popular hour would otherwise put
    O(sessions²) pair checks in ONE task. A tiny per-bin count table
    (one row per hour bin — bounded by the corpus timespan, broadcast)
    assigns each bin a salt fan-out ceil(n_bin / HOT_BIN_SESSIONS),
    capped at MAX_BIN_SALT: side A salts by
    pmod(hash(user, session), fanout), side B replicates across the
    bin's fanout — every candidate pair still meets exactly once (at
    side A's salt) and a hot bin's quadratic work caps at
    ~n·HOT_BIN_SESSIONS checks per task. Uniform bins get fanout 1 —
    ZERO replication overhead (a fixed global salt measured 2.4× slower
    at sf0.1: it replicates every bin and defeats exchange reuse).
    The bin table is persisted (track_persist) because the session
    subtree feeds both join sides. Output is salt-invariant."""
    binned = track_persist(binned)
    fanout = F.least(
        F.lit(MAX_BIN_SALT),
        F.greatest(
            F.lit(1),
            F.ceil(F.count(F.lit(1)) / F.lit(HOT_BIN_SESSIONS)),
        ),
    ).cast("int")
    bin_salt = binned.groupBy("bin").agg(fanout.alias("fan"))
    a = binned.join(F.broadcast(bin_salt), "bin").select(
        F.col("user_id").alias("user_a"), F.col("session_id").alias("sid_a"),
        F.col("s").alias("sa"), F.col("e").alias("ea"), "bin",
        F.pmod(F.hash("user_id", "session_id"), F.col("fan")).alias("salt"),
    )
    b = binned.join(F.broadcast(bin_salt), "bin").select(
        F.col("user_id").alias("user_b"), F.col("session_id").alias("sid_b"),
        F.col("s").alias("sb"), F.col("e").alias("eb"), F.col("bin").alias("bin_b"),
        F.explode(F.sequence(F.lit(0), F.col("fan") - 1)).alias("salt_b"),
    )
    return (
        a.join(
            b,
            (F.col("bin") == F.col("bin_b"))
            & (F.col("salt") == F.col("salt_b"))
            & (F.col("user_a") < F.col("user_b"))
            & (F.col("sa") <= F.col("eb"))
            & (F.col("sb") <= F.col("ea")),
        )
        .select("user_a", "user_b", "sid_a", "sid_b")
        .distinct()  # a pair overlapping across k shared bins counts once
    )


@query(
    "interval_overlap_users",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts_us,
               CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_SESSION_GAP_US}
                    OR LAG(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
    ),
    numbered AS (
        SELECT user_id, ts_us,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM marked
    ),
    sessions AS (
        SELECT user_id, session_id,
               MIN(ts_us) AS s, MAX(ts_us) AS e
        FROM numbered GROUP BY user_id, session_id
    )
    SELECT a.user_id AS user_a, b.user_id AS user_b,
           COUNT(*) AS n_overlaps
    FROM sessions a JOIN sessions b
      ON a.user_id < b.user_id AND a.s <= b.e AND b.s <= a.e
    GROUP BY a.user_id, b.user_id
    ORDER BY user_a, user_b
    """,
)
def interval_overlap_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: pairs of users with concurrently-active
    sessions, counted per pair — the co-activity graph a fraud/abuse
    pipeline builds. Spark has no native interval join, and the naive
    formulation is an all-pairs product; the scale pattern is BINNING:
    each session explodes into its hour bins, candidates meet only
    inside a bin (equi-join on the bin id), the exact overlap predicate
    runs on candidates, and a distinct collapses pairs that share
    several bins. The DuckDB twin is the direct inequality join (fine
    at oracle scale; IEJoin territory) — binning must not change the
    answer: any overlapping pair shares the bin of max(a.start,
    b.start), so candidate generation is lossless. Hot-bin quadratic
    skew is guarded by the adaptive per-bin salt in
    :func:`_overlap_pairs` (output-invariant; skew fixture pinned in
    tests/test_analytics.py)."""
    return (
        _overlap_pairs(_session_bins(spark, sf_dir))
        .groupBy("user_a", "user_b")
        .agg(F.count(F.lit(1)).alias("n_overlaps"))
        .orderBy("user_a", "user_b")
    )


ATTR_WINDOW_US = 24 * US_PER_HOUR  # attribution lookback


@query(
    "event_attribution_last_touch",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id, event_type, value, epoch_us(ts) AS ts_us FROM events
    ),
    marked AS (
        SELECT *,
               LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                               THEN event_type END IGNORE NULLS) OVER w AS touch_type,
               LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                               THEN ts_us END IGNORE NULLS) OVER w AS touch_ts
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    p AS (
        SELECT CASE WHEN touch_ts IS NOT NULL AND ts_us - touch_ts <= {ATTR_WINDOW_US}
                    THEN touch_type ELSE 'none' END AS channel,
               value,
               CASE WHEN touch_ts IS NOT NULL AND ts_us - touch_ts <= {ATTR_WINDOW_US}
                    THEN ts_us - touch_ts END AS lag_us
        FROM marked WHERE event_type = 'purchase'
    )
    SELECT channel,
           COUNT(*) AS n_purchases,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
           ROUND(CAST(CAST(SUM(lag_us) AS BIGINT) AS DOUBLE)
                 / NULLIF(COUNT(lag_us), 0), 3) AS avg_lag_us
    FROM p
    GROUP BY channel
    ORDER BY channel
    """,
)
def event_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch revenue attribution: each purchase credits the most
    recent view/click by the same user within ATTR_WINDOW_US (else
    'none') — the marketing-attribution rollup every event warehouse
    runs. The carried-forward last touch is ONE ignore-nulls window
    over the user partition (the same single-exchange shape as the
    funnel); revenue is decimal-summed; the average lag is a double
    division of exact integer sums with a NULLIF guard for the 'none'
    channel."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value", "ts_us"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    is_touch = F.col("event_type").isin("view", "click")
    marked = ev.withColumn(
        "touch_type",
        F.last(F.when(is_touch, F.col("event_type")), ignorenulls=True).over(w),
    ).withColumn(
        "touch_ts",
        F.last(F.when(is_touch, F.col("ts_us")), ignorenulls=True).over(w),
    )
    within = F.col("touch_ts").isNotNull() & (
        F.col("ts_us") - F.col("touch_ts") <= ATTR_WINDOW_US
    )
    p = marked.filter(F.col("event_type") == "purchase").select(
        F.when(within, F.col("touch_type")).otherwise("none").alias("channel"),
        "value",
        F.when(within, F.col("ts_us") - F.col("touch_ts")).alias("lag_us"),
    )
    n_lag = F.count("lag_us")
    return (
        p.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(27,4)"))
            .cast("double")
            .alias("revenue"),
            F.round(
                F.when(
                    n_lag > 0,
                    F.sum("lag_us").cast("double") / n_lag,
                ),
                3,
            ).alias("avg_lag_us"),
        )
        .orderBy("channel")
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_type)
                   AS prev_type
        FROM events
    ),
    trans AS (
        SELECT prev_type AS from_type, event_type AS to_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    ),
    outdeg AS (
        SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out
        FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.n,
           ROUND(t.n * 1.0 / o.n_out, 6) AS p
    FROM trans t JOIN outdeg o ON t.from_type = o.from_type
    ORDER BY t.from_type, t.to_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for each user's event stream in event-time order, count
    (previous type → type) transitions and row-normalize into
    transition probabilities — the behavioral model a funnel/journey
    analysis starts from (and an anomaly detector baselines against).
    Tie order at equal timestamps is pinned by (ts, event_type) on
    both engines, and swapping identical (user, ts, type) rows cannot
    change a transition count, so the result is delivery-order-free.

    Scale shape: one user_id window (the sessionization exchange),
    then a |types|² aggregation with map-side partials; the
    normalization denominator joins a broadcast |types|-row table.
    Event values never shuffle — only (user_id, type, ts)."""
    seq = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts_us", "event_type"))
        .alias("prev_type"),
    )
    trans = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy(F.col("prev_type").alias("from_type"), F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    outdeg = trans.groupBy("from_type").agg(F.sum("n").cast("long").alias("n_out"))
    return (
        trans.join(F.broadcast(outdeg), "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            F.round(F.col("n") * F.lit(1.0) / F.col("n_out"), 6).alias("p"),
        )
        .orderBy("from_type", "to_type")
    )


@query(
    "events_scd2_intervals",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY epoch_us(ts), event_type)
                   AS prev_type
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts_us
        FROM seq
        WHERE prev_type IS NULL OR event_type != prev_type
    ),
    intervals AS (
        SELECT user_id, event_type,
               ts_us AS valid_from_us,
               LEAD(ts_us) OVER (PARTITION BY user_id
                                 ORDER BY ts_us, event_type) AS valid_to_us
        FROM changes
    )
    SELECT user_id,
           COUNT(*) AS n_versions,
           CAST(SUM(CASE WHEN valid_to_us IS NULL THEN 0
                         ELSE valid_to_us - valid_from_us END) AS BIGINT)
               AS closed_dwell_us,
           CAST(MAX(CASE WHEN valid_to_us IS NULL THEN valid_from_us END)
                AS BIGINT) AS current_since_us
    FROM intervals
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-capture into SCD-type-2 validity intervals: collapse each
    user's event stream into runs of constant event_type (a new version
    opens when the type CHANGES), close each version at the next
    change, and roll up per user — version count, total closed dwell
    time, and the open version's start. This is the gaps-and-islands /
    dimension-history build every warehouse runs to turn an event log
    into a temporal table; sessionization covers the time-gap islands,
    this covers the value-change islands.

    Scale shape: two windows over the same user_id partitioning (the
    change flag and the closing LEAD) — one exchange, both sorts
    colocated — then a per-user rollup that reuses the partitioning.
    Tie order at equal timestamps is pinned by (ts, event_type) on
    both engines; dwell sums are exact integer µs."""
    seq = load_events(spark, sf_dir).select(
        "user_id",
        "event_type",
        "ts_us",
        F.lag("event_type")
        .over(W.partitionBy("user_id").orderBy("ts_us", "event_type"))
        .alias("prev_type"),
    )
    changes = seq.filter(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    intervals = changes.select(
        "user_id",
        "event_type",
        F.col("ts_us").alias("valid_from_us"),
        F.lead("ts_us")
        .over(W.partitionBy("user_id").orderBy("ts_us", "event_type"))
        .alias("valid_to_us"),
    )
    closed = F.when(
        F.col("valid_to_us").isNull(), F.lit(0).cast("long")
    ).otherwise(F.col("valid_to_us") - F.col("valid_from_us"))
    return (
        intervals.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum(closed).cast("long").alias("closed_dwell_us"),
            F.max(
                F.when(F.col("valid_to_us").isNull(), F.col("valid_from_us"))
            ).cast("long").alias("current_since_us"),
        )
        .orderBy("user_id")
    )


@query(
    "orders_seasonality_trailing",
    oracle="""
    WITH monthly AS (
        SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders
        FROM orders GROUP BY 1
    )
    SELECT month, n_orders,
           CAST(CAST(SUM(n_orders) OVER w AS BIGINT) AS DOUBLE)
               / COUNT(*) OVER w AS trailing_avg,
           ROUND(n_orders * 1.0 /
                 (CAST(CAST(SUM(n_orders) OVER w AS BIGINT) AS DOUBLE)
                  / COUNT(*) OVER w), 6) AS seasonal_ratio
    FROM monthly
    WINDOW w AS (ORDER BY month ROWS BETWEEN 11 PRECEDING AND CURRENT ROW)
    ORDER BY month
    """,
)
def orders_seasonality_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality screen over the order volume series: monthly counts,
    the trailing-12-month moving average, and each month's ratio to
    it — the decomposition-lite a demand dashboard draws (ratio > 1 =
    seasonal peak). The window frame averages over however many months
    exist (early months use a shorter window on BOTH engines — same
    ROWS frame semantics).

    Scale shape: the corpus-sized work is one month-key aggregation
    with map-side partials; the moving window then runs over the
    MONTH table (≈ corpus-years × 12 rows — metadata-sized at any SF),
    so the single-partition ORDER BY window is free. Integer sums and
    counts make the averages exact-deterministic."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w = W.orderBy("month").rowsBetween(-11, 0)
    tavg = F.sum("n_orders").over(w).cast("long").cast("double") / F.count(
        F.lit(1)
    ).over(w)
    return monthly.select(
        "month",
        "n_orders",
        tavg.alias("trailing_avg"),
        F.round(F.col("n_orders") * F.lit(1.0) / tavg, 6).alias("seasonal_ratio"),
    ).orderBy("month")


BASKET_MIN_SUPPORT = 3  # minimum co-order count for the affinity table


@query(
    "basket_part_affinity",
    oracle=f"""
    WITH li AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM li),
    singles AS (
        SELECT l_partkey, COUNT(*) AS n_p FROM li GROUP BY l_partkey
    ),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
        FROM li a JOIN li b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
    )
    SELECT p.part_a, p.part_b, p.n_ab,
           ROUND(p.n_ab * 1.0 * n.n_orders / (sa.n_p * sb.n_p), 6) AS lift
    FROM pairs p
    JOIN singles sa ON p.part_a = sa.l_partkey
    JOIN singles sb ON p.part_b = sb.l_partkey
    CROSS JOIN n
    WHERE p.n_ab >= {BASKET_MIN_SUPPORT}
    ORDER BY p.n_ab DESC, p.part_a, p.part_b
    """,
)
def basket_part_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity over order line items: for every part
    pair co-appearing in ≥ {BASKET_MIN_SUPPORT} orders, the co-order
    count and the LIFT over independence
    (P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b)) — the co-purchase
    signal behind recommendations and assortment planning.

    Scale shape (r12 optimization round, guide §2.3/§2.4): ONE hash
    aggregate builds per-order part sets (collect_set dedups in-map,
    subsuming the old standalone DISTINCT), persisted because FOUR
    consumers read it (order count, singles ×2, pairs) — the former
    shape re-executed the lineitem DISTINCT subtree once per consumer
    (5 scans + shuffles per run) and materialized candidate pairs
    through a lineitem⋈lineitem self-join (two more corpus shuffles).
    Pairs now expand IN-ROW from the sorted set (the _pair_postings /
    graph._copurchase_pairs idiom) — strictly ascending (part_a <
    part_b) by construction, bounded ~lines²/2 per order, identical
    pair multiset to the self-join. Pair counting and the two singles
    joins shuffle constant-width part keys with map-side partials;
    the order count broadcasts. Lift is a per-row double ratio of
    exact integers."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    baskets = track_persist(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps"))
    )
    n = baskets.agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    singles = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n_p"))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ps"),
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size(F.col("ps"))),
                lambda y: F.struct(x.alias("part_a"), y.alias("part_b")),
            ),
        )
    )
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.part_a").alias("part_a"), F.col("p.part_b").alias("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= BASKET_MIN_SUPPORT)
    )
    return (
        pairs.join(
            singles.select(
                F.col("l_partkey").alias("part_a"), F.col("n_p").alias("n_a")
            ),
            "part_a",
        )
        .join(
            singles.select(
                F.col("l_partkey").alias("part_b"), F.col("n_p").alias("n_b")
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            F.round(
                F.col("n_ab") * F.lit(1.0) * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("n_ab"), "part_a", "part_b")
    )


@query(
    "supplier_concentration_hhi",
    oracle="""
    WITH rev AS (
        SELECT s.s_nationkey, l.l_suppkey,
               CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
                             AS DECIMAL(27,4))) AS DOUBLE) AS r
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        GROUP BY 1, 2
    ),
    tot AS (
        SELECT s_nationkey,
               CAST(SUM(CAST(r AS DECIMAL(27,4))) AS DOUBLE) AS rt,
               COUNT(*) AS n_suppliers
        FROM rev GROUP BY s_nationkey
    )
    SELECT n.n_name AS nation,
           t.n_suppliers,
           ROUND(CAST(SUM(CAST((rev.r / t.rt) * (rev.r / t.rt)
                               AS DECIMAL(27,12))) AS DOUBLE), 6) AS hhi,
           ROUND(1.0 / t.n_suppliers, 6) AS hhi_floor
    FROM rev
    JOIN tot t ON rev.s_nationkey = t.s_nationkey
    JOIN nation n ON rev.s_nationkey = n.n_nationkey
    GROUP BY n.n_name, t.n_suppliers
    ORDER BY nation
    """,
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier revenue concentration per nation as the
    Herfindahl–Hirschman index (Σ share²) with its theoretical floor
    1/n — the market-structure metric a procurement/risk team tracks
    (HHI → 1 means one supplier owns the nation's volume). Revenue and
    the share denominators are decimal-accumulated so the shares are
    bit-identical; share² sums are decimal-accumulated again (rule 1,
    twice).

    Scale shape: one (nation, supplier)-key revenue aggregation over
    lineitem (map-side partials), a 25-row total join, and a broadcast
    nation-name join — lineitem is scanned once and nothing wider
    than (nation, supplier) crosses an exchange."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
                    "decimal(27,4)"
                )
            )
            .cast("double")
            .alias("r")
        )
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum(F.col("r").cast("decimal(27,4)")).cast("double").alias("rt"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share = F.col("r") / F.col("rt")
    return (
        rev.join(tot, "s_nationkey")
        .join(F.broadcast(nat), rev.s_nationkey == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "n_suppliers")
        .agg(
            F.round(
                F.sum((share * share).cast("decimal(27,12)")).cast("double"), 6
            ).alias("hhi"),
        )
        .select(
            "nation",
            "n_suppliers",
            "hhi",
            F.round(F.lit(1.0) / F.col("n_suppliers"), 6).alias("hhi_floor"),
        )
        .orderBy("nation")
    )


ASOF_TOL_US = 30 * 60 * 1_000_000  # 30-minute as-of tolerance


@query(
    "asof_join_tolerance",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
        WHERE event_type IN ('click', 'purchase')
    ),
    carried AS (
        SELECT user_id, event_type, ts_us,
               MAX(CASE WHEN event_type = 'click' THEN ts_us END)
                   OVER (PARTITION BY user_id ORDER BY ts_us, event_type
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_click_us
        FROM e
    ),
    purchases AS (
        SELECT user_id, ts_us,
               (last_click_us IS NOT NULL
                AND ts_us - last_click_us <= {ASOF_TOL_US}) AS attributed,
               CASE WHEN last_click_us IS NOT NULL
                         AND ts_us - last_click_us <= {ASOF_TOL_US}
                    THEN ts_us - last_click_us END AS gap_us
        FROM carried WHERE event_type = 'purchase'
    )
    SELECT user_id,
           COUNT(*) AS n_purchases,
           CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_attributed,
           CAST(CAST(SUM(gap_us) AS BIGINT) AS DOUBLE)
               / NULLIF(SUM(CASE WHEN attributed THEN 1 ELSE 0 END), 0)
               AS avg_gap_us
    FROM purchases
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of attribution (the tick-data as-of-join
    contract: match the most recent quote/click BEFORE each trade/
    purchase, but only within a freshness window): each purchase is
    attributed to the user's last click at most 30 minutes old.
    Complements asof_join_purchase_click (unbounded backward as-of)
    and event_attribution_last_touch (campaign windows) with the
    max-staleness knob every production as-of join exposes.

    Scale shape: one carried-forward MAX window per user (the same
    single exchange as sessionization — no join at all: the as-of
    pairing IS the window), then a per-user rollup reusing the
    partitioning. Gap sums are exact integer µs; the average is an
    integer-sum / count double division."""
    e = load_events(spark, sf_dir).filter(
        F.col("event_type").isin("click", "purchase")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "event_type")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = e.select(
        "user_id",
        "event_type",
        "ts_us",
        F.max(
            F.when(F.col("event_type") == "click", F.col("ts_us"))
        ).over(w).alias("last_click_us"),
    )
    attributed = F.col("last_click_us").isNotNull() & (
        F.col("ts_us") - F.col("last_click_us") <= ASOF_TOL_US
    )
    purchases = carried.filter(F.col("event_type") == "purchase").select(
        "user_id",
        attributed.alias("attributed"),
        F.when(attributed, F.col("ts_us") - F.col("last_click_us")).alias("gap_us"),
    )
    n_attr = F.sum(F.when(F.col("attributed"), 1).otherwise(0))
    return (
        purchases.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            n_attr.cast("long").alias("n_attributed"),
            (
                F.sum("gap_us").cast("long").cast("double")
                / F.nullif(n_attr, F.lit(0))
            ).alias("avg_gap_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# RFM segmentation (round 6; r9: exact global ranks without a
# SinglePartition window — the orders_abc_pareto two-pass pattern)
# ---------------------------------------------------------------------------

RFM_TILES = 4
RANK_RANGES = 32  # rank-key range partitions; at 100 TB sized so each
                  # range stays executor-sized — output is range-count-
                  # invariant (offsets come from actual per-range counts)


_GSEP = "\x1f"  # group-key separator for _grouped_row_number map keys;
# values containing it are rejected at the probe (key collision)

_MID_LOW33 = (1 << 33) - 1  # monotonically_increasing_id: low 33 bits
# are the record number within the partition, the rest the partition id
# (bounds the pattern at 8.5e9 rows per range — size `ranges` for that)


def _global_row_number(df, order_cols, alias="rn", ranges=RANK_RANGES):
    """Exact global ROW_NUMBER() OVER (ORDER BY *order_cols) without an
    Exchange SinglePartition (orders_abc_pareto r8 pattern, late-r9
    shape): `repartitionByRange` on the rank key makes ranges
    contiguous in rank order, `sortWithinPartitions` fixes the row
    order INSIDE the persist, and `monotonically_increasing_id` then
    reads off (rid = high bits, 1-based local row number = low 33 bits
    + 1) as a pure narrow projection — no per-range window and no
    second corpus exchange (the r8–r9 window-by-rid shape paid a full
    hashpartitioning(rid) re-shuffle of the ALREADY-clustered cache,
    because Catalyst cannot map range partitioning to a
    spark_partition_id clustering). The ≤ `ranges` per-range counts
    are a bounded scalar probe embedded as plan-constant base offsets.
    Returns (frame + `alias` long column + `rid`, total rows).

    The persist is CORRECTNESS-critical, not a tune: repartitionByRange
    samples its bounds and monotonically_increasing_id freezes the
    physical row order, so the offset probe and every consumer must
    read the SAME materialization. Determinism: integer counts;
    callers must pass a TOTAL order (unique tiebreaker), so
    range-bound placement cannot change any rank."""
    order_exprs = [F.asc(c) if isinstance(c, str) else c for c in order_cols]
    ranged = track_persist(
        df.repartitionByRange(ranges, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("rid", F.shiftright(F.col("_mid"), 33).cast("int"))
    )
    counts = sorted(
        ranged.groupBy("rid").agg(F.count(F.lit(1)).alias("c")).collect(),
        key=lambda r: r["rid"],
    )
    off: dict[int, int] = {}
    running = 0
    for r in counts:
        off[r["rid"]] = running
        running += r["c"]
    off_map = F.create_map(
        *[x for rid, o in off.items() for x in (F.lit(rid), F.lit(o).cast("long"))]
    )
    rn = (
        F.element_at(off_map, F.col("rid"))
        + F.col("_mid").bitwiseAND(F.lit(_MID_LOW33))
        + 1
    ).cast("long")
    return ranged.withColumn(alias, rn).drop("_mid"), running


def _ntile_from_rank(rn, n_total: int, tiles: int):
    """Exact NTILE(tiles) bucket from a 1-based global rank: the first
    (n_total mod tiles) buckets hold q+1 = ceil(n_total/tiles) rows,
    the rest hold q — the ANSI spread both Spark's and DuckDB's NTILE
    implement, computed map-side from the rank (counts ≪ 2^52, so the
    floor-division doubles are exact)."""
    q, r = divmod(n_total, tiles)
    if q == 0:  # fewer rows than tiles: every row is its own bucket
        return rn.cast("long")
    thresh = r * (q + 1)
    return (
        F.when(rn <= thresh, F.floor((rn + q) / (q + 1)))
        .otherwise(r + F.floor((rn - thresh + q - 1) / q))
    ).cast("long")


def _ntile_from_rank_col(rn, n, tiles: int):
    """`_ntile_from_rank` with a per-GROUP total carried as a COLUMN
    (the per-lang/per-type case where every group has its own n):
    identical ANSI arithmetic, q/r derived in-row. All inputs are
    counts ≪ 2^52, so each floor of an exact double division is the
    same integer both engines' NTILE produces."""
    q = F.floor(n / tiles).cast("long")
    r = (n - q * F.lit(tiles)).cast("long")
    thresh = r * (q + 1)
    return (
        F.when(q == F.lit(0), rn)
        .when(rn <= thresh, F.floor((rn + q) / (q + 1)))
        .otherwise(r + F.floor((rn - thresh + q - 1) / q))
    ).cast("long")


def _grouped_row_number(
    df, group_cols, order_cols, alias="rn", n_alias=None, ranges=RANK_RANGES
):
    """Exact per-group ROW_NUMBER() OVER (PARTITION BY *group_cols
    ORDER BY *order_cols) for LOW-CARDINALITY groups WITHOUT the
    group-keyed window (which concentrates each group — corpus/|groups|
    rows — onto one task): the generalization of _global_row_number
    that events_rfm_scores fuses inline. One range exchange on
    (group…, order…) makes ranges contiguous per group; the
    ≤ |groups|·ranges per-(group, rid) counts are one bounded scalar
    probe embedded as plan-constant offset/total maps; the row_number
    window is partitioned by (group…, rid) — widest partition
    |df|/ranges, never |df|/|groups|.

    order_cols may be strings or Column sort expressions (F.desc(...)).
    Callers must pass a TOTAL order within each group (unique
    tiebreaker). Group-key encoding (r9 ADVICE hardening): the map
    keys are the SPARK-side string cast of the group columns
    (`_gkey`), taken from the probe rows themselves — never Python
    str() — so types whose Python repr diverges from Spark's cast
    (booleans 'True' vs 'true', doubles, timestamps) are safe by
    construction. NULL group values and values containing the \\x1f
    key separator are REJECTED with a loud ValueError at the probe
    (both would silently corrupt map keys). Returns the persisted
    ranged frame + `alias` (long) [+ `n_alias` = per-group total,
    long] — persist is CORRECTNESS-critical, exactly as in
    _global_row_number (sampled range bounds and the frozen physical
    row order must not re-run).

    Late-r9 shape (shared with _global_row_number): rows inside a
    range are sorted by (group…, order…), so a group's rows are a
    CONTIGUOUS run and monotonically_increasing_id's low 33 bits give
    the in-partition position; the probe folds the group's global
    offset AND minus-the-run-start into ONE plan-constant map value,
    making the per-group rank a pure narrow projection — no window,
    no second corpus exchange."""
    group_cols = list(group_cols)
    order_exprs = [F.asc(c) if isinstance(c, str) else c for c in order_cols]
    gkey = F.concat_ws(_GSEP, *[F.col(c).cast("string") for c in group_cols])
    ranged = track_persist(
        df.repartitionByRange(ranges, *[F.asc(c) for c in group_cols], *order_exprs)
        .sortWithinPartitions(*[F.asc(c) for c in group_cols], *order_exprs)
        .withColumn("_gkey", gkey)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("rid", F.shiftright(F.col("_mid"), 33).cast("int"))
    )
    # `_gkey` is functionally determined by the group columns, so
    # grouping by both costs nothing and hands back the PLAN-side cast
    # string for each group — the map keys below come from these probe
    # rows, so plan and driver can never disagree on the encoding.
    counts = sorted(
        ranged.groupBy(*group_cols, "_gkey", "rid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect(),
        key=lambda r: (r["_gkey"], r["rid"]),
    )
    for r in counts:
        for c in group_cols:
            if r[c] is None:
                raise ValueError(
                    f"_grouped_row_number: NULL group value in column {c!r} — "
                    "NULLs collapse under concat_ws and would corrupt map "
                    "keys; filter or fillna the group columns first"
                )
        if r["_gkey"].count(_GSEP) != len(group_cols) - 1:
            raise ValueError(
                "_grouped_row_number: a group value contains the \\x1f key "
                f"separator (key {r['_gkey']!r}) — distinct group tuples "
                "would collide; escape or re-encode the group columns"
            )
    # adj[g#rid] = (global rank offset of g's rows in rid) − (0-based
    # start of g's contiguous run within rid); rank = adj + local pos.
    # Runs are contiguous because the partition sort leads with the
    # group columns, so run starts are prefix sums of the SAME probe
    # rows re-grouped by rid.
    tot: dict[str, int] = {}
    goff: dict[tuple, int] = {}
    for r in counts:
        k = r["_gkey"]
        goff[(k, r["rid"])] = tot.get(k, 0)
        tot[k] = tot.get(k, 0) + r["c"]
    run_start: dict[tuple, int] = {}
    by_rid: dict[int, int] = {}
    # NATIVE-value sort: must reproduce Spark's ASC order of the group
    # columns within a partition (str() would misorder numeric groups)
    for r in sorted(
        counts, key=lambda r: (r["rid"], tuple(r[c] for c in group_cols))
    ):
        run_start[(r["_gkey"], r["rid"])] = by_rid.get(r["rid"], 0)
        by_rid[r["rid"]] = by_rid.get(r["rid"], 0) + r["c"]
    adj_map = F.create_map(
        *[
            x
            for (k, rid), o in goff.items()
            for x in (
                F.lit(f"{k}#{rid}"),
                F.lit(o - run_start[(k, rid)]).cast("long"),
            )
        ]
    )
    rn = (
        F.element_at(adj_map, F.concat(F.col("_gkey"), F.lit("#"), F.col("rid")))
        + F.col("_mid").bitwiseAND(F.lit(_MID_LOW33))
        + 1
    ).cast("long")
    out = ranged.withColumn(alias, rn)
    if n_alias is not None:
        tot_map = F.create_map(
            *[x for k, n in tot.items() for x in (F.lit(k), F.lit(n).cast("long"))]
        )
        out = out.withColumn(n_alias, F.element_at(tot_map, F.col("_gkey")))
    return out.drop("_mid", "_gkey")


@query(
    "events_rfm_scores",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
    ),
    ref AS (SELECT MAX(ts_us) AS ref_us FROM e),
    per_user AS (
        SELECT user_id,
               (ref.ref_us - MAX(ts_us)) // {US_PER_DAY} AS recency_days,
               COUNT(*) AS frequency,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
                                      THEN CAST(value AS DECIMAL(27,4)) END),
                             0) AS DOUBLE) AS monetary
        FROM e CROSS JOIN ref
        GROUP BY user_id, ref.ref_us
    ),
    scored AS (
        SELECT user_id, monetary,
               CAST(NTILE({RFM_TILES}) OVER (ORDER BY recency_days DESC, user_id)
                    AS BIGINT) AS r_score,
               CAST(NTILE({RFM_TILES}) OVER (ORDER BY frequency, user_id)
                    AS BIGINT) AS f_score,
               CAST(NTILE({RFM_TILES}) OVER (ORDER BY monetary, user_id)
                    AS BIGINT) AS m_score
        FROM per_user
    )
    SELECT r_score, f_score, m_score,
           COUNT(*) AS n_users,
           CAST(SUM(CAST(monetary AS DECIMAL(27,4))) AS DOUBLE) AS sum_monetary
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def events_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value grid: per user,
    Recency (days since last event, vs the corpus max timestamp),
    Frequency (event count) and Monetary (purchase value sum), each
    quartile-scored 1..{RFM_TILES} (higher = better: most recent,
    most frequent, highest spend), then the user count and spend per
    (r, f, m) cell.

    Scale shape (r9, VERDICT r8 #3 — graduated off the global NTILE):
    one user-keyed aggregate (map-side partials, constant-width key)
    computes all three metrics in a single pass; the reference
    timestamp is a broadcast 1-row aggregate. All three exact NTILEs
    then share ONE two-pass ranking (late r9: _grouped_row_number with
    metric as the group): the per-user frame is unioned 3× tagged
    (metric, ascending-normalized key), range-partitioned on (metric,
    key, user_id) so ranges are contiguous per metric, the ≤
    3×RANK_RANGES per-(metric, rid) counts are one bounded scalar
    probe embedded as a plan-constant adjustment map, and the rank is
    a pure NARROW projection off monotonically_increasing_id (no
    window, no second exchange of the 3×|users| union);
    _ntile_from_rank_col recovers the bucket map-side — no Exchange
    SinglePartition anywhere. Hash-identical
    to the single-window NTILE by construction (exact ranks, identical
    ANSI bucket spread). Recency is integer µs div; monetary goes
    through the decimal accumulator at BOTH levels (per-user and
    per-cell) so no double sum's order ever matters; NTILE ties break
    on user_id."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "value", "ts_us"
    )
    ref = ev.agg(F.max("ts_us").alias("ref_us"))
    # persist: the rank chain below reads this frame twice per stage
    # (repartitionByRange's sampling pass + the shuffle itself) — the
    # fact collapse must not re-run per pass
    per_user = track_persist(
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            ((F.first("ref_us") - F.max("ts_us")) / F.lit(US_PER_DAY))
            .cast("long")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("event_type") == "purchase",
                        F.col("value").cast("decimal(27,4)"),
                    )
                ),
                F.lit(0),
            )
            .cast("double")
            .alias("monetary"),
        )
    )
    # ONE range exchange ranks all three metrics: the union tags each
    # per-user row with (metric, key) where key is ascending-normalized
    # (recency DESC ≡ -recency ASC, longs exact in double < 2^52), so
    # ranges are contiguous per metric under the composite sort and one
    # bounded (metric, rid) count probe yields every base offset.
    tagged = (
        per_user.select(
            "user_id",
            "monetary",
            F.lit("r").alias("metric"),
            (-F.col("recency_days")).cast("double").alias("key"),
        )
        .unionAll(
            per_user.select(
                "user_id",
                "monetary",
                F.lit("f").alias("metric"),
                F.col("frequency").cast("double").alias("key"),
            )
        )
        .unionAll(
            per_user.select(
                "user_id",
                "monetary",
                F.lit("m").alias("metric"),
                F.col("monetary").alias("key"),
            )
        )
    )
    ranked = _grouped_row_number(
        tagged,
        ["metric"],
        [F.asc("key"), F.asc("user_id")],
        alias="rank",
        n_alias="n_m",
    )
    scored_long = ranked.select(
        "user_id",
        "monetary",
        "metric",
        _ntile_from_rank_col(F.col("rank"), F.col("n_m"), RFM_TILES).alias("score"),
    )
    scored = scored_long.groupBy("user_id").agg(
        F.max("monetary").alias("monetary"),
        F.max(F.when(F.col("metric") == "r", F.col("score"))).alias("r_score"),
        F.max(F.when(F.col("metric") == "f", F.col("score"))).alias("f_score"),
        F.max(F.when(F.col("metric") == "m", F.col("score"))).alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("monetary").cast("decimal(27,4)"))
            .cast("double")
            .alias("sum_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# Power-user concentration (round 6)
# ---------------------------------------------------------------------------

TOP_SHARE_PCT = 10  # "top X% of users" concentration band


@query(
    "events_power_user_concentration",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    ),
    tot AS (
        SELECT COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT) AS n_events,
               CAST(CEIL(COUNT(*) * {TOP_SHARE_PCT} / 100.0) AS BIGINT) AS k_top
        FROM per_user
    ),
    ranked AS (
        SELECT n, ROW_NUMBER() OVER (ORDER BY n DESC, user_id) AS r
        FROM per_user
    ),
    top AS (
        SELECT CAST(SUM(ranked.n) AS BIGINT) AS top_events
        FROM ranked CROSS JOIN tot WHERE ranked.r <= tot.k_top
    )
    SELECT tot.n_users, tot.n_events, tot.k_top,
           CAST(quantile_cont(per_user.n, 0.5) AS DOUBLE) AS p50,
           CAST(quantile_cont(per_user.n, 0.9) AS DOUBLE) AS p90,
           CAST(quantile_cont(per_user.n, 0.99) AS DOUBLE) AS p99,
           CAST(MAX(per_user.n) AS BIGINT) AS max_events,
           ROUND(top.top_events * 1.0 / tot.n_events, 6) AS top_share
    FROM per_user CROSS JOIN tot CROSS JOIN top
    GROUP BY tot.n_users, tot.n_events, tot.k_top, top.top_events
    """,
)
def events_power_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic-concentration audit: the per-user event-count
    distribution (P50/P90/P99/max) plus the share of ALL events
    generated by the top {TOP_SHARE_PCT}% heaviest users — the number
    that predicts hot-key skew in every user_id-keyed shuffle
    downstream (and the first thing to check before sizing salting
    thresholds like interval_overlap_users').

    Scale shape (r9, VERDICT r8 #4 — graduated off the global
    ROW_NUMBER): one user-keyed count (map-side partials); the
    percentile + max aggregate runs over |users| rows; the top-k rank
    over the same |users|-row table is the two-pass _global_row_number
    (range-partitioned local windows + plan-constant base offsets — no
    Exchange SinglePartition), hash-identical to the single-window
    rank by construction. A global sort of the AGGREGATE, never of the
    raw events; output is one row. Determinism: integer counts;
    quantile_cont ≙ F.percentile (both linear interpolation on exact
    integers); ranking ties break on user_id; shares are single double
    divisions."""
    ev = load_events(spark, sf_dir).select("user_id")
    per_user = track_persist(
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    )
    tot = per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").cast("long").alias("n_events"),
        F.ceil(F.count(F.lit(1)) * TOP_SHARE_PCT / 100.0)
        .cast("long")
        .alias("k_top"),
    )
    ranked_rr, _n = _global_row_number(
        per_user, [F.desc("n"), F.asc("user_id")], alias="r"
    )
    ranked = ranked_rr.select("n", "r")
    top = (
        ranked.crossJoin(F.broadcast(tot.select("k_top")))
        .filter(F.col("r") <= F.col("k_top"))
        .agg(F.sum("n").cast("long").alias("top_events"))
    )
    dist = per_user.agg(
        F.percentile("n", F.lit(0.5)).cast("double").alias("p50"),
        F.percentile("n", F.lit(0.9)).cast("double").alias("p90"),
        F.percentile("n", F.lit(0.99)).cast("double").alias("p99"),
        F.max("n").cast("long").alias("max_events"),
    )
    return (
        tot.crossJoin(F.broadcast(dist))
        .crossJoin(F.broadcast(top))
        .select(
            "n_users",
            "n_events",
            "k_top",
            "p50",
            "p90",
            "p99",
            "max_events",
            F.round(F.col("top_events") * F.lit(1.0) / F.col("n_events"), 6).alias(
                "top_share"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Funnel time-to-convert (round 6)
# ---------------------------------------------------------------------------


@query(
    "event_funnel_latency",
    oracle="""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
    ),
    w1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN ts_us END)
                      OVER (PARTITION BY user_id) AS v
        FROM e
    ),
    w2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts_us >= v THEN ts_us END)
                      OVER (PARTITION BY user_id) AS c
        FROM w1
    ),
    w3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts_us >= c THEN ts_us END)
                      OVER (PARTITION BY user_id) AS p
        FROM w2
    ),
    u AS (
        SELECT user_id, MAX(v) AS v, MAX(c) AS c, MAX(p) AS p
        FROM w3 GROUP BY user_id
    ),
    lat AS (
        SELECT 'view_to_click' AS stage, c - v AS lat_us FROM u WHERE c IS NOT NULL
        UNION ALL
        SELECT 'click_to_purchase', p - c FROM u WHERE p IS NOT NULL
    )
    SELECT stage,
           COUNT(*) AS n_users,
           ROUND(CAST(quantile_cont(lat_us, 0.5) AS DOUBLE) / 1000000.0, 6) AS p50_s,
           ROUND(CAST(quantile_cont(lat_us, 0.9) AS DOUBLE) / 1000000.0, 6) AS p90_s,
           ROUND(CAST(MAX(lat_us) AS DOUBLE) / 1000000.0, 6) AS max_s
    FROM lat
    GROUP BY stage
    ORDER BY stage
    """,
)
def event_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert between funnel stages: for users who progressed,
    the latency from first view to the first click at-or-after it, and
    from that click to the first purchase at-or-after it — P50/P90/max
    in seconds. The "how fast" companion to event_funnel_conversion's
    "how many": the number a growth team reads before changing a flow.

    Scale shape: the same single user_id window exchange as the funnel
    (three chained conditional MINs), one per-user rollup, then
    percentiles over the per-USER latency table (|converted users|
    rows, never raw events). Latencies are exact integer µs;
    percentile ≙ quantile_cont (linear interpolation on exact ints);
    the /1e6 is one IEEE division after interpolation."""
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "ts_us")
    wu = W.partitionBy("user_id")
    v = F.min(F.when(F.col("event_type") == "view", F.col("ts_us"))).over(wu)
    e1 = ev.withColumn("v", v)
    c = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts_us") >= F.col("v")),
            F.col("ts_us"),
        )
    ).over(wu)
    e2 = e1.withColumn("c", c)
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts_us") >= F.col("c")),
            F.col("ts_us"),
        )
    ).over(wu)
    e3 = e2.withColumn("p", p)
    # persist the per-user rollup: both latency branches read it, and
    # without the boundary each would re-run the events scan + the
    # three-window exchange (the winnowing projection-collapse lesson)
    u = track_persist(
        e3.groupBy("user_id").agg(
            F.max("v").alias("v"), F.max("c").alias("c"), F.max("p").alias("p")
        )
    )
    lat = (
        u.filter(F.col("c").isNotNull())
        .select(F.lit("view_to_click").alias("stage"), (F.col("c") - F.col("v")).alias("lat_us"))
        .unionByName(
            u.filter(F.col("p").isNotNull()).select(
                F.lit("click_to_purchase").alias("stage"),
                (F.col("p") - F.col("c")).alias("lat_us"),
            )
        )
    )
    return (
        lat.groupBy("stage")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(
                F.percentile("lat_us", F.lit(0.5)).cast("double") / 1e6, 6
            ).alias("p50_s"),
            F.round(
                F.percentile("lat_us", F.lit(0.9)).cast("double") / 1e6, 6
            ).alias("p90_s"),
            F.round(F.max("lat_us").cast("double") / 1e6, 6).alias("max_s"),
        )
        .orderBy("stage")
    )


# ---------------------------------------------------------------------------
# Top event paths (round 6)
# ---------------------------------------------------------------------------

PATH_LEN = 3   # first-k event types per user form the path
PATH_TOP = 10


@query(
    "events_top_paths",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, epoch_us(ts) AS ts_us, event_id FROM events
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                     ORDER BY ts_us, event_id) AS rn
        FROM e
    ),
    paths AS (
        SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        FROM r WHERE rn <= {PATH_LEN} GROUP BY user_id
    ),
    counts AS (SELECT path, COUNT(*) AS n_users FROM paths GROUP BY path)
    SELECT path, n_users,
           CAST(ROW_NUMBER() OVER (ORDER BY n_users DESC, path) AS BIGINT) AS rnk
    FROM counts
    QUALIFY rnk <= {PATH_TOP}
    ORDER BY rnk
    """,
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first {PATH_LEN} event types (in
    event-time order, event_id tiebreak) joined into a path string,
    ranked by how many users share the path — the path-analysis view
    behind every onboarding-flow dashboard.

    Scale shape: one user-keyed window (rank within user — the same
    exchange the funnel family uses), one per-user rollup, then a
    |distinct paths|-row count (paths are length-{PATH_LEN} over a
    4-symbol alphabet: ≤ 64 + shorter prefixes). The final top-k
    window runs over that metadata-sized table. Determinism: integer
    ranks with full tiebreaks (event_id within user, path string
    across paths)."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    wu = W.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    firstk = (
        ev.withColumn("rn", F.row_number().over(wu))
        .filter(F.col("rn") <= PATH_LEN)
    )
    paths = firstk.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                lambda p: p["event_type"],
            ),
        ).alias("path")
    )
    counts = paths.groupBy("path").agg(F.count(F.lit(1)).alias("n_users"))
    wr = W.orderBy(F.desc("n_users"), F.asc("path"))
    return (
        counts.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= PATH_TOP)
        .select("path", "n_users", "rnk")
        .orderBy("rnk")
    )


def _inter_arrival_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event gap (µs) since the SAME user's previous action of any
    type — the shared input of events_inter_arrival_percentiles and
    its rank-helper scale probe (plans/scale_probes.py). One per-user
    window: hash exchange on user_id, gaps computed map-side."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "event_id", "ts_us"
    )
    gap = F.col("ts_us") - F.lag("ts_us").over(
        W.partitionBy("user_id").orderBy("ts_us", "event_id")
    )
    return ev.select("event_type", gap.alias("gap_us"), "event_id").filter(
        F.col("gap_us").isNotNull()
    )


@query(
    "events_inter_arrival_percentiles",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               CAST(epoch_us(ts) AS BIGINT)
                 - LAG(CAST(epoch_us(ts) AS BIGINT)) OVER (
                       PARTITION BY user_id
                       ORDER BY CAST(epoch_us(ts) AS BIGINT), event_id)
                 AS gap_us
        FROM events
    ),
    g AS (
        SELECT event_type, gap_us,
               row_number() OVER (PARTITION BY event_type ORDER BY gap_us)
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM seq WHERE gap_us IS NOT NULL
    ),
    a AS (
        SELECT event_type,
               CAST(MAX(n) AS BIGINT) AS n_gaps,
               MAX(CASE WHEN rn = ((n-1)*50)//100 + 1 THEN gap_us END) AS lo50,
               MAX(CASE WHEN rn = ((n-1)*50)//100 + 2 THEN gap_us END) AS hi50,
               MAX(CASE WHEN rn = ((n-1)*90)//100 + 1 THEN gap_us END) AS lo90,
               MAX(CASE WHEN rn = ((n-1)*90)//100 + 2 THEN gap_us END) AS hi90,
               MAX(CASE WHEN rn = ((n-1)*99)//100 + 1 THEN gap_us END) AS lo99,
               MAX(CASE WHEN rn = ((n-1)*99)//100 + 2 THEN gap_us END) AS hi99,
               MAX(gap_us) AS max_gap_us
        FROM g GROUP BY event_type
    )
    SELECT event_type, n_gaps,
           CAST(lo50*(100 - ((n_gaps-1)*50)%100)
                + COALESCE(hi50, lo50)*(((n_gaps-1)*50)%100)
                AS DOUBLE) / 100 AS p50_us,
           CAST(lo90*(100 - ((n_gaps-1)*90)%100)
                + COALESCE(hi90, lo90)*(((n_gaps-1)*90)%100)
                AS DOUBLE) / 100 AS p90_us,
           CAST(lo99*(100 - ((n_gaps-1)*99)%100)
                + COALESCE(hi99, lo99)*(((n_gaps-1)*99)%100)
                AS DOUBLE) / 100 AS p99_us,
           max_gap_us
    FROM a ORDER BY event_type
    """,
)
def events_inter_arrival_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival-time distribution per event type: for each event,
    the gap since the SAME USER's previous action (any type), rolled
    up into exact p50/p90/p99 — the latency-of-engagement profile that
    sets sessionization gap thresholds and streaming watermark widths
    empirically instead of by folklore (the p99 IS the watermark you
    need to keep 99% of late joins).

    Scale shape: one per-user window (hash exchange on user_id, the
    partitioning every other per-user analytic here reuses) computes
    gaps map-side; the per-type gap ranking then runs as a
    _grouped_row_number two-pass (late r9) — event_type has a
    HANDFUL of values, so the old PARTITION BY event_type window put
    |gaps|/|types| ≈ corpus-scale rows on single tasks; the two-pass
    range-partitions on (event_type, gap_us, event_id) instead, so
    the widest task is |gaps|/ranges. One conditional aggregation
    picks the two bracketing order statistics per quantile.

    Determinism: built-in percentile/quantile_cont interpolate in
    doubles whose ULP at µs magnitudes (~3e-5 at 1e11) exceeds any
    rounding guard — measured flaky at sf0.1. Instead the
    interpolated quantile is computed EXACTLY: pos = (n-1)·q%,
    r = pos mod 100, p = (v_lo·(100−r) + v_hi·r)/100 — a BIGINT
    numerator < 2^53, so the one double division is correctly
    rounded and bit-identical on both engines. The event_id
    tiebreaker makes the two-pass rank total-ordered; the oracle's
    ROW_NUMBER breaks gap ties arbitrarily, but tied ranks hold THE
    SAME gap value, so every value-at-rank the aggregation reads is
    tie-order-invariant."""
    seq = _inter_arrival_gaps(spark, sf_dir)
    g = _grouped_row_number(
        seq,
        ["event_type"],
        [F.asc("gap_us"), F.asc("event_id")],
        alias="rn",
        n_alias="n",
    )

    def _lo_rn(q: int):  # 1-indexed rank of the lower bracketing value
        return F.expr(f"((n - 1) * {q}) div 100") + F.lit(1)

    aggs = [F.max("n").alias("n_gaps")]
    for q in (50, 90, 99):
        aggs.append(
            F.max(F.when(F.col("rn") == _lo_rn(q), F.col("gap_us"))).alias(f"lo{q}")
        )
        aggs.append(
            F.max(
                F.when(F.col("rn") == _lo_rn(q) + F.lit(1), F.col("gap_us"))
            ).alias(f"hi{q}")
        )
    aggs.append(F.max("gap_us").alias("max_gap_us"))
    a = g.groupBy("event_type").agg(*aggs)

    def _p(q: int):
        r = ((F.col("n_gaps") - F.lit(1)) * F.lit(q)) % F.lit(100)
        num = F.col(f"lo{q}") * (F.lit(100) - r) + F.coalesce(
            F.col(f"hi{q}"), F.col(f"lo{q}")
        ) * r
        return (num.cast("double") / F.lit(100)).alias(f"p{q}_us")

    return a.select(
        "event_type", "n_gaps", _p(50), _p(90), _p(99), "max_gap_us"
    ).orderBy("event_type")


@query(
    "events_peak_concurrency",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us FROM events
    ),
    flag AS (
        SELECT user_id, ts_us,
               CASE WHEN ts_us - LAG(ts_us) OVER (
                        PARTITION BY user_id ORDER BY ts_us)
                    > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s
        FROM ev
    ),
    sess AS (
        SELECT user_id, ts_us,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flag
    ),
    iv AS (
        SELECT user_id, sid, MIN(ts_us) AS s,
               MAX(ts_us) + {_SESSION_GAP_US} AS e
        FROM sess GROUP BY user_id, sid
    ),
    seg AS (
        SELECT d.day_num,
               GREATEST(iv.s, d.day_num * {US_PER_DAY}) AS seg_s,
               LEAST(iv.e, (d.day_num + 1) * {US_PER_DAY}) AS seg_e
        FROM iv, LATERAL (
            SELECT unnest(generate_series(iv.s // {US_PER_DAY},
                                          (iv.e - 1) // {US_PER_DAY}))
                   AS day_num
        ) d
    ),
    b AS (
        SELECT day_num, seg_s AS ts_us, 1 AS delta FROM seg
        UNION ALL
        SELECT day_num, seg_e AS ts_us, -1 AS delta FROM seg
    ),
    run AS (
        SELECT day_num, delta,
               SUM(delta) OVER (PARTITION BY day_num
                                ORDER BY ts_us, delta
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM b
    )
    SELECT day_num,
           CAST(MAX(cum) AS BIGINT) AS peak_concurrency,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_session_segments,
           CAST(COUNT(*) AS BIGINT) AS n_boundaries
    FROM run GROUP BY day_num ORDER BY day_num
    """,
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak CONCURRENT sessions per day — the capacity-planning number
    (licenses, connection pools, serving replicas are all sized off
    it). Sessions are the 30-min-gap intervals the `sessionization`
    query defines, held open one gap past the last event; a session is
    clipped into per-day segments, each segment contributes a +1/-1
    boundary pair, and the peak is the max of the running boundary sum
    — the classic interval-sweep, evaluated distributed.

    Scale shape: the sweep's prefix sum is TWO-PASS like
    sequence_packing — boundaries partition by (day, hour); per-hour
    delta totals (a 24-rows/day metadata table) carry the base offset
    via a tiny window, and the wide data only ever does a (day, hour)
    window over its own hour — no single-task per-day scan. Session
    building reuses the per-user sessionization exchange; the day
    explode is bounded by session span (gap-bounded sessions rarely
    cross two midnights).

    Determinism: all integers. Equal-timestamp boundaries are ordered
    (ts, delta) so session ends process before starts — the [s, e)
    convention — and equal (ts, delta) rows yield the same prefix
    multiset in any order, so MAX(cum) is exact on both engines."""
    ev = load_events(spark, sf_dir).select("user_id", "ts_us")
    wf = W.partitionBy("user_id").orderBy("ts_us")
    new_s = F.when(
        F.col("ts_us") - F.lag("ts_us").over(wf) > _SESSION_GAP_US, 1
    ).otherwise(0)
    sess = ev.select(
        "user_id",
        "ts_us",
        F.sum(new_s).over(wf.rowsBetween(W.unboundedPreceding, 0)).alias("sid"),
    )
    iv = sess.groupBy("user_id", "sid").agg(
        F.min("ts_us").alias("s"),
        (F.max("ts_us") + F.lit(_SESSION_GAP_US)).alias("e"),
    )
    seg = iv.select(
        F.explode(
            F.sequence(
                F.expr(f"s div {US_PER_DAY}"),
                F.expr(f"(e - 1) div {US_PER_DAY}"),
            )
        ).alias("day_num"),
        "s",
        "e",
    ).select(
        "day_num",
        F.greatest(F.col("s"), F.col("day_num") * US_PER_DAY).alias("seg_s"),
        F.least(F.col("e"), (F.col("day_num") + 1) * US_PER_DAY).alias("seg_e"),
    )
    # one explode per segment (not a self-union, which would re-run the
    # whole session pipeline once per branch — measured two full events
    # scans in the AQE plan before this shape)
    b = seg.select(
        "day_num",
        F.explode(
            F.array(
                F.struct(
                    F.col("seg_s").alias("ts_us"), F.lit(1).alias("delta")
                ),
                F.struct(
                    F.col("seg_e").alias("ts_us"), F.lit(-1).alias("delta")
                ),
            )
        ).alias("bd"),
    ).select("day_num", "bd.ts_us", "bd.delta").withColumn(
        # hour RELATIVE to the row's day (0..24): a segment end falling
        # exactly on next-midnight must sort AFTER hour 23 of its own
        # day (hr=24), not wrap to hr=0 via hour-of-timestamp.
        "hr",
        F.expr(f"(ts_us - day_num * {US_PER_DAY}) div {US_PER_HOUR}"),
    )
    b = track_persist(b)
    # pass 1: per-(day, hour) delta totals -> cumulative base offset
    # over the 24-rows/day metadata table (window partitions by day
    # over hours, never over boundary rows).
    wh = W.partitionBy("day_num").orderBy("hr").rowsBetween(
        W.unboundedPreceding, -1
    )
    base = (
        b.groupBy("day_num", "hr")
        .agg(F.sum("delta").alias("htot"))
        .withColumn("base", F.coalesce(F.sum("htot").over(wh), F.lit(0)))
        .select("day_num", "hr", "base")
    )
    # pass 2: local running sum within (day, hour) + carried base.
    wl = (
        W.partitionBy("day_num", "hr")
        .orderBy("ts_us", "delta")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    run = b.join(base, ["day_num", "hr"]).select(
        "day_num",
        "delta",
        (F.col("base") + F.sum("delta").over(wl)).alias("cum"),
    )
    return (
        run.groupBy("day_num")
        .agg(
            F.max("cum").cast("long").alias("peak_concurrency"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_session_segments"),
            F.count(F.lit(1)).alias("n_boundaries"),
        )
        .orderBy("day_num")
    )


@query(
    "events_value_twap_daily",
    oracle=f"""
    WITH ev AS (
        SELECT event_type, event_id, value,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us,
               CAST(epoch_us(ts) AS BIGINT) // {US_PER_DAY} AS day_num
        FROM events
    ),
    seg AS (
        SELECT event_type, day_num, value,
               LEAD(ts_us) OVER (PARTITION BY event_type, day_num
                                 ORDER BY ts_us, event_id) - ts_us
                 AS gap_us
        FROM ev
    )
    SELECT event_type, day_num,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(gap_us) AS BIGINT) AS covered_us,
           ROUND({sql_dsum('value * gap_us', 6)}
                 / CAST(SUM(gap_us) AS BIGINT), 9) AS twap,
           ROUND({sql_davg('value', 6)}, 9) AS simple_avg
    FROM seg WHERE gap_us IS NOT NULL AND gap_us > 0
    GROUP BY event_type, day_num
    ORDER BY event_type, day_num
    """,
)
def events_value_twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event `value` per (event_type,
    day): each observation is held until the next same-type event that
    day, and the average weights by holding time — TWAP, the estimator
    that is correct on IRREGULARLY-SAMPLED series where the naive mean
    over-counts bursts (a price/metric sampled 100x in one busy minute
    should not dominate the day). simple_avg rides along to show the
    bias the weighting removes.

    Scale shape: one (event_type, day) window computes holding gaps
    map-side after its exchange, and the rollup groups by the SAME
    keys — AQE reuses the window's hash partitioning, so the corpus
    crosses the wire once. Day-final observations (no successor that
    day) drop out, bounding state to the day.

    Determinism: gaps are exact integer µs with (ts, event_id) tie
    order pinned; value·gap is one IEEE product per row,
    decimal-accumulated (rule 1); the TWAP division is a single
    correctly-rounded op over identical operands."""
    ev = load_events(spark, sf_dir).select(
        "event_type",
        "event_id",
        "value",
        "ts_us",
        F.expr(f"ts_us div {US_PER_DAY}").alias("day_num"),
    )
    w = W.partitionBy("event_type", "day_num").orderBy("ts_us", "event_id")
    seg = ev.select(
        "event_type",
        "day_num",
        "value",
        (F.lead("ts_us").over(w) - F.col("ts_us")).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull() & (F.col("gap_us") > 0))
    return (
        seg.groupBy("event_type", "day_num")
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.sum("gap_us").cast("long").alias("covered_us"),
            F.round(
                dsum(F.col("value") * F.col("gap_us"), 6)
                / F.sum("gap_us").cast("long"),
                9,
            ).alias("twap"),
            F.round(
                (
                    F.sum(F.col("value").cast("decimal(27,6)")).cast("double")
                    / F.count("value")
                ),
                9,
            ).alias("simple_avg"),
        )
        .orderBy("event_type", "day_num")
    )


@query(
    "event_attribution_linear",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_type, value,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us
        FROM events
    ),
    marked AS (
        SELECT *,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'view' THEN 1 END)
                   OVER w, 0) AS BIGINT) AS n_view,
               CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END)
                   OVER w, 0) AS BIGINT) AS n_click
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN {ATTR_WINDOW_US} PRECEDING
                           AND 1 PRECEDING)
    ),
    p AS (
        SELECT value, n_view, n_click, n_view + n_click AS n_touch
        FROM marked WHERE event_type = 'purchase'
    ),
    credits AS (
        SELECT 'view' AS channel, value * n_view / n_touch AS credit,
               n_view AS n_t FROM p WHERE n_view > 0
        UNION ALL
        SELECT 'click', value * n_click / n_touch, n_click
        FROM p WHERE n_click > 0
        UNION ALL
        SELECT 'none', value, 0 FROM p WHERE n_touch = 0
    )
    SELECT channel,
           COUNT(*)::BIGINT AS n_purchases,
           {sql_dsum('credit', 6)} AS credited_revenue,
           CAST(SUM(n_t) AS BIGINT) AS total_touches
    FROM credits GROUP BY channel ORDER BY channel
    """,
)
def event_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: each purchase splits its value
    across ALL view/click touches by the same user in the 24 h
    lookback, proportional to touch counts — the fairness-across-the-
    journey model that complements `event_attribution_last_touch`
    (which hands everything to the final touch). Purchases with no
    in-window touch stay in the 'none' bucket at full value, so the
    two models reconcile to the same total revenue.

    Scale shape: touch counts come from one VALUE-RANGE window frame
    over the per-user exchange (the same partitioning the funnel and
    last-touch reuse) — no self-join against the touch log, so the
    plan never materializes purchase×touch pairs; per-purchase output
    is ≤2 constant-width rows and the rollup key has 3 values.

    Determinism: range frames are value-based, so equal-timestamp tie
    ORDER cannot change the counts (ends at 1 PRECEDING excludes the
    purchase instant on both engines); each credit is the pinned IEEE
    tree (value·n)/n_touch over exact integers; credits
    decimal-accumulate (rule 1)."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "value", "ts_us"
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ATTR_WINDOW_US, -1)
    )
    n_view = F.coalesce(
        F.sum(F.when(F.col("event_type") == "view", 1)).over(w), F.lit(0)
    ).cast("long")
    n_click = F.coalesce(
        F.sum(F.when(F.col("event_type") == "click", 1)).over(w), F.lit(0)
    ).cast("long")
    p = (
        ev.select("event_type", "value", n_view.alias("n_view"), n_click.alias("n_click"))
        .filter(F.col("event_type") == "purchase")
        .withColumn("n_touch", F.col("n_view") + F.col("n_click"))
    )
    entries = F.array(
        F.when(
            F.col("n_view") > 0,
            F.struct(
                F.lit("view").alias("channel"),
                (F.col("value") * F.col("n_view") / F.col("n_touch")).alias(
                    "credit"
                ),
                F.col("n_view").alias("n_t"),
            ),
        ),
        F.when(
            F.col("n_click") > 0,
            F.struct(
                F.lit("click").alias("channel"),
                (F.col("value") * F.col("n_click") / F.col("n_touch")).alias(
                    "credit"
                ),
                F.col("n_click").alias("n_t"),
            ),
        ),
        F.when(
            F.col("n_touch") == 0,
            F.struct(
                F.lit("none").alias("channel"),
                F.col("value").alias("credit"),
                F.lit(0).cast("long").alias("n_t"),
            ),
        ),
    )
    credits = p.select(
        F.explode(F.filter(entries, lambda x: x.isNotNull())).alias("cr")
    ).select("cr.*")
    return (
        credits.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            dsum("credit", 6, alias="credited_revenue"),
            F.sum("n_t").cast("long").alias("total_touches"),
        )
        .orderBy("channel")
    )
