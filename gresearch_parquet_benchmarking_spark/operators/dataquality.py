"""Declarative data-quality constraint suite — the Deequ/Great-
Expectations-shaped validation pass a production pipeline runs on
every ingest before letting data downstream (Schelter et al. 2018,
"Automating Large-Scale Data Quality Verification", VLDB — the Spark
system this operator models).

One query = one suite: each constraint evaluates to a single audit row
(constraint, table, rows checked, violations, pass flag), and the
suite is the union. Constraints cover the canonical families:

* uniqueness        — primary key duplicate count
* completeness      — NOT NULL coverage
* referential       — orphan foreign keys (anti-join)
* domain            — value ∈ enumerated set
* range             — numeric bounds
* format            — regex shape of a string payload
* consistency       — cross-column functional dependency

Scale shape: every membership/range/format check is a map-side
predicate folded into ONE aggregation per table (no per-constraint
rescan of the same table: violations are conditional sums sharing a
single pass). The only join is the referential check — a key-only
anti join Spark plans as broadcast or shuffled-hash by size. The
result is O(#constraints) rows regardless of data volume, and the
whole suite is embarrassingly parallel across tables at 100 TB.

Determinism: every output is an integer count or a boolean derived
from one — no floats anywhere.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import query
from gresearch_parquet_benchmarking_spark.sources.events import load_events
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

_PROPS_RE = '^\\{"k": [0-9]+\\}$'


def _row(constraint: str, tbl: str, n_rows, n_viol) -> list:
    return [
        F.lit(constraint).alias("check_name"),
        F.lit(tbl).alias("tbl"),
        n_rows.cast("long").alias("n_rows"),
        n_viol.cast("long").alias("n_violations"),
        (n_viol == 0).alias("passed"),
    ]


def _viol(cond) -> F.Column:
    """Conditional violation counter: rows where ``cond`` (the
    VIOLATION predicate) holds; NULL predicate counts as violation."""
    return F.sum(F.when(F.coalesce(cond, F.lit(True)), 1).otherwise(0))


@query(
    "dq_constraint_suite",
    oracle=f"""
    WITH o AS (
        SELECT COUNT(*) AS n,
               COUNT(*) - COUNT(DISTINCT o_orderkey) AS dup_pk,
               CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P')
                             THEN 0 ELSE 1 END) AS BIGINT) AS bad_status,
               CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice <= 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_price
        FROM orders
    ),
    l AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS null_qty,
               CAST(SUM(CASE WHEN l_discount IS NULL
                              OR l_discount < 0 OR l_discount > 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc
        FROM lineitem
    ),
    orph AS (
        SELECT COUNT(*) AS n_orphans
        FROM lineitem li
        WHERE NOT EXISTS (SELECT 1 FROM orders oo
                          WHERE oo.o_orderkey = li.l_orderkey)
    ),
    e AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CASE WHEN props IS NULL
                              OR NOT regexp_matches(props, '{_PROPS_RE}')
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_props
        FROM events
    ),
    d AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CASE WHEN n_chars IS NULL OR text IS NULL
                              OR n_chars != LENGTH(text)
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_len
        FROM documents
    )
    SELECT * FROM (
        SELECT 'pk_unique' AS check_name, 'orders' AS tbl,
               o.n AS n_rows, CAST(o.dup_pk AS BIGINT) AS n_violations,
               o.dup_pk = 0 AS passed FROM o
        UNION ALL
        SELECT 'status_domain', 'orders', o.n, o.bad_status,
               o.bad_status = 0 FROM o
        UNION ALL
        SELECT 'price_positive', 'orders', o.n, o.bad_price,
               o.bad_price = 0 FROM o
        UNION ALL
        SELECT 'qty_complete', 'lineitem', l.n, l.null_qty,
               l.null_qty = 0 FROM l
        UNION ALL
        SELECT 'discount_range', 'lineitem', l.n, l.bad_disc,
               l.bad_disc = 0 FROM l
        UNION ALL
        SELECT 'orderkey_ri', 'lineitem', l.n,
               CAST(orph.n_orphans AS BIGINT),
               orph.n_orphans = 0 FROM l CROSS JOIN orph
        UNION ALL
        SELECT 'props_format', 'events', e.n, e.bad_props,
               e.bad_props = 0 FROM e
        UNION ALL
        SELECT 'nchars_consistent', 'documents', d.n, d.bad_len,
               d.bad_len = 0 FROM d
    ) u
    ORDER BY check_name
    """,
)
def dq_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the full constraint suite; one audit row per constraint.
    Per-table constraints share a single scan (conditional sums in one
    aggregate); the referential check anti-joins lineitem's key column
    against orders' key column only."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # events through the schema-adaptive loader (CLAUDE.md rule 4) even
    # though only props is read — the raw footer's TIMESTAMP(NANOS)
    # layout must never leak into a query's analysis
    ev = load_events(spark, sf_dir)
    doc = load_table(spark, sf_dir, "documents")

    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("dup_pk"),
        _viol(~F.col("o_orderstatus").isin("O", "F", "P")).alias("bad_status"),
        _viol(F.col("o_totalprice") <= 0).alias("bad_price"),
    )
    l = li.agg(
        F.count(F.lit(1)).alias("n"),
        _viol(F.col("l_quantity").isNull()).alias("null_qty"),
        _viol((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias("bad_disc"),
    )
    orph = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    e = ev.agg(
        F.count(F.lit(1)).alias("n"),
        _viol(~F.col("props").rlike(_PROPS_RE)).alias("bad_props"),
    )
    d = doc.agg(
        F.count(F.lit(1)).alias("n"),
        _viol(F.col("n_chars") != F.length("text")).alias("bad_len"),
    )

    rows = [
        o.select(*_row("pk_unique", "orders", F.col("n"), F.col("dup_pk"))),
        o.select(*_row("status_domain", "orders", F.col("n"), F.col("bad_status"))),
        o.select(*_row("price_positive", "orders", F.col("n"), F.col("bad_price"))),
        l.select(*_row("qty_complete", "lineitem", F.col("n"), F.col("null_qty"))),
        l.select(*_row("discount_range", "lineitem", F.col("n"), F.col("bad_disc"))),
        l.crossJoin(F.broadcast(orph)).select(
            *_row("orderkey_ri", "lineitem", F.col("n"), F.col("n_orphans"))
        ),
        e.select(*_row("props_format", "events", F.col("n"), F.col("bad_props"))),
        d.select(*_row("nchars_consistent", "documents", F.col("n"), F.col("bad_len"))),
    ]
    return reduce(lambda a, b: a.unionByName(b), rows).orderBy("check_name")


FRESHNESS_STALE_US = 24 * 3600 * 1_000_000  # stale = lagging > 1 day


@query(
    "events_freshness_lag",
    oracle=f"""
    WITH per_type AS (
        SELECT event_type,
               MAX(CAST(epoch_us(ts) AS BIGINT)) AS max_ts_us,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY event_type
    ),
    g AS (SELECT MAX(max_ts_us) AS gmax FROM per_type)
    SELECT per_type.event_type, per_type.n_events,
           per_type.max_ts_us,
           g.gmax - per_type.max_ts_us AS lag_us,
           (g.gmax - per_type.max_ts_us) // 60000000 AS lag_minutes,
           g.gmax - per_type.max_ts_us > {FRESHNESS_STALE_US} AS stale
    FROM per_type CROSS JOIN g
    ORDER BY event_type
    """,
)
def events_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stream freshness monitor: how far each event type's newest
    record lags the newest record overall — the first DQ check every
    ingestion SLA dashboard runs (a topic whose max timestamp stalls
    a day behind the rest means its producer, not the pipeline, is
    down). Integer epoch-µs end to end; the stale flag fires at 24 h.

    Scale shape: one map-side-combinable MAX/COUNT per event type
    (constant-width keys), then a broadcast of the 1-row global MAX
    onto the type-count-sized aggregate — the corpus is scanned once
    and nothing row-sized ever joins or shuffles."""
    ev = load_events(spark, sf_dir).select("event_type", "ts_us")
    per_type = ev.groupBy("event_type").agg(
        F.max("ts_us").alias("max_ts_us"),
        F.count(F.lit(1)).alias("n_events"),
    )
    g = per_type.agg(F.max("max_ts_us").alias("gmax"))
    lag = F.col("gmax") - F.col("max_ts_us")
    return (
        per_type.crossJoin(F.broadcast(g))
        .select(
            "event_type",
            "n_events",
            "max_ts_us",
            lag.alias("lag_us"),
            # integer div only: double division corrupts µs-scale values
            F.expr("(gmax - max_ts_us) div 60000000").alias("lag_minutes"),
            (lag > FRESHNESS_STALE_US).alias("stale"),
        )
        .orderBy("event_type")
    )


import math

# Benford first-digit expectations, materialized as PYTHON float
# literals formatted into BOTH plans — the two engines never call
# their own log10, so the constants are bit-identical by construction.
BENFORD_P = {d: math.log10(1.0 + 1.0 / d) for d in range(1, 10)}
BENFORD_MAD_FLAG = 0.015  # Nigrini's nonconformity bound for MAD-style per-digit deviation

_BENFORD_SQL_CASE = (
    "CASE "
    + " ".join(f"WHEN digit = {d} THEN {p!r}" for d, p in BENFORD_P.items())
    + " END"
)


@query(
    "dq_benford_order_prices",
    oracle=f"""
    WITH cents AS (
        SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS c
        FROM orders WHERE o_totalprice > 0
    ),
    dig AS (
        SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
        FROM cents WHERE c > 0
    ),
    agg AS (
        SELECT digit, COUNT(*)::BIGINT AS n_orders FROM dig GROUP BY digit
    ),
    tot AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS n FROM agg)
    SELECT agg.digit, agg.n_orders,
           ROUND(agg.n_orders * 1.0 / tot.n, 9) AS share,
           ROUND({_BENFORD_SQL_CASE}, 9) AS benford_p,
           ROUND(ABS(agg.n_orders * 1.0 / tot.n - {_BENFORD_SQL_CASE}), 9)
               AS abs_dev,
           ABS(agg.n_orders * 1.0 / tot.n - {_BENFORD_SQL_CASE})
               > {BENFORD_MAD_FLAG!r} AS flagged
    FROM agg CROSS JOIN tot
    ORDER BY agg.digit
    """,
)
def dq_benford_order_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the
    fabricated-data screen (Nigrini 2012): naturally-occurring
    multiplicative amounts follow P(d) = log10(1 + 1/d), and a digit
    whose observed share deviates past the MAD conformity bound is a
    red flag for synthetic or truncated values. (TPC-H totals are
    sums of uniform prices, so several digits SHOULD flag — the screen
    correctly detects that generated data is not Benford.)

    Scale shape: the first digit is a map-side expression, the tally
    is a 9-key aggregation with map-side partials, and the total
    broadcasts back onto 9 rows. One full-column scan, no wide state.

    Determinism: the digit comes from FLOOR(price*100) — one
    correctly-rounded product and floor, bit-identical on both engines
    — rendered via BIGINT→string (never double formatting); the
    Benford expectations are Python float literals embedded in both
    plans, so no engine libm is consulted; shares are single divisions
    of exact integers."""
    cents = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.floor(F.col("o_totalprice") * 100).cast("long").alias("c")
        )
        .filter(F.col("c") > 0)
    )
    agg = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("digit")
    ).groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = agg.agg(F.sum("n_orders").cast("long").alias("n"))
    p_case = F.lit(None).cast("double")
    for d, p in BENFORD_P.items():
        p_case = F.when(F.col("digit") == d, F.lit(p)).otherwise(p_case)
    share = F.col("n_orders") * F.lit(1.0) / F.col("n")
    dev = F.abs(share - p_case)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_orders",
            F.round(share, 9).alias("share"),
            F.round(p_case, 9).alias("benford_p"),
            F.round(dev, 9).alias("abs_dev"),
            (dev > BENFORD_MAD_FLAG).alias("flagged"),
        )
        .orderBy("digit")
    )
