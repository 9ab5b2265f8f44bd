"""Warehouse-analytics round 2: gaps-and-islands streaks, calendar
densification, weighted reservoir sampling, integrity checksums, and
exponential-smoothing forecasts.

Five patterns every large warehouse/pipeline runs that the surface
didn't yet cover (SURVEY.md §2.9 extension charter — the reference
has no relational model at all):

* **Gaps-and-islands** (``customer_order_streaks``) — the classic
  consecutive-period streak detection (row_number-difference island
  key), the idiom behind "longest active streak" retention metrics.
* **Date-spine densification** (``orders_date_spine_fill``) — dense
  calendar generation + left join so zero-activity days exist in the
  series; the prerequisite for any honest period-over-period or gap
  metric (a missing day is data, not absence of data).
* **Weighted sampling without replacement**
  (``sample_weighted_aes``) — Efraimidis & Spirakis 2006 ("Weighted
  random sampling with a reservoir"): key = ln(u)/w, take the top-k
  keys. One pass, no global sort of the corpus beyond a bounded
  top-k per stratum; THE distributed weighted-sample primitive.
* **Order-independent integrity checksums**
  (``integrity_partition_checksums``) — per-partition XOR of row
  hashes: commutative/associative ⇒ mergeable across any task split,
  the cheap way to verify a 100 TB copy or a migration (count alone
  misses content corruption).
* **EWMA forecast** (``orders_ewma_forecast``) — exponential
  smoothing over the monthly series via the closed-form bounded
  window (12 terms), the no-training baseline every demand forecast
  is judged against.

Scale shape (shared): every query aggregates the corpus down to a
tiny keyed table FIRST (months, days, strata, sources) with map-side
partials, and all window/join/rank work happens on that aggregate.
The weighted sample's per-row key is map-side math; its only shuffle
is the per-lang top-k. The checksum is one map-side hash + one
XOR-mergeable aggregation — no row ever moves twice.

Determinism: streak/island arithmetic is pure integers; ES keys are
per-row IEEE trees (md5-uniform → ln → divide) identical on both
engines, with doc_id tiebreakers; EWMA weights are per-row pow()
doubles whose weighted sums are decimal-accumulated (rule 1); the
XOR checksum is integer-exact and order-free by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.functions.text_funcs import (
    md5_hash64,
    sql_md5_hash64,
)
from gresearch_parquet_benchmarking_spark.operators.registry import (
    dsum,
    query,
    sql_dsum,
    track_persist,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

ES_SAMPLE_K = 5           # weighted-sample picks per language stratum
ES_U_DENOM = 4294967297.0  # 2^32 + 1: md5-32 + 1 over this is in (0,1)
EWMA_ALPHA = 0.3          # smoothing factor (0.3 and 0.7 parse to the
EWMA_WINDOW = 12          # same doubles in both engines)


@query(
    "customer_order_streaks",
    oracle="""
    WITH months AS (
        SELECT DISTINCT o_custkey,
               date_part('year', o_orderdate) * 12
                 + date_part('month', o_orderdate) AS mi
        FROM orders
    ),
    islands AS (
        SELECT o_custkey, mi,
               mi - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY mi)
                 AS grp
        FROM months
    ),
    streaks AS (
        SELECT o_custkey, grp, COUNT(*) AS len
        FROM islands GROUP BY o_custkey, grp
    ),
    best AS (
        SELECT o_custkey, MAX(len) AS max_streak FROM streaks
        GROUP BY o_custkey
    )
    SELECT max_streak AS streak_months,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM best GROUP BY max_streak ORDER BY streak_months
    """,
)
def customer_order_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-month ordering streak per customer, rolled
    up into a streak-length histogram — the gaps-and-islands idiom
    (island key = month index minus row_number) behind every
    "current streak" retention metric.

    Scale shape: the corpus collapses to distinct (customer, month)
    pairs in one map-side-partial aggregation; the island window then
    runs per-customer over ≤ n_months rows, reusing the same hash
    partitioning for the streak and per-customer rollups (one
    exchange chain on o_custkey), and the final histogram is a
    tiny-key aggregation. Pure integer arithmetic end to end."""
    orders = load_table(spark, sf_dir, "orders")
    months = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi"),
    ).distinct()
    grp = (
        F.col("mi")
        - F.row_number().over(W.partitionBy("o_custkey").orderBy("mi"))
    ).alias("grp")
    streaks = (
        months.select("o_custkey", "mi", grp)
        .groupBy("o_custkey", "grp")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    best = streaks.groupBy("o_custkey").agg(F.max("len").alias("max_streak"))
    return (
        best.groupBy(F.col("max_streak").alias("streak_months"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("streak_months")
    )


@query(
    "orders_date_spine_fill",
    oracle="""
    WITH bounds AS (
        SELECT CAST(MIN(o_orderdate) AS DATE) AS mn,
               CAST(MAX(o_orderdate) AS DATE) AS mx
        FROM orders
    ),
    spine AS (
        SELECT CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
                                           CAST(mx AS TIMESTAMP),
                                           INTERVAL 1 DAY)) AS DATE) AS d
        FROM bounds
    ),
    daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
                 AS rev
        FROM orders GROUP BY 1
    ),
    dense AS (
        SELECT spine.d,
               COALESCE(daily.n, 0) AS n,
               COALESCE(daily.rev, 0.0) AS rev
        FROM spine LEFT JOIN daily ON spine.d = daily.day
    ),
    monthly AS (
        SELECT strftime(d, '%Y-%m') AS month,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               CAST(SUM(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS zero_days,
               CAST(SUM(n) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(rev AS DECIMAL(27,4))) AS DOUBLE) AS revenue
        FROM dense GROUP BY 1
    )
    SELECT month, n_days, zero_days, n_orders, ROUND(revenue, 4) AS revenue,
           ROUND((revenue - LAG(revenue) OVER (ORDER BY month))
                 / NULLIF(LAG(revenue) OVER (ORDER BY month), 0.0), 6)
             AS mom_pct
    FROM monthly ORDER BY month
    """,
)
def orders_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily calendar spine left-joined to order activity, rolled
    up monthly with zero-day counts and month-over-month revenue
    change — densification makes missing days first-class data, the
    prerequisite for honest period-over-period and gap metrics.

    Scale shape: the corpus collapses to one daily aggregate (map-side
    partials; ≤ corpus-years × 366 rows) and one 2-value bounds row;
    the spine is generated by exploding a single sequence() on that
    bounds row (driver-free, metadata-sized) and the left join + the
    monthly rollup + the LAG window all run on calendar-sized tables.
    Revenue sums decimal-accumulate at every level (rule 1); MoM
    division NULLIF-guards empty months identically on both engines."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("mn"),
        F.max(F.col("o_orderdate").cast("date")).alias("mx"),
    )
    spine = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("d")
    )
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice", alias="rev"),
    )
    dense = spine.join(daily, spine.d == daily.day, "left").select(
        "d",
        F.coalesce("n", F.lit(0)).alias("n"),
        F.coalesce("rev", F.lit(0.0)).alias("rev"),
    )
    monthly = dense.groupBy(F.date_format("d", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.when(F.col("n") == 0, 1).otherwise(0))
        .cast("long")
        .alias("zero_days"),
        F.sum("n").cast("long").alias("n_orders"),
        dsum("rev", alias="revenue"),
    )
    prev = F.lag("revenue").over(W.orderBy("month"))
    return monthly.select(
        "month",
        "n_days",
        "zero_days",
        "n_orders",
        F.round("revenue", 4).alias("revenue"),
        F.round(
            (F.col("revenue") - prev) / F.nullif(prev, F.lit(0.0)), 6
        ).alias("mom_pct"),
    ).orderBy("month")


@query(
    "sample_weighted_aes",
    oracle=f"""
    WITH keyed AS (
        SELECT lang, doc_id, n_chars AS w,
               ln(({sql_md5_hash64("CAST(doc_id AS VARCHAR)")} + 1)
                  / {ES_U_DENOM})
                 / GREATEST(n_chars, 1) AS es_key
        FROM documents
    ),
    ranked AS (
        SELECT lang, doc_id, w, es_key,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY es_key DESC, doc_id) AS rn
        FROM keyed
    )
    SELECT lang, CAST(rn AS BIGINT) AS pick_rank, doc_id, w,
           ROUND(es_key, 9) AS es_key
    FROM ranked WHERE rn <= {ES_SAMPLE_K}
    ORDER BY lang, pick_rank
    """,
)
def sample_weighted_aes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement per language stratum via
    the Efraimidis–Spirakis A-ES key (2006, "Weighted random sampling
    with a reservoir"): key = ln(u)/w with u uniform in (0,1), take
    the k largest keys — exactly equivalent to sequential weighted
    draws without replacement, but embarrassingly parallel.

    u is the deterministic md5-uniform of doc_id (the repo's seeded
    stand-in for random()), so both engines draw the identical sample.

    Scale shape: the key is one map-side expression per row; the only
    shuffle is the per-lang top-k window — at 100 TB you'd swap the
    full row_number window for a per-partition top-k + merge
    (the same bounded-reservoir algebra the paper proves), which AQE's
    partial TakeOrdered already approximates. No corpus-sized sort,
    no driver-side sampling state."""
    docs = load_table(spark, sf_dir, "documents")
    u = (md5_hash64(F.col("doc_id").cast("string")) + 1) / F.lit(ES_U_DENOM)
    keyed = docs.select(
        "lang",
        "doc_id",
        F.col("n_chars").alias("w"),
        (F.log(u) / F.greatest("n_chars", F.lit(1))).alias("es_key"),
    )
    rn = F.row_number().over(
        W.partitionBy("lang").orderBy(F.col("es_key").desc(), "doc_id")
    )
    return (
        keyed.withColumn("rn", rn)
        .filter(F.col("rn") <= ES_SAMPLE_K)
        .select(
            "lang",
            F.col("rn").cast("long").alias("pick_rank"),
            "doc_id",
            "w",
            F.round("es_key", 9).alias("es_key"),
        )
        .orderBy("lang", "pick_rank")
    )


@query(
    "integrity_partition_checksums",
    oracle=f"""
    WITH hashed AS (
        SELECT source,
               doc_id,
               {sql_md5_hash64("CAST(doc_id AS VARCHAR) || ':' || md5(text)",
                               bits=56)} AS h
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           bit_xor(h) AS xor_checksum,
           MIN(h) AS min_hash,
           MAX(h) AS max_hash,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM hashed GROUP BY source ORDER BY source
    """,
)
def integrity_partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent content checksums per source partition: XOR
    of a 56-bit md5 row hash over (doc_id, content-md5), plus row
    counts and id/hash extrema — the audit a pipeline runs on both
    sides of a 100 TB copy/migration to prove content (not just
    count) equality.

    Scale shape: one map-side hash per row, then a single aggregation
    whose combiner is XOR/MIN/MAX/COUNT — all commutative-associative
    and constant-width, so partials merge in any order across any
    task split and re-partitioning never changes the answer. 56-bit
    hashes keep every value positive in a BIGINT on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    h = md5_hash64(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.md5("text")),
        bits=56,
    )
    return (
        docs.select("source", "doc_id", h.alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(h)").alias("xor_checksum"),
            F.min("h").alias("min_hash"),
            F.max("h").alias("max_hash"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("source")
    )


@query(
    "orders_ewma_forecast",
    oracle=f"""
    WITH monthly AS (
        SELECT o_orderpriority AS priority,
               date_part('year', o_orderdate) * 12
                 + date_part('month', o_orderdate) AS mi,
               strftime(o_orderdate, '%Y-%m') AS month,
               {sql_dsum("o_totalprice")} AS rev
        FROM orders GROUP BY 1, 2, 3
    ),
    terms AS (
        SELECT a.priority, a.mi, a.month,
               pow({1.0 - EWMA_ALPHA}, a.mi - b.mi) AS wt,
               pow({1.0 - EWMA_ALPHA}, a.mi - b.mi) * b.rev AS wrev
        FROM monthly a
        JOIN monthly b
          ON a.priority = b.priority
         AND b.mi BETWEEN a.mi - {EWMA_WINDOW - 1} AND a.mi
    )
    SELECT priority, month,
           CAST(COUNT(*) AS BIGINT) AS n_terms,
           ROUND({sql_dsum("wrev", scale=6)}
                 / {sql_dsum("wt", scale=12)}, 6) AS ewma
    FROM terms GROUP BY priority, mi, month
    ORDER BY priority, month
    """,
)
def orders_ewma_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of monthly revenue per
    order priority — the closed-form bounded-window form of simple
    exponential smoothing (weights (1-α)^lag over the trailing 12
    months, renormalized), the no-training forecast baseline. The
    last month's ewma IS the next-month forecast.

    Scale shape: the corpus collapses to a (priority, month) aggregate
    first (map-side decimal partials; priorities × months rows —
    metadata-sized at any SF); the 12-term trailing window is a
    bounded-fanout self-join ON THAT AGGREGATE (equi on priority +
    month-range), never on raw orders, and AQE broadcasts it. The
    recursive EWMA definition is deliberately traded for the
    closed-form so there is no sequential scan.

    Determinism: pow() weights are per-row IEEE doubles (integer
    exponents) identical on both engines; the weighted numerator and
    denominator sums decimal-accumulate (rule 1) — a 12-term plain
    double SUM would be partial-order-dependent. The second join
    branch is alias-renamed (self-join rule)."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.col("o_orderpriority").alias("priority"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi"),
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(dsum("o_totalprice", alias="rev"))
    b = monthly.select(
        F.col("priority").alias("b_priority"),
        F.col("mi").alias("b_mi"),
        F.col("rev").alias("b_rev"),
    )
    wt = F.pow(F.lit(1.0 - EWMA_ALPHA), F.col("mi") - F.col("b_mi"))
    terms = monthly.join(
        b,
        (F.col("priority") == F.col("b_priority"))
        & (F.col("b_mi") >= F.col("mi") - (EWMA_WINDOW - 1))
        & (F.col("b_mi") <= F.col("mi")),
    ).select(
        "priority",
        "mi",
        "month",
        wt.alias("wt"),
        (wt * F.col("b_rev")).alias("wrev"),
    )
    return (
        terms.groupBy("priority", "mi", "month")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(
                dsum("wrev", scale=6) / dsum("wt", scale=12), 6
            ).alias("ewma"),
        )
        .select("priority", "month", "n_terms", "ewma")
        .orderBy("priority", "month")
    )


SNAP_CHANGED_MOD = 97   # keys whose price changes in the simulated v2
SNAP_DELETED_MOD = 101  # keys dropped from v2
SNAP_ADDED_MOD = 103    # keys whose v2 clone appears under a new key
SNAP_KEY_OFFSET = 1_000_000_000  # far beyond any real orderkey


@query(
    "snapshot_diff_orders",
    oracle=f"""
    WITH v1 AS (
        SELECT o_orderkey AS k, o_totalprice AS price,
               o_orderstatus AS status, o_orderpriority AS priority
        FROM orders
    ),
    v2 AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % {SNAP_CHANGED_MOD} = 0
                    THEN o_totalprice + 1.0 ELSE o_totalprice END AS price,
               o_orderstatus AS status, o_orderpriority AS priority
        FROM orders WHERE o_orderkey % {SNAP_DELETED_MOD} <> 0
        UNION ALL
        SELECT o_orderkey + {SNAP_KEY_OFFSET}, o_totalprice,
               o_orderstatus, o_orderpriority
        FROM orders WHERE o_orderkey % {SNAP_ADDED_MOD} = 0
    ),
    diff AS (
        SELECT CASE
                 WHEN v1.k IS NULL THEN 'added'
                 WHEN v2.k IS NULL THEN 'deleted'
                 WHEN v1.price != v2.price OR v1.status != v2.status
                      OR v1.priority != v2.priority THEN 'changed'
                 ELSE 'unchanged'
               END AS change_type,
               COALESCE(v2.price, 0.0) - COALESCE(v1.price, 0.0) AS delta
        FROM v1 FULL OUTER JOIN v2 ON v1.k = v2.k
    )
    SELECT change_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND({sql_dsum("delta")}, 4) AS price_delta
    FROM diff GROUP BY change_type ORDER BY change_type
    """,
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two table versions — the CDC/audit query
    run after every batch ingest or migration: classify every key as
    added / deleted / changed / unchanged via one full-outer join and
    field-level comparison, with the net value delta per class. v2 is
    a deterministic simulation (mod-key edits/drops/inserts) so both
    engines derive the identical pair of versions.

    Scale shape: ONE full-outer shuffle hash join on the key — the
    minimal-movement plan for an unordered diff at 100 TB (both sides
    partition once on k; AQE handles size asymmetry) — then a
    4-key map-side-combinable rollup. Field comparisons are exact
    (double equality on identical inputs, +1.0 is exact in binary);
    the delta sum decimal-accumulates (rule 1). No row hashing:
    double→string formatting differs across engines, field-wise
    compare is both cheaper and exact."""
    orders = load_table(spark, sf_dir, "orders")
    v1 = orders.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    v2 = (
        orders.filter(F.col("o_orderkey") % SNAP_DELETED_MOD != 0)
        .select(
            F.col("o_orderkey").alias("k2"),
            F.when(
                F.col("o_orderkey") % SNAP_CHANGED_MOD == 0,
                F.col("o_totalprice") + 1.0,
            )
            .otherwise(F.col("o_totalprice"))
            .alias("price2"),
            F.col("o_orderstatus").alias("status2"),
            F.col("o_orderpriority").alias("priority2"),
        )
        .unionAll(
            orders.filter(F.col("o_orderkey") % SNAP_ADDED_MOD == 0).select(
                (F.col("o_orderkey") + SNAP_KEY_OFFSET).alias("k2"),
                F.col("o_totalprice").alias("price2"),
                F.col("o_orderstatus").alias("status2"),
                F.col("o_orderpriority").alias("priority2"),
            )
        )
    )
    diff = v1.join(v2, F.col("k") == F.col("k2"), "full_outer").select(
        F.when(F.col("k").isNull(), "added")
        .when(F.col("k2").isNull(), "deleted")
        .when(
            (F.col("price") != F.col("price2"))
            | (F.col("status") != F.col("status2"))
            | (F.col("priority") != F.col("priority2")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("change_type"),
        (
            F.coalesce("price2", F.lit(0.0)) - F.coalesce("price", F.lit(0.0))
        ).alias("delta"),
    )
    return (
        diff.groupBy("change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(dsum("delta"), 4).alias("price_delta"),
        )
        .orderBy("change_type")
    )


WMEDIAN_RANGES = 32  # prefix-sum range partitions (the ABC_RANGES
                     # convention): output is range-count-invariant —
                     # base offsets come from the actual per-range
                     # decimal totals, so any count ≥ 1 is exact; size
                     # it so |distinct prices|/WMEDIAN_RANGES stays
                     # executor-sized at scale.


@query(
    "lineitem_weighted_median_price",
    oracle="""
    WITH byprice AS (
        SELECT l_returnflag, l_linestatus, l_extendedprice AS price,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS w
        FROM lineitem GROUP BY 1, 2, 3
    ),
    cum AS (
        SELECT l_returnflag, l_linestatus, price, w,
               CAST(SUM(CAST(w AS DECIMAL(27,2))) OVER (
                   PARTITION BY l_returnflag, l_linestatus
                   ORDER BY price) AS DOUBLE) AS cumw,
               CAST(SUM(CAST(w AS DECIMAL(27,2))) OVER (
                   PARTITION BY l_returnflag, l_linestatus) AS DOUBLE) AS tot
        FROM byprice
    ),
    hit AS (
        SELECT l_returnflag, l_linestatus, price, tot,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag, l_linestatus
                                  ORDER BY price) AS rn
        FROM cum WHERE cumw >= 0.5 * tot
    )
    SELECT l_returnflag, l_linestatus,
           price AS weighted_median_price,
           ROUND(tot, 2) AS total_qty
    FROM hit WHERE rn = 1
    ORDER BY l_returnflag, l_linestatus
    """,
)
def lineitem_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of extended price per
    (returnflag, linestatus) — the weighted-percentile pattern
    (cumulative weight crossing half the total) that unweighted
    percentile_approx/approx-quantile cannot express, and the robust
    "typical traded price" a procurement dashboard wants (each price
    counts by units moved, not by line count).

    Scale shape: the corpus collapses to a (group, price)-keyed
    aggregate with map-side decimal partials FIRST; the cumulative
    window then runs over distinct prices per group (bounded by price
    cardinality, not row count), partitioned on the same group key —
    one exchange. The crossing row is a rank-1 filter per group.

    Determinism: per-(group, price) weights and both window sums are
    decimal-accumulated (rule 1 — a running double SUM re-associates
    under partial aggregation); the 0.5·tot comparison is one IEEE
    product of identical doubles on both engines; price ordering is
    unique within a group by construction (it IS the group-by key)."""
    li = load_table(spark, sf_dir, "lineitem")
    byprice = li.groupBy(
        "l_returnflag", "l_linestatus", F.col("l_extendedprice").alias("price")
    ).agg(dsum("l_quantity", scale=2, alias="w"))
    # r12 optimization round: the cumulative / total windows used to be
    # PARTITION BY (l_returnflag, l_linestatus) — six partitions, i.e.
    # a hidden SinglePartition×6 processing |distinct prices| rows in
    # at most 6 tasks at any scale. Graduated to the orders_abc_pareto
    # two-pass prefix-sum: repartitionByRange on (group, price) keeps
    # each group's price order contiguous across ranges, the running
    # decimal sum runs per (group, range) with ≤ 6·WMEDIAN_RANGES
    # per-range decimal totals collected as a bounded scalar probe and
    # re-entering as exact decimal-string literals (decimal addition
    # is associative, so offset + local prefix ≡ the single-window
    # prefix bit-for-bit). The group total becomes a plain 6-row
    # aggregate broadcast back (same decimal terms as the old
    # full-partition window → identical double). The crossing row is
    # MIN(price) over qualifying rows — cumw is strictly increasing in
    # price (quantities are positive), so MIN(price | cumw ≥ 0.5·tot)
    # IS the old rank-1 row. The persist is correctness-critical:
    # repartitionByRange samples its bounds, so the probe and the
    # window must read the same materialized range assignment.
    ranged = track_persist(
        byprice.repartitionByRange(
            WMEDIAN_RANGES, "l_returnflag", "l_linestatus", "price"
        ).withColumn("rid", F.spark_partition_id())
    )
    rtots = sorted(
        ranged.groupBy("l_returnflag", "l_linestatus", "rid")
        .agg(F.sum(F.col("w").cast("decimal(27,2)")).alias("rtot"))
        .collect(),
        key=lambda r: (r["l_returnflag"], r["l_linestatus"], r["rid"]),
    )
    # Probe-coverage invariant (ADVICE r12): the off_map/tot_map below
    # are only exact because they were computed from the SAME
    # materialized range assignment the window reads — the persist on
    # `ranged` above is load-bearing. element_at under ANSI fails loud
    # on a missing (group, rid) key; this catches the probe silently
    # returning nothing at all (e.g. the persist edited away).
    assert rtots, "wmedian range probe returned no rows — persisted range assignment missing"
    base_off: dict[tuple, str] = {}
    running_by_grp: dict[tuple, object] = {}
    for r in rtots:
        g = (r["l_returnflag"], r["l_linestatus"])
        base_off[(g[0], g[1], r["rid"])] = str(running_by_grp.get(g, 0))
        running_by_grp[g] = running_by_grp.get(g, 0) + r["rtot"]
    off_map = F.create_map(
        *[
            x
            for (rf, ls, rid), off in base_off.items()
            for x in (F.concat_ws("|", F.lit(rf), F.lit(ls), F.lit(rid)), F.lit(off))
        ]
    )
    # r13 (ADVICE r12): the per-group totals are the probe's final
    # running sums — Python Decimal additions of Spark decimal partials,
    # exact, the SAME terms the old `byprice.groupBy(group).sum` would
    # re-aggregate from a second full lineitem scan. Embed them as a map
    # literal (decimal-string → decimal(38,2) → double, the identical
    # cast chain) instead of re-scanning + broadcast-joining.
    tot_map = F.create_map(
        *[
            x
            for (rf, ls), tot in running_by_grp.items()
            for x in (F.concat_ws("|", F.lit(rf), F.lit(ls)), F.lit(str(tot)))
        ]
    )
    wloc = (
        W.partitionBy("l_returnflag", "l_linestatus", "rid")
        .orderBy("price")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    okey = F.concat_ws(
        "|", F.col("l_returnflag"), F.col("l_linestatus"), F.col("rid")
    )
    gkey = F.concat_ws("|", F.col("l_returnflag"), F.col("l_linestatus"))
    cumw = (
        F.element_at(off_map, okey).cast("decimal(38,2)")
        + F.sum(F.col("w").cast("decimal(27,2)")).over(wloc)
    ).cast("double")
    cum = ranged.select(
        "l_returnflag",
        "l_linestatus",
        "price",
        cumw.alias("cumw"),
        F.element_at(tot_map, gkey).cast("decimal(38,2)").cast("double").alias("tot"),
    )
    return (
        cum.filter(F.col("cumw") >= 0.5 * F.col("tot"))
        .groupBy("l_returnflag", "l_linestatus", "tot")
        .agg(F.min("price").alias("weighted_median_price"))
        .select(
            "l_returnflag", "l_linestatus",
            "weighted_median_price",
            F.round("tot", 2).alias("total_qty"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ABC_A_CUT = 0.80   # cumulative-revenue-share class boundaries
ABC_B_CUT = 0.95
ABC_RANGES = 32  # prefix-sum range partitions; at 100 TB scale with
                 # |parts| so each range stays executor-sized — output
                 # is range-count-invariant (offsets from actual totals)


@query(
    "orders_abc_pareto",
    oracle=f"""
    WITH per_part AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(27,4))) AS DOUBLE) AS rev
        FROM lineitem GROUP BY 1
    ),
    ranked AS (
        SELECT l_partkey, rev,
               CAST(SUM(CAST(rev AS DECIMAL(27,4))) OVER (
                   ORDER BY rev DESC, l_partkey) AS DOUBLE)
                 / CAST(SUM(CAST(rev AS DECIMAL(27,4))) OVER () AS DOUBLE)
                 AS cumshare
        FROM per_part
    ),
    classed AS (
        SELECT CASE WHEN cumshare <= {ABC_A_CUT} THEN 'A'
                    WHEN cumshare <= {ABC_B_CUT} THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev
        FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           ROUND(CAST(SUM(CAST(rev AS DECIMAL(27,4))) AS DOUBLE), 4)
             AS class_revenue
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
)
def orders_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto classification of parts by revenue: rank parts by
    discounted revenue, walk the cumulative share, and cut classes at
    80%/95% — the inventory-management classic
    ("20% of SKUs carry 80% of revenue") every assortment review runs.

    Scale shape (r8, VERDICT r7 #6 — graduated off the
    single-partition window): the fact scan collapses to one
    revenue-per-part aggregate (map-side decimal partials; |parts|
    rows); the exact global prefix sum over it is then TWO-PASS like
    sequence_packing (pipeline3.py) — `repartitionByRange` on the
    rank key (rev DESC, partkey) makes ranges contiguous in rank
    order, the cumulative window runs per-range (widest partition =
    |parts|/ABC_RANGES, never the whole dimension), and the ≤
    ABC_RANGES per-range totals are a bounded scalar probe
    (CLAUDE.md-sanctioned, like graph.py's convergence checks)
    embedded as plan-constant base offsets — no Exchange
    SinglePartition anywhere in the executed plan (pinned by
    test_abc_pareto_no_single_partition_window in tests/test_plans.py).
    The persist is CORRECTNESS-critical,
    not a tune: repartitionByRange samples its bounds, so the probe
    and the window must read the SAME materialized range assignment.

    Determinism: base offsets + local cumulative sums are exact
    decimal arithmetic (bit-identical to the single-window decimal
    sum after the final double cast); the rank order is unique
    ((rev DESC, partkey)); range-bound placement cannot change the
    result (offsets are computed from actual per-range totals, and
    the total order has no ties to split)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), alias="rev")
    )
    ranged = track_persist(
        per_part.repartitionByRange(
            ABC_RANGES, F.desc("rev"), F.asc("l_partkey")
        ).withColumn("rid", F.spark_partition_id())
    )
    totals = sorted(
        ranged.groupBy("rid")
        .agg(F.sum(F.col("rev").cast("decimal(27,4)")).alias("rtot"))
        .collect(),
        key=lambda r: r["rid"],
    )
    base_off: dict[int, str] = {}
    running = 0
    for r in totals:
        base_off[r["rid"]] = str(running)
        running += r["rtot"]
    total_rev = F.lit(str(running)).cast("decimal(38,4)")
    off_map = F.create_map(
        *[
            x
            for rid, off in base_off.items()
            for x in (F.lit(rid), F.lit(off))
        ]
    )
    wloc = (
        W.partitionBy("rid")
        .orderBy(F.desc("rev"), F.asc("l_partkey"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.element_at(off_map, F.col("rid")).cast("decimal(38,4)") + F.sum(
        F.col("rev").cast("decimal(27,4)")
    ).over(wloc)
    cumshare = cum.cast("double") / total_rev.cast("double")
    classed = ranged.select(
        F.when(cumshare <= ABC_A_CUT, "A")
        .when(cumshare <= ABC_B_CUT, "B")
        .otherwise("C")
        .alias("abc_class"),
        "rev",
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(dsum("rev"), 4).alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@query(
    "orders_cohort_ltv",
    oracle="""
    WITH om AS (
        SELECT o_custkey,
               date_part('year', o_orderdate) * 12
                 + date_part('month', o_orderdate) AS mi,
               o_totalprice AS price
        FROM orders
    ),
    first_mi AS (
        SELECT o_custkey, MIN(mi) AS cohort_mi FROM om GROUP BY o_custkey
    ),
    sizes AS (
        SELECT cohort_mi, COUNT(*) AS n_customers
        FROM first_mi GROUP BY cohort_mi
    ),
    cells AS (
        SELECT f.cohort_mi, om.mi - f.cohort_mi AS offset_m,
               CAST(SUM(CAST(om.price AS DECIMAL(27,4))) AS DOUBLE) AS rev
        FROM om JOIN first_mi f ON om.o_custkey = f.o_custkey
        GROUP BY 1, 2
    ),
    curve AS (
        SELECT cohort_mi, offset_m, rev,
               CAST(SUM(CAST(rev AS DECIMAL(27,4))) OVER (
                   PARTITION BY cohort_mi ORDER BY offset_m) AS DOUBLE)
                 AS cum_rev
        FROM cells
    )
    SELECT CAST(curve.cohort_mi AS BIGINT) AS cohort_mi,
           CAST(curve.offset_m AS BIGINT) AS offset_m,
           CAST(sizes.n_customers AS BIGINT) AS n_customers,
           ROUND(curve.rev, 4) AS rev,
           ROUND(curve.cum_rev, 4) AS cum_rev,
           ROUND(curve.cum_rev / sizes.n_customers, 6) AS ltv_per_customer
    FROM curve JOIN sizes USING (cohort_mi)
    WHERE curve.offset_m <= 11
    ORDER BY cohort_mi, offset_m
    """,
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves: customers grouped by first-order
    month, revenue accumulated by months-since-acquisition, normalized
    per cohort member — the LTV table every growth/finance review
    reads next to the retention triangle (cohort_retention covers the
    WHO-returns counts; this covers the HOW-MUCH-they-spend curve).
    First year of each cohort's life (offsets 0–11).

    Scale shape: the cohort assignment is one per-customer MIN
    aggregate joined back on o_custkey (both sides partition once on
    the same key — at 100 TB this is the standard enrich join AQE
    plans); everything after runs on the (cohort × offset) aggregate —
    hundreds of rows at any SF — including the cumulative window.

    Determinism: month indexes are integers; every revenue sum
    (per-cell and the running cumulative) decimal-accumulates
    (rule 1); LTV is one double division by an integer cohort size."""
    orders = load_table(spark, sf_dir, "orders")
    om = orders.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("mi"),
        F.col("o_totalprice").alias("price"),
    )
    first_mi = om.groupBy("o_custkey").agg(F.min("mi").alias("cohort_mi"))
    sizes = first_mi.groupBy("cohort_mi").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    f2 = first_mi.select(
        F.col("o_custkey").alias("ck"), F.col("cohort_mi").alias("cmi")
    )
    cells = (
        om.join(f2, om.o_custkey == f2.ck)
        .groupBy(
            F.col("cmi").alias("cohort_mi"),
            (F.col("mi") - F.col("cmi")).alias("offset_m"),
        )
        .agg(dsum("price", alias="rev"))
    )
    cum = (
        F.sum(F.col("rev").cast("decimal(27,4)"))
        .over(W.partitionBy("cohort_mi").orderBy("offset_m"))
        .cast("double")
    )
    curve = cells.select("cohort_mi", "offset_m", "rev", cum.alias("cum_rev"))
    s2 = sizes.select(
        F.col("cohort_mi").alias("smi"), "n_customers"
    )
    return (
        curve.join(s2, curve.cohort_mi == s2.smi)
        .filter(F.col("offset_m") <= 11)
        .select(
            "cohort_mi",
            "offset_m",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.round("rev", 4).alias("rev"),
            F.round("cum_rev", 4).alias("cum_rev"),
            F.round(F.col("cum_rev") / F.col("n_customers"), 6).alias(
                "ltv_per_customer"
            ),
        )
        .orderBy("cohort_mi", "offset_m")
    )


OTD_DAYS = 30  # on-time = shipped within 30 days of order placement


@query(
    "supplier_otd_scorecard",
    oracle=f"""
    WITH lines AS (
        SELECT l.l_suppkey,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)) AS delay_days
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    SELECT s.s_name,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(CAST(SUM(CASE WHEN delay_days <= {OTD_DAYS} THEN 1 ELSE 0 END)
                      AS BIGINT) * 1.0 / COUNT(*), 6) AS otd_rate,
           CAST(CAST(SUM(CAST(delay_days AS DECIMAL(27,0))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_delay_days,
           MAX(delay_days) AS max_delay_days
    FROM lines JOIN supplier s ON lines.l_suppkey = s.s_suppkey
    GROUP BY s.s_name ORDER BY s.s_name
    """,
)
def supplier_otd_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time-delivery scorecard per supplier: ship-lag days between
    order placement and each line's ship date, with the on-time rate
    (≤ 30 days), mean and worst lag — the vendor-performance review
    every procurement org runs monthly.

    Scale shape: the one corpus-sized operation is the
    lineitem↔orders fact-fact equi-join on l_orderkey — the exact
    join sources/bucketing.py exists to make Exchange-free at scale
    (layout_bucketed_join pins the plan); here AQE plans the shuffle
    join and everything downstream is a supplier-keyed rollup with
    map-side partials plus a broadcast of the supplier dim.

    Determinism: day lags are exact integers (DATE-truncated on both
    engines); the mean decimal-accumulates; rates are one IEEE
    division of exact integers."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", F.col("l_shipdate").cast("date").alias("ship")
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").cast("date").alias("placed")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    lines = li.join(od, li.l_orderkey == od.o_orderkey).select(
        "l_suppkey",
        # long: DuckDB date_diff is BIGINT, Spark datediff is INT —
        # the driver hashes typed values (rule 5)
        F.datediff("ship", "placed").cast("long").alias("delay_days"),
    )
    return (
        lines.join(sup, lines.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(
                F.sum(F.when(F.col("delay_days") <= OTD_DAYS, 1).otherwise(0))
                .cast("long")
                * F.lit(1.0)
                / F.count(F.lit(1)),
                6,
            ).alias("otd_rate"),
            (
                F.sum(F.col("delay_days").cast("decimal(27,0)")).cast("double")
                / F.count(F.lit(1))
            )
            .cast("double")
            .alias("avg_delay_days"),
            F.max("delay_days").alias("max_delay_days"),
        )
        .orderBy("s_name")
    )


US_PER_DAY_A2 = 86_400_000_000
WAU_WINDOW_DAYS = 7


@query(
    "events_stickiness_dau_wau",
    oracle=f"""
    WITH du AS (
        SELECT DISTINCT CAST(epoch_us(ts) AS BIGINT) // {US_PER_DAY_A2}
                   AS day_num,
               user_id
        FROM events
    ),
    dau AS (
        SELECT day_num, COUNT(*)::BIGINT AS dau FROM du GROUP BY day_num
    ),
    contrib AS (
        SELECT d.target_day, du.user_id
        FROM du, LATERAL (
            SELECT unnest(generate_series(du.day_num,
                                          du.day_num + {WAU_WINDOW_DAYS - 1}))
                   AS target_day
        ) d
    ),
    wau AS (
        SELECT target_day AS day_num,
               COUNT(DISTINCT user_id)::BIGINT AS wau
        FROM contrib GROUP BY target_day
    )
    SELECT dau.day_num, dau.dau, wau.wau,
           ROUND(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.day_num = wau.day_num
    ORDER BY dau.day_num
    """,
)
def events_stickiness_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per day — the engagement ratio every consumer
    product reports (what fraction of the week's actives showed up
    today; 1/7 = weekly-only visitors, 1.0 = everyone daily). WAU for
    day d counts distinct users active in [d−6, d], EXACTLY.

    Scale shape: the event volume first collapses to DISTINCT
    (day, user) pairs — the only pass over raw events; each pair then
    fans out to the ≤{WAU_WINDOW_DAYS} window days it serves
    (the same contribute-forward explode sketch_hll_rolling_users
    uses), and the rolling distinct is a two-phase COUNT DISTINCT on
    (day, user) keys. The 7× fanout rides on the deduplicated pair
    table, not on events. At 100 TB the exact form costs one extra
    dedup shuffle; the mergeable-sketch alternative with no fanout is
    `sketch_hll_rolling_users` — this operator is its exact
    calibration twin. Days are reported only where DAU exists (the
    inner join drops lead-in ghost days the fanout creates).

    Determinism: epoch-day integer division, exact integer counts, one
    double division per row (rule: exact operands → identical
    quotient)."""
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    du = track_persist(
        load_events(spark, sf_dir)
        .select(
            F.expr(f"ts_us div {US_PER_DAY_A2}").alias("day_num"), "user_id"
        )
        .distinct()
    )
    dau = du.groupBy("day_num").agg(F.count(F.lit(1)).alias("dau"))
    contrib = du.select(
        F.explode(
            F.sequence(
                F.col("day_num"),
                F.col("day_num") + F.lit(WAU_WINDOW_DAYS - 1),
            )
        ).alias("day_num"),
        "user_id",
    )
    wau = contrib.groupBy("day_num").agg(
        F.countDistinct("user_id").cast("long").alias("wau")
    )
    return (
        dau.join(wau, "day_num")
        .select(
            "day_num",
            "dau",
            "wau",
            F.round(F.col("dau") * F.lit(1.0) / F.col("wau"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day_num")
    )


BOT_MIN_EVENTS = 10        # rules needing a gap distribution require this many
BOT_VOLUME_X_MEAN = 3.0    # flag users above this multiple of mean events/user
BOT_CV_METRONOMIC = 0.5    # coefficient of variation below this = too regular
BOT_PLANT_USER = 10_000_001  # planted scripted user (see docstring)
BOT_PLANT_N = 500            # planted events, exactly 60 s apart


@query(
    "events_bot_screen",
    oracle=f"""
    WITH real AS (
        SELECT user_id, event_type,
               CAST(epoch_us(ts) AS BIGINT) AS ts_us, event_id
        FROM events
    ),
    anchor AS (SELECT MIN(ts_us) AS mn FROM real),
    plant AS (
        SELECT {BOT_PLANT_USER} AS user_id, 'click' AS event_type,
               anchor.mn + i * 60000000 AS ts_us,
               9000000000 + i AS event_id
        FROM anchor, LATERAL (
            SELECT unnest(generate_series(0, {BOT_PLANT_N - 1})) AS i
        ) g
    ),
    e AS (
        SELECT * FROM real UNION ALL SELECT * FROM plant
    ),
    gaps AS (
        SELECT user_id,
               ts_us - LAG(ts_us) OVER (PARTITION BY user_id
                                        ORDER BY ts_us, event_id) AS gap_us
        FROM e
    ),
    gstat AS (
        SELECT user_id,
               CAST(SUM(gap_us) AS BIGINT) AS gsum,
               CAST(SUM(CAST(gap_us AS DECIMAL(19,0)) * gap_us) AS DOUBLE)
                   AS gsum2,
               COUNT(gap_us)::BIGINT AS ng
        FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
    ),
    ustat AS (
        SELECT e.user_id,
               COUNT(*)::BIGINT AS n_events,
               COUNT(DISTINCT e.event_type)::BIGINT AS n_types
        FROM e GROUP BY e.user_id
    ),
    m AS (
        SELECT CAST(SUM(n_events) AS BIGINT) * 1.0 / COUNT(*) AS mean_ev,
               COUNT(*)::BIGINT AS n_users
        FROM ustat
    ),
    per_user AS (
        SELECT u.user_id, u.n_events, u.n_types,
               u.n_events > m.mean_ev * {BOT_VOLUME_X_MEAN!r} AS f_volume,
               u.n_events >= {BOT_MIN_EVENTS} AND u.n_types = 1
                   AS f_monotype,
               CASE WHEN g.ng >= {BOT_MIN_EVENTS - 1}
                         AND g.gsum > 0
                    THEN sqrt(GREATEST(g.gsum2 / g.ng
                              - (g.gsum * 1.0 / g.ng)
                                * (g.gsum * 1.0 / g.ng), 0.0))
                         / (g.gsum * 1.0 / g.ng) < {BOT_CV_METRONOMIC!r}
                    ELSE FALSE END AS f_metronomic
        FROM ustat u
        LEFT JOIN gstat g ON u.user_id = g.user_id
        CROSS JOIN m
    ),
    rules AS (
        SELECT 'volume_gt_{BOT_VOLUME_X_MEAN}x_mean' AS rule,
               CAST(SUM(CASE WHEN f_volume THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flagged
        FROM per_user
        UNION ALL
        SELECT 'single_event_type', CAST(SUM(CASE WHEN f_monotype
                   THEN 1 ELSE 0 END) AS BIGINT) FROM per_user
        UNION ALL
        SELECT 'metronomic_cv_lt_{BOT_CV_METRONOMIC}',
               CAST(SUM(CASE WHEN f_metronomic THEN 1 ELSE 0 END) AS BIGINT)
        FROM per_user
        UNION ALL
        SELECT 'any_rule', CAST(SUM(CASE WHEN f_volume OR f_monotype
                   OR f_metronomic THEN 1 ELSE 0 END) AS BIGINT)
        FROM per_user
    )
    SELECT rules.rule, rules.n_flagged, m.n_users,
           ROUND(rules.n_flagged * 1.0 / m.n_users, 6) AS flagged_share
    FROM rules CROSS JOIN m
    ORDER BY rules.rule
    """,
)
def events_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bot/abuse screen — the rule battery a data pipeline
    runs on its EVENT log the way `quality_gopher_rules` screens text:
    per user, (a) volume above {BOT_VOLUME_X_MEAN}× the mean
    events/user (data-derived threshold, no magic constants), (b) a
    single event type across ≥{BOT_MIN_EVENTS} events (scripted
    single-action loops), (c) metronomic timing — coefficient of
    variation of inter-arrival gaps below {BOT_CV_METRONOMIC} (humans
    are bursty; cron iisn't). One audit row per rule plus the union.

    Scale shape: gap stats and per-user tallies each fold events in
    ONE pass over the user partitioning the other per-user analytics
    reuse (the gap window, then map-side-combinable sums); rules are
    conditional sums over the per-user table; the 1-row corpus mean
    broadcasts. Output is O(#rules) regardless of volume.

    Determinism: gap sums are exact integers (each square computed as
    DECIMAL(19,0)·BIGINT — µs² values overflow a raw BIGINT multiply
    under ANSI on both engines); variance/CV is one
    IEEE tree over exact-integer-derived doubles with a GREATEST(,0)
    clamp for catastrophic cancellation; sqrt is correctly rounded on
    both engines; thresholds enter as identical literals."""
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    real = load_events(spark, sf_dir).select(
        "user_id", "event_type", "ts_us", "event_id"
    )
    anchor = real.agg(F.min("ts_us").alias("mn"))
    plant = anchor.select(
        F.explode(F.sequence(F.lit(0), F.lit(BOT_PLANT_N - 1))).alias("i0"),
        "mn",
    ).select(F.col("i0").cast("long").alias("i"), "mn").select(
        F.lit(BOT_PLANT_USER).cast("long").alias("user_id"),
        F.lit("click").alias("event_type"),
        (F.col("mn") + F.col("i") * F.lit(60_000_000)).alias("ts_us"),
        (F.lit(9_000_000_000) + F.col("i")).alias("event_id"),
    )
    ev = real.unionByName(plant)
    wg = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    gaps = ev.select(
        "user_id", (F.col("ts_us") - F.lag("ts_us").over(wg)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    gstat = gaps.groupBy("user_id").agg(
        F.sum("gap_us").cast("long").alias("gsum"),
        F.sum(F.col("gap_us").cast("decimal(19,0)") * F.col("gap_us"))
        .cast("double")
        .alias("gsum2"),
        F.count("gap_us").alias("ng"),
    )
    ustat = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("event_type").cast("long").alias("n_types"),
    )
    m = ustat.agg(
        (F.sum("n_events").cast("long") * F.lit(1.0) / F.count(F.lit(1))).alias(
            "mean_ev"
        ),
        F.count(F.lit(1)).alias("n_users"),
    )
    gmean = F.col("gsum") * F.lit(1.0) / F.col("ng")
    cv = F.sqrt(
        F.greatest(
            F.col("gsum2") / F.col("ng") - gmean * gmean, F.lit(0.0)
        )
    ) / gmean
    per_user = (
        ustat.join(gstat, "user_id", "left")
        .crossJoin(F.broadcast(m))
        .select(
            (F.col("n_events") > F.col("mean_ev") * BOT_VOLUME_X_MEAN).alias(
                "f_volume"
            ),
            (
                (F.col("n_events") >= BOT_MIN_EVENTS) & (F.col("n_types") == 1)
            ).alias("f_monotype"),
            F.when(
                (F.col("ng") >= BOT_MIN_EVENTS - 1) & (F.col("gsum") > 0),
                cv < BOT_CV_METRONOMIC,
            )
            .otherwise(F.lit(False))
            .alias("f_metronomic"),
            "n_users",
        )
    )
    agg = per_user.agg(
        F.sum(F.when(F.col("f_volume"), 1).otherwise(0)).cast("long").alias("v"),
        F.sum(F.when(F.col("f_monotype"), 1).otherwise(0)).cast("long").alias("t"),
        F.sum(F.when(F.col("f_metronomic"), 1).otherwise(0))
        .cast("long")
        .alias("c"),
        F.sum(
            F.when(
                F.col("f_volume") | F.col("f_monotype") | F.col("f_metronomic"),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("a"),
        F.max("n_users").alias("n_users"),
    )
    rows = agg.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit(f"volume_gt_{BOT_VOLUME_X_MEAN}x_mean").alias("rule"),
                    F.col("v").alias("n_flagged"),
                ),
                F.struct(
                    F.lit("single_event_type").alias("rule"),
                    F.col("t").alias("n_flagged"),
                ),
                F.struct(
                    F.lit(f"metronomic_cv_lt_{BOT_CV_METRONOMIC}").alias("rule"),
                    F.col("c").alias("n_flagged"),
                ),
                F.struct(
                    F.lit("any_rule").alias("rule"), F.col("a").alias("n_flagged")
                ),
            )
        ).alias("r"),
        "n_users",
    ).select("r.rule", "r.n_flagged", "n_users")
    return rows.select(
        "rule",
        "n_flagged",
        "n_users",
        F.round(F.col("n_flagged") * F.lit(1.0) / F.col("n_users"), 6).alias(
            "flagged_share"
        ),
    ).orderBy("rule")


AB_SALT = "'exp_checkout_v1:'"  # experiment salt: new experiment = new salt
AB_Z_CRIT = 1.959963984540054   # two-sided 95% critical value (Python literal
                                # embedded in both plans; no engine erf/quantile)


@query(
    "events_ab_uplift_ztest",
    oracle=f"""
    WITH assigned AS (
        SELECT user_id,
               {sql_md5_hash64(f"{AB_SALT} || CAST(user_id AS VARCHAR)")} % 2
                   AS arm,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS converted,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(27,6)) ELSE 0 END)
                    AS DOUBLE) AS revenue
        FROM events GROUP BY 1, 2
    ),
    arms AS (
        SELECT arm,
               COUNT(*)::BIGINT AS n_users,
               CAST(SUM(converted) AS BIGINT) AS n_converted,
               CAST(SUM(CAST(revenue AS DECIMAL(27,6))) AS DOUBLE)
                   AS revenue
        FROM assigned GROUP BY arm
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN arm = 0 THEN n_users END) AS n0,
            MAX(CASE WHEN arm = 0 THEN n_converted END) AS c0,
            MAX(CASE WHEN arm = 0 THEN revenue END) AS rev0,
            MAX(CASE WHEN arm = 1 THEN n_users END) AS n1,
            MAX(CASE WHEN arm = 1 THEN n_converted END) AS c1,
            MAX(CASE WHEN arm = 1 THEN revenue END) AS rev1
        FROM arms
    ),
    den AS (
        SELECT *,
               sqrt(((c0 + c1) * 1.0 / (n0 + n1))
                    * (1 - (c0 + c1) * 1.0 / (n0 + n1))
                    * (1.0 / n0 + 1.0 / n1)) AS d
        FROM wide
    )
    SELECT n0, c0, n1, c1,
           ROUND(c0 * 1.0 / n0, 6) AS rate0,
           ROUND(c1 * 1.0 / n1, 6) AS rate1,
           ROUND(c1 * 1.0 / n1 - c0 * 1.0 / n0, 6) AS uplift,
           ROUND(CASE WHEN d > 0
                 THEN (c1 * 1.0 / n1 - c0 * 1.0 / n0) / d END, 6) AS z_stat,
           COALESCE(ABS(CASE WHEN d > 0
                 THEN (c1 * 1.0 / n1 - c0 * 1.0 / n0) / d END)
                 > {AB_Z_CRIT!r}, FALSE) AS significant_95,
           ROUND(rev0, 4) AS rev0, ROUND(rev1, 4) AS rev1
    FROM den
    """,
)
def events_ab_uplift_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users hash-split 50/50 by a SALTED md5
    (the per-experiment salt is what makes assignments independent
    across experiments — same user, different experiment, different
    coin), conversion = any purchase, and the two-proportion pooled
    z-test decides significance at the embedded two-sided 95% critical
    value — the experimentation primitive every growth pipeline runs,
    here with the assignment, the uplift, and the decision all in one
    deterministic query. (A null experiment on organic data: the
    significance flag SHOULD be false almost always — the test's own
    calibration check.)

    Scale shape: one pass folds events to per-(user, arm) conversion
    flags and revenue (map-side partials on the user key); the arm
    rollup has 2 rows and the z arithmetic runs on a 1-row pivot.
    Nothing after the first aggregation exceeds 2 rows.

    Determinism: md5 assignment is cross-engine identical (rule 3);
    conversion counts are exact integers; revenue decimal-accumulates;
    the z statistic is one IEEE tree over exact-count-derived doubles
    (sqrt correctly rounded on both engines); the critical value is a
    Python float literal in both plans."""
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    salt = AB_SALT.strip("'")
    ev = load_events(spark, sf_dir).select("user_id", "event_type", "value")
    assigned = (
        ev.groupBy(
            "user_id",
            (
                md5_hash64(F.concat(F.lit(salt), F.col("user_id").cast("string")))
                % 2
            ).alias("arm"),
        )
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(27,6)"),
                ).otherwise(F.lit(0).cast("decimal(27,6)"))
            )
            .cast("double")
            .alias("revenue"),
        )
    )
    arms = assigned.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("long").alias("n_converted"),
        F.sum(F.col("revenue").cast("decimal(27,6)")).cast("double").alias("revenue"),
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n_users"))).alias("n0"),
        F.max(F.when(F.col("arm") == 0, F.col("n_converted"))).alias("c0"),
        F.max(F.when(F.col("arm") == 0, F.col("revenue"))).alias("rev0_raw"),
        F.max(F.when(F.col("arm") == 1, F.col("n_users"))).alias("n1"),
        F.max(F.when(F.col("arm") == 1, F.col("n_converted"))).alias("c1"),
        F.max(F.when(F.col("arm") == 1, F.col("revenue"))).alias("rev1_raw"),
    )
    r0 = F.col("c0") * F.lit(1.0) / F.col("n0")
    r1 = F.col("c1") * F.lit(1.0) / F.col("n1")
    pp = (F.col("c0") + F.col("c1")) * F.lit(1.0) / (F.col("n0") + F.col("n1"))
    # degenerate pools (everyone or no one converted) zero the pooled
    # variance — ANSI divide-by-zero on Spark, inf on DuckDB; guard both
    d = F.sqrt(
        pp * (1 - pp) * (F.lit(1.0) / F.col("n0") + F.lit(1.0) / F.col("n1"))
    )
    z = F.when(d > 0, (r1 - r0) / d)
    return wide.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(r0, 6).alias("rate0"),
        F.round(r1, 6).alias("rate1"),
        F.round(r1 - r0, 6).alias("uplift"),
        F.round(z, 6).alias("z_stat"),
        F.coalesce(F.abs(z) > AB_Z_CRIT, F.lit(False)).alias("significant_95"),
        F.round("rev0_raw", 4).alias("rev0"),
        F.round("rev1_raw", 4).alias("rev1"),
    )
