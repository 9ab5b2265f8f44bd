"""Relational operator surface: scan/filter/project/join/aggregate/
window/sort/limit/set-ops/pivot/unpivot + scalar function library.

The reference contains no relational operators (SURVEY.md §2.9 — its
only join-like code is a commented-out pandas merge at
scripts/visualize_stats.py:65-80, its aggregations are pandas
pivot_table/corr in the report layer, A5/A6). This module provides the
full surface Spark-first, over the driver's TPC-H-ish testdata, each
query oracle-checked against DuckDB.

Scale design notes (100 TB posture):
* Fixed-cardinality dims (region=5, nation=25) are explicitly
  broadcast — no shuffle for those joins at any scale.
* Fact-fact joins (lineitem⋈orders) shuffle on the join key; AQE
  handles skew/coalescing (session.py). No collect()-based logic.
* Filters are plain column predicates on scan columns → Catalyst
  pushes them into the parquet scan (asserted in tests/test_plans.py).
* Top-K uses window row_number with a unique tiebreaker, which Spark
  executes as a partial top-K per partition before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import (
    davg,
    dsum,
    iso_date,
    query,
    sql_davg,
    sql_dsum,
    sql_iso_date,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan→filter→hash-agg→sort)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount', 6)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", alias="sum_qty"),
            dsum("l_extendedprice", alias="sum_base_price"),
            dsum(disc_price, 6, alias="sum_disc_price"),
            dsum(charge, 6, alias="sum_charge"),
            davg("l_quantity", alias="avg_qty"),
            davg("l_extendedprice", alias="avg_price"),
            davg("l_discount", 6, alias="avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 6)} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure filter + single global aggregate — exercises predicate
    pushdown + row-group skipping on l_shipdate min/max stats."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.09))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), 6, alias="revenue"))
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           {sql_iso_date('o_orderdate')} AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate  > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join → agg → top-10. lineitem⋈orders shuffles on the order
    key; customer SCALES with SF so it gets no broadcast hint — AQE's
    size-based auto-broadcast picks it up at small SFs and correctly
    shuffles it at scale."""
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    od = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp")
    )
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .groupBy(
            "l_orderkey",
            iso_date("o_orderdate", alias="orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, alias="revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """6-way star join. region/nation broadcast (fixed cardinality: 5
    and 25 rows at ANY scale factor); supplier/customer scale with SF
    → no hint, AQE decides by size; the fact joins shuffle on orderkey
    then custkey."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(
            su,
            (li.l_suppkey == su.s_suppkey) & (cu.c_nationkey == su.s_nationkey),
        )
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, alias="revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-10-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    na = _t(spark, sf_dir, "nation")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, alias="revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "n_name")
    )


@query(
    "join_left_outer",
    oracle=f"""
    SELECT c_custkey, c_name,
           COUNT(o_orderkey) AS n_orders,
           {sql_dsum('o_totalprice')} AS total_spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders; COUNT(col)
    skips nulls so order-less customers show 0."""
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    return (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice", alias="total_spend"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_semi",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_partkey = p_partkey AND l_quantity > 45
    )
    ORDER BY p_partkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = _t(spark, sf_dir, "part")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        pa.join(li, pa.p_partkey == li.l_partkey, "left_semi")
        .select("p_partkey", "p_name", "p_retailprice")
        .orderBy("p_partkey")
    )


@query(
    "join_anti",
    oracle="""
    SELECT o_orderkey, o_orderstatus
    FROM orders
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_quantity > 44
    )
    ORDER BY o_orderkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join: orders containing no high-quantity line. (Phrased
    against lineitem rather than the classic customers-without-orders,
    which is vacuously empty on this testdata at every SF.)"""
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 44)
    return (
        od.join(li, od.o_orderkey == li.l_orderkey, "left_anti")
        .select("o_orderkey", "o_orderstatus")
        .orderBy("o_orderkey")
    )


@query(
    "join_full_outer",
    oracle="""
    SELECT COALESCE(s_nationkey, c_nationkey) AS nationkey,
           COUNT(DISTINCT s_suppkey) AS n_supp,
           COUNT(DISTINCT c_custkey) AS n_cust
    FROM (SELECT DISTINCT s_nationkey, s_suppkey FROM supplier) s
    FULL OUTER JOIN (SELECT DISTINCT c_nationkey, c_custkey FROM customer) c
      ON s_nationkey = c_nationkey
    GROUP BY COALESCE(s_nationkey, c_nationkey)
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = _t(spark, sf_dir, "supplier").select("s_nationkey", "s_suppkey").distinct()
    cu = _t(spark, sf_dir, "customer").select("c_nationkey", "c_custkey").distinct()
    return (
        su.join(cu, su.s_nationkey == cu.c_nationkey, "full_outer")
        .groupBy(F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"))
        .agg(
            F.countDistinct("s_suppkey").alias("n_supp"),
            F.countDistinct("c_custkey").alias("n_cust"),
        )
        .orderBy("nationkey")
    )


@query(
    "join_cross_small",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
)
def join_cross_small(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of the two fixed-cardinality dims (5×25 rows) —
    broadcast nested loop, no shuffle."""
    re = _t(spark, sf_dir, "region")
    na = _t(spark, sf_dir, "nation")
    return re.crossJoin(F.broadcast(na)).select("r_name", "n_name").orderBy("r_name", "n_name")


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------

@query(
    "window_rank_in_brand",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice,
           CAST(RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS price_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS BIGINT) AS price_dense_rank
    FROM part
    ORDER BY p_brand, price_rank
    """,
)
def window_rank_in_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price ranks WITHOUT the brand-keyed window (late r9):
    p_brand has 25 fixed values, so PARTITION BY p_brand sorted
    |part|/25 rows on single tasks while part grows linearly with SF.
    The ORDER BY (p_retailprice DESC, p_partkey) is a TOTAL order
    (p_partkey unique), so RANK == DENSE_RANK == ROW_NUMBER — the
    oracle keeps the window-function SQL; the engine computes the
    identical ranks via the _grouped_row_number two-pass (widest task
    |part|/ranges)."""
    from gresearch_parquet_benchmarking_spark.operators.analytics import (
        _grouped_row_number,
    )

    pa = _t(spark, sf_dir, "part")
    ranked = _grouped_row_number(
        pa.select("p_brand", "p_partkey", "p_retailprice"),
        ["p_brand"],
        [F.desc("p_retailprice"), F.asc("p_partkey")],
        alias="price_rank",
    )
    return ranked.select(
        "p_brand",
        "p_partkey",
        "p_retailprice",
        "price_rank",
        F.col("price_rank").alias("price_dense_rank"),
    ).orderBy("p_brand", "price_rank")


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
               AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum per customer. Decimal accumulator keeps the running
    frame order-exact (frame order is already deterministic; decimal
    guards the partial-agg ordering inside Spark)."""
    od = _t(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            iso_date("o_orderdate", alias="orderdate"),
            F.sum(F.col("o_totalprice").cast("decimal(27,4)")).over(w).cast("double").alias("running_spend"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           LAG(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
           LEAD(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey,
           CAST(o_totalprice - LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS spend_delta
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            F.lag("o_orderkey").over(w).alias("prev_orderkey"),
            F.lead("o_orderkey").over(w).alias("next_orderkey"),
            (F.col("o_totalprice") - F.lag("o_totalprice").over(w)).cast("double").alias("spend_delta"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "window_moving_avg",
    oracle="""
    SELECT user_id, event_id,
           ROUND(CAST(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS DOUBLE), 4) AS moving_avg_5
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-row moving average of event value per user. The frame has ≤5
    rows so double summation order is fixed by the frame — exact across
    engines up to one rounding guard."""
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    ev = load_events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, W.currentRow)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.round(F.avg("value").over(w).cast("double"), 4).alias("moving_avg_5"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
        FROM customer
    )
    WHERE rn <= 3
    ORDER BY c_mktsegment, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per segment — Spark plans this as a
    WindowGroupLimit (partial top-K before the shuffle) since 3.5."""
    cu = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cu.select("c_mktsegment", "c_custkey", "c_acctbal", F.row_number().over(w).cast("long").alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    )


@query(
    "window_ntile_percent",
    oracle="""
    SELECT p_partkey, p_size,
           CAST(NTILE(4) OVER (ORDER BY p_size, p_partkey) AS BIGINT) AS size_quartile,
           ROUND(CAST(PERCENT_RANK() OVER (ORDER BY p_size, p_partkey) AS DOUBLE), 6) AS pr,
           CAST(CUME_DIST() OVER (ORDER BY p_size, p_partkey) AS DOUBLE) AS cd
    FROM part
    ORDER BY p_partkey
    """,
)
def window_ntile_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global NTILE/PERCENT_RANK/CUME_DIST over part WITHOUT an
    Exchange SinglePartition (the r9 two-pass pattern): the order key
    (p_size, p_partkey) is a TOTAL order, so all three functions are
    exact map-side arithmetic on the global row number —
    NTILE via _ntile_from_rank (ANSI bucket spread), PERCENT_RANK =
    (rn−1)/(n−1), CUME_DIST = rn/n (no ties ⇒ rank == row count ≤
    current == rn). Both divisions take integers < 2^52, so the
    doubles are the same correctly-rounded quotients DuckDB's window
    functions produce — hash-identical to the windowed oracle. part
    grows linearly with SF, so the retired single-partition window is
    the plan that would not survive 100×."""
    from gresearch_parquet_benchmarking_spark.operators.analytics import (
        _global_row_number,
        _ntile_from_rank,
    )

    pa = _t(spark, sf_dir, "part")
    ranked, n = _global_row_number(
        pa.select("p_partkey", "p_size"), ["p_size", "p_partkey"], alias="rn"
    )
    pr = (
        (F.col("rn") - 1).cast("double") / F.lit(float(n - 1))
        if n > 1
        else F.lit(0.0)
    )
    return ranked.select(
        "p_partkey",
        "p_size",
        _ntile_from_rank(F.col("rn"), n, 4).alias("size_quartile"),
        F.round(pr, 6).alias("pr"),
        (F.col("rn").cast("double") / F.lit(float(n))).alias("cd"),
    ).orderBy("p_partkey")


# ---------------------------------------------------------------------------
# Aggregation variants
# ---------------------------------------------------------------------------

@query(
    "agg_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey) AS n_customers,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 optimization round (guide §2.3 aggregate-before-shuffle): a
    # direct rollup expands every input row ×3 grouping sets BEFORE
    # the partial aggregate. Pre-aggregating to the finest (flag,
    # status) grain first shrinks the Expand input from |lineitem| to
    # ≤ |flag×status| rows; the outer rollup then re-sums the exact
    # decimal partials (decimal addition is associative, count → sum
    # of counts), so every output value is bit-identical. Both key
    # columns are TPC-H NOT NULL, so rollup NULL markers cannot
    # collide with data NULLs.
    li = _t(spark, sf_dir, "lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(27,4)")).alias("dq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        base.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum("dq").cast("double").alias("sum_qty"),
            F.sum("cnt").cast("long").alias("n"),
        )
        .orderBy(F.asc_nulls_first("l_returnflag"), F.asc_nulls_first("l_linestatus"))
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {sql_dsum('o_totalprice')} AS sum_price,
           COUNT(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Same two-level shape as agg_rollup (r12): pre-aggregate to the
    # finest grain, cube the tiny aggregate, re-sum exact decimals.
    # Both keys are TPC-H NOT NULL, so cube NULL markers are
    # unambiguous.
    od = _t(spark, sf_dir, "orders")
    base = od.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.sum(F.col("o_totalprice").cast("decimal(27,4)")).alias("dp"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        base.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.sum("dp").cast("double").alias("sum_price"),
            F.sum("cnt").cast("long").alias("n"),
        )
        .orderBy(F.asc_nulls_first("o_orderstatus"), F.asc_nulls_first("o_orderpriority"))
    )


@query(
    "agg_stats_moments",
    oracle="""
    SELECT l_returnflag,
           CAST(MIN(l_quantity) AS DOUBLE) AS min_qty,
           CAST(MAX(l_quantity) AS DOUBLE) AS max_qty,
           ROUND(CAST(STDDEV_SAMP(l_quantity) AS DOUBLE), 4) AS std_qty,
           ROUND(CAST(VAR_SAMP(l_quantity) AS DOUBLE), 4) AS var_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max/stddev/variance. Moments are order-sensitive in the last
    ulps → rounded to 4 decimals on both sides (values are O(10))."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.min("l_quantity").cast("double").alias("min_qty"),
            F.max("l_quantity").cast("double").alias("max_qty"),
            F.round(F.stddev_samp("l_quantity").cast("double"), 4).alias("std_qty"),
            F.round(F.var_samp("l_quantity").cast("double"), 4).alias("var_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
           {sql_dsum("CASE WHEN o_totalprice > 100000 THEN o_totalprice ELSE 0 END")} AS big_spend
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupBy("o_orderpriority")
        .agg(
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
            F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
            dsum(
                F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice")).otherwise(0.0),
                alias="big_spend",
            ),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "having_filter",
    oracle=f"""
    SELECT l_partkey, COUNT(*) AS n, {sql_dsum('l_quantity')} AS qty
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) > 30
    ORDER BY l_partkey
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", alias="qty"))
        .filter(F.col("n") > 30)
        .orderBy("l_partkey")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------

@query(
    "set_union_distinct",
    oracle="""
    SELECT custkey FROM (
        SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 200000
        UNION
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0
    ) ORDER BY custkey
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    a = od.filter(F.col("o_totalprice") > 200000).select(F.col("o_custkey").alias("custkey"))
    b = cu.filter(F.col("c_acctbal") < 0).select(F.col("c_custkey").alias("custkey"))
    return a.union(b).distinct().orderBy("custkey")


@query(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY custkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    a = od.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    b = od.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b).orderBy("custkey")


@query(
    "set_except",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    ORDER BY custkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers with finished orders but no open ones
    (non-empty at every SF, unlike customers-minus-orderers)."""
    od = _t(spark, sf_dir, "orders")
    f = od.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    o = od.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    # subtract = SET except (SQL EXCEPT); exceptAll is bag semantics
    # and would keep customers whose F-order count merely exceeds
    # their O-order count
    return f.subtract(o).orderBy("custkey")


# ---------------------------------------------------------------------------
# Sort / limit / sampling-free top-k  (reference R7 table viewer,
# /root/reference/src/table_viewer.cc:6-48, shows first 20 rows)
# ---------------------------------------------------------------------------

@query(
    "sort_limit_viewer",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    LIMIT 20
    """,
)
def sort_limit_viewer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark analog of the reference's table viewer: deterministic
    first-20 via full ordering (the reference shows file order, which
    is not stable across engines → order by the natural key)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(20)
    )


@query(
    "multi_key_sort",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC, o_orderkey ASC
    LIMIT 50
    """,
)
def multi_key_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return (
        od.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy(F.asc("o_orderstatus"), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Scalar function library (string / date / math / conditional)
# ---------------------------------------------------------------------------

@query(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand) AS brand_upper,
           LOWER(p_type) AS type_lower,
           SUBSTR(p_name, 1, 5) AS name_prefix,
           LENGTH(p_name) AS name_len,
           CONCAT(p_brand, ':', p_type) AS brand_type,
           REPLACE(p_type, ' ', '_') AS type_snake,
           CONTAINS(p_type, 'BRUSHED') AS is_brushed,
           SPLIT_PART(p_type, ' ', 1) AS type_first_word,
           TRIM(CONCAT('  ', p_brand, '  ')) AS trimmed
    FROM part
    ORDER BY p_partkey
    """,
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = _t(spark, sf_dir, "part")
    return (
        pa.select(
            "p_partkey",
            F.upper("p_brand").alias("brand_upper"),
            F.lower("p_type").alias("type_lower"),
            F.substring("p_name", 1, 5).alias("name_prefix"),
            F.length("p_name").cast("long").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
            F.col("p_type").contains("BRUSHED").alias("is_brushed"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_first_word"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        )
        .orderBy("p_partkey")
    )


@query(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS odate,
           EXTRACT(YEAR FROM o_orderdate) AS oyear,
           EXTRACT(MONTH FROM o_orderdate) AS omonth,
           EXTRACT(DAY FROM o_orderdate) AS oday,
           DAYOFWEEK(o_orderdate) % 7 + 1 AS dow,
           CAST(CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS VARCHAR) AS month_start,
           CAST(CAST(o_orderdate + INTERVAL 90 DAY AS DATE) AS VARCHAR) AS due_date,
           DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since_95
    FROM orders
    ORDER BY o_orderkey
    """,
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions. DuckDB DAYOFWEEK is 1=Mon..7=Sun ISO-ish;
    Spark dayofweek is 1=Sun..7=Sat — the oracle remaps to Spark's
    convention so both emit the same integer."""
    od = _t(spark, sf_dir, "orders")
    return (
        od.select(
            "o_orderkey",
            iso_date("o_orderdate", alias="odate"),
            F.year("o_orderdate").cast("long").alias("oyear"),
            F.month("o_orderdate").cast("long").alias("omonth"),
            F.dayofmonth("o_orderdate").cast("long").alias("oday"),
            F.dayofweek("o_orderdate").cast("long").alias("dow"),
            iso_date(F.date_trunc("month", "o_orderdate"), alias="month_start"),
            F.date_add(F.col("o_orderdate").cast("date"), 90).cast("string").alias("due_date"),  # already date-typed; plain string cast
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
            .cast("long")
            .alias("days_since_95"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "scalar_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount - 0.05) AS abs_d,
           ROUND(l_extendedprice, 1) AS rounded_price,
           CAST(CEIL(l_quantity) AS DOUBLE) AS ceil_q,
           CAST(FLOOR(l_quantity) AS DOUBLE) AS floor_q,
           ROUND(SQRT(l_extendedprice), 6) AS sqrt_price,
           ROUND(LN(l_extendedprice + 1), 6) AS ln_price,
           ROUND(LOG10(l_extendedprice + 1), 6) AS log10_price,
           ROUND(POW(l_discount, 2), 10) AS disc_sq,
           MOD(l_orderkey, 7) AS key_mod7,
           CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sign_d,
           GREATEST(l_quantity, 25.0) AS q_hi,
           LEAST(l_quantity, 25.0) AS q_lo
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.abs(F.col("l_discount") - 0.05).alias("abs_d"),
            F.round("l_extendedprice", 1).alias("rounded_price"),
            F.ceil("l_quantity").cast("double").alias("ceil_q"),
            F.floor("l_quantity").cast("double").alias("floor_q"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
            F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
            F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("log10_price"),
            F.round(F.pow("l_discount", F.lit(2)), 10).alias("disc_sq"),
            (F.col("l_orderkey") % 7).alias("key_mod7"),
            F.signum(F.col("l_discount") - 0.05).cast("double").alias("sign_d"),
            F.greatest(F.col("l_quantity"), F.lit(25.0)).alias("q_hi"),
            F.least(F.col("l_quantity"), F.lit(25.0)).alias("q_lo"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "case_when_recode",
    oracle="""
    SELECT band, COUNT(*) AS n
    FROM (
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 150000 THEN 'medium'
                    WHEN o_totalprice < 300000 THEN 'large'
                    ELSE 'jumbo' END AS band
        FROM orders
    )
    GROUP BY band ORDER BY band
    """,
)
def case_when_recode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical recode (reference A2: visualize_chunks_pages.py:17-18
    maps stats-level ints to labels the same way)."""
    od = _t(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .when(F.col("o_totalprice") < 300000, "large")
        .otherwise("jumbo")
    )
    return od.select(band.alias("band")).groupBy("band").agg(F.count(F.lit(1)).alias("n")).orderBy("band")


# ---------------------------------------------------------------------------
# Pivot / unpivot (reference A4/A5: visualize_data_reads.py:15-17 melt,
# vizualize_row_groups.py:18 pivot_table)
# ---------------------------------------------------------------------------

@query(
    "pivot_avg",
    oracle=f"""
    SELECT l_returnflag,
           {sql_davg("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F,
           {sql_davg("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def pivot_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(davg("l_quantity"))
        .orderBy("l_returnflag")
    )


@query(
    "unpivot_long",
    oracle="""
    SELECT l_orderkey, l_linenumber, metric, CAST(value AS DOUBLE) AS value
    FROM (
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    )
    ORDER BY l_orderkey, l_linenumber, metric
    """,
)
def unpivot_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long melt (reference A4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_discount", "l_tax"],
            "metric",
            "value",
        )
        .withColumn("value", F.col("value").cast("double"))
        .orderBy("l_orderkey", "l_linenumber", "metric")
    )


@query(
    "corr_matrix",
    oracle="""
    SELECT ROUND(CAST(CORR(l_quantity, l_extendedprice) AS DOUBLE), 6) AS corr_qty_price,
           ROUND(CAST(CORR(l_quantity, l_discount) AS DOUBLE), 6) AS corr_qty_disc,
           ROUND(CAST(CORR(l_extendedprice, l_tax) AS DOUBLE), 6) AS corr_price_tax
    FROM lineitem
    """,
)
def corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise correlations (reference A6: vizualize_row_groups.py:50-52
    computes a 6-metric pandas .corr() matrix). Rounded: corr is a
    normalized moment, stable to ≫6 decimals."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice").cast("double"), 6).alias("corr_qty_price"),
        F.round(F.corr("l_quantity", "l_discount").cast("double"), 6).alias("corr_qty_disc"),
        F.round(F.corr("l_extendedprice", "l_tax").cast("double"), 6).alias("corr_price_tax"),
    )


# ---------------------------------------------------------------------------
# Subqueries & derived tables
# ---------------------------------------------------------------------------

@query(
    "subquery_above_avg",
    oracle="""
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
    ORDER BY p_partkey
    """,
)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery via cross-joined 1-row aggregate (broadcast —
    no shuffle). Comparison only, so plain double AVG is safe: both
    engines agree on > for values not astronomically close; the
    threshold compare uses the engine's own avg consistently... but for
    hash-exactness the avg is decimal-derived on both sides."""
    pa = _t(spark, sf_dir, "part")
    avg_df = pa.agg(davg("p_retailprice", alias="avg_price"))
    return (
        pa.crossJoin(F.broadcast(avg_df))
        .filter(F.col("p_retailprice") > F.col("avg_price"))
        .select("p_partkey", "p_retailprice")
        .orderBy("p_partkey")
    )


@query(
    "in_subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
    ORDER BY o_orderkey
    """,
)
def in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "AUTOMOBILE")
    return (
        od.join(cu, od.o_custkey == cu.c_custkey, "left_semi")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "correlated_exists_agg",
    oracle=f"""
    SELECT n_name, COUNT(*) AS n_big_suppliers
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_acctbal > (SELECT AVG(s_acctbal) FROM supplier)
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def correlated_exists_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    avg_df = su.agg(davg("s_acctbal", alias="avg_bal"))
    return (
        su.crossJoin(F.broadcast(avg_df))
        .filter(F.col("s_acctbal") > F.col("avg_bal"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_big_suppliers"))
        .orderBy("n_name")
    )
