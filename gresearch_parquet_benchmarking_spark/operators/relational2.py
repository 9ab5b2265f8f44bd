"""Second relational batch: join-on-aggregate (TPC-H Q17/Q18 shapes)
and the MERGE/SCD2 emulation pattern (Spark without Delta: anti-join +
union — the upsert every warehouse needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


@query(
    "q17_small_quantity_revenue",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey AS pk, {sql_davg('l_quantity')} AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT {sql_dsum('l_extendedprice')} AS total_price,
           COUNT(*) AS n_small_lines
    FROM lineitem JOIN part_avg ON l_partkey = pk
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: join the fact table against its own per-group
    aggregate (below-half-average quantity lines). The aggregate side
    is grouped on the join key, so the join co-partitions with the
    aggregation — one shuffle serves both."""
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(davg("l_quantity", alias="avg_qty"))
    return (
        li.join(part_avg, li.l_partkey == part_avg.pk)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice", alias="total_price"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


@query(
    "q18_large_volume_customers",
    oracle=f"""
    WITH big_orders AS (
        SELECT l_orderkey AS ok, {sql_dsum('l_quantity')} AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(27,4))) > 150
    )
    SELECT c_custkey, c_name, o_orderkey,
           {sql_iso_date('o_orderdate')} AS orderdate,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice,
           total_qty
    FROM big_orders
    JOIN orders ON o_orderkey = ok
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: HAVING-filtered aggregate driving a join chain. The
    big_orders aggregate shrinks the join input by orders of magnitude
    before any wide row is assembled."""
    li = load_table(spark, sf_dir, "lineitem")
    od = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy(F.col("l_orderkey").alias("ok"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,4)")).alias("_tq"))
        .filter(F.col("_tq") > 150)
        .select("ok", F.col("_tq").cast("double").alias("total_qty"))
    )
    return (
        big.join(od, od.o_orderkey == big.ok)
        .join(cu, cu.c_custkey == od.o_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            iso_date("o_orderdate", alias="orderdate"),
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@query(
    "merge_upsert_orders",
    oracle="""
    WITH updates AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 1.1 AS o_totalprice
        FROM orders WHERE o_orderkey % 10 = 0
    ),
    inserts AS (
        SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
               'N' AS o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 100 = 0
    ),
    merged AS (
        SELECT * FROM updates
        UNION ALL
        SELECT * FROM inserts
        UNION ALL
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey NOT IN (SELECT o_orderkey FROM updates)
    )
    SELECT o_orderkey, o_custkey, o_orderstatus,
           ROUND(CAST(o_totalprice AS DOUBLE), 4) AS o_totalprice
    FROM merged
    ORDER BY o_orderkey
    """,
)
def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulated without a lakehouse format (the v1-image
    pattern): target rows not matched by the update-set (anti-join) ∪
    updated rows ∪ brand-new rows. One shuffle on the merge key; at
    scale the same plan runs partition-wise on a date-partitioned
    target so only touched partitions rewrite."""
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    updates = od.filter(F.col("o_orderkey") % 10 == 0).withColumn(
        "o_totalprice", F.col("o_totalprice") * 1.1
    )
    inserts = od.filter(F.col("o_orderkey") % 100 == 0).select(
        (F.col("o_orderkey") + 10_000_000).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
    )
    untouched = od.join(updates.select("o_orderkey"), "o_orderkey", "left_anti")
    merged = untouched.unionByName(updates).unionByName(inserts)
    return merged.select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice").cast("double"), 4).alias("o_totalprice"),
    ).orderBy("o_orderkey")


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 6)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: OR-of-conjunction predicates spanning both join
    sides. Catalyst extracts the common-subexpression filters it can
    push (p_brand IN (...), l_quantity range hull) below the join and
    evaluates the residual disjunction post-join — the optimizer case
    disjunctions exist to test."""
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    j = li.join(pa, pa.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return j.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6, alias="revenue"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "q22_idle_customers",
    oracle=f"""
    WITH cnt AS (
        SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ),
    avg_bal AS (
        SELECT {sql_davg('c_acctbal')} AS ab FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           {sql_dsum('c_acctbal')} AS total_bal
    FROM customer LEFT JOIN cnt ON o_custkey = c_custkey, avg_bal
    WHERE COALESCE(n, 0) < 7
      AND c_acctbal > ab
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar-subquery threshold + activity anti-filter —
    above-average-balance customers with fewer than 7 orders (this
    testdata has essentially no zero-order customers, so the classic
    NOT EXISTS form is vacuously empty; the low-activity variant keeps
    the same plan shape with a non-trivial result at every SF). The
    order counts group on the join key — one shuffle serves both."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    cnt = od.groupBy(F.col("o_custkey")).agg(F.count(F.lit(1)).alias("n"))
    avg_bal = cu.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal", alias="ab"))
    return (
        cu.join(cnt, cu.c_custkey == cnt.o_custkey, "left")
        .crossJoin(F.broadcast(avg_bal))
        .filter((F.coalesce(F.col("n"), F.lit(0)) < 7) & (F.col("c_acctbal") > F.col("ab")))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("c_acctbal", alias="total_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "q2_cheapest_per_brand",
    oracle="""
    SELECT p.p_brand, p.p_partkey, p.p_name,
           CAST(p.p_retailprice AS DOUBLE) AS p_retailprice
    FROM part p
    WHERE p.p_retailprice = (
        SELECT MIN(p2.p_retailprice) FROM part p2 WHERE p2.p_brand = p.p_brand
    )
    ORDER BY p.p_brand, p.p_partkey
    """,
)
def q2_cheapest_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated MIN subquery per group (cheapest part of
    each brand, ties kept). Decorrelated the Spark way: per-brand min
    aggregate joined back — one shuffle on the correlation key, which
    is how Catalyst rewrites the correlated form anyway."""
    pa = load_table(spark, sf_dir, "part")
    brand_min = pa.groupBy(F.col("p_brand").alias("b")).agg(
        F.min("p_retailprice").alias("min_price")
    )
    return (
        pa.join(
            brand_min,
            (pa.p_brand == brand_min.b) & (pa.p_retailprice == brand_min.min_price),
        )
        .select(
            "p_brand", "p_partkey", "p_name",
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
        )
        .orderBy("p_brand", "p_partkey")
    )


@query(
    "q4_priority_with_big_lines",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_quantity > 45
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_priority_with_big_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: date-filtered EXISTS semi-join feeding an aggregation
    (the commit-date predicate adapted to this schema's columns)."""
    od = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        od.join(li, od.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    WITH per_customer AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT JOIN orders ON o_custkey = c_custkey
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_customer
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13: histogram of a histogram — orders per customer, then
    customers per order-count. Two chained aggregations; the second
    groups on the first's output (tiny), so only the first shuffles
    real data."""
    cu = load_table(spark, sf_dir, "customer")
    od = load_table(spark, sf_dir, "orders")
    per_customer = (
        cu.join(od, cu.c_custkey == od.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_customer.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_revenue_ratio",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))
                 ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01'
      AND l_shipdate < TIMESTAMP '1996-04-01'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: conditional-aggregate ratio (promo share of revenue).
    Both sums decimal-exact, final division one double op."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    pa = load_table(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(27,6)")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(27,6)"))
    return li.join(pa, li.l_partkey == pa.p_partkey).agg(
        (100.0 * F.sum(promo).cast("double") / F.sum(rev).cast("double"))
        .cast("double")
        .alias("promo_revenue_pct")
    )


@query(
    "q21_multi_supplier_orders",
    oracle="""
    SELECT s.s_suppkey, s.s_name, COUNT(DISTINCT l1.l_orderkey) AS n_shared_orders
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey = l1.l_suppkey
          AND l3.l_quantity > 49
    )
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY s.s_suppkey
    """,
)
def q21_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS + NOT EXISTS self-correlations on the fact
    table (orders a supplier shares with other suppliers, excluding
    any where that supplier shipped a >49-quantity line). Both
    correlations become semi/anti self-joins on (orderkey[, suppkey])
    — three passes over lineitem, one shuffle key each."""
    su = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey")
    # EXISTS other-supplier line in same order
    other = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    with_other = l1.join(
        other, (l1.l_orderkey == other.o2) & (l1.l_suppkey != other.s2), "left_semi"
    )
    # NOT EXISTS own big line in same order
    big_own = li.filter(F.col("l_quantity") > 49).select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    kept = with_other.join(
        big_own,
        (with_other.l_orderkey == big_own.o3) & (with_other.l_suppkey == big_own.s3),
        "left_anti",
    )
    return (
        kept.join(su, kept.l_suppkey == su.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.countDistinct("l_orderkey").alias("n_shared_orders"))
        .orderBy("s_suppkey")
    )
