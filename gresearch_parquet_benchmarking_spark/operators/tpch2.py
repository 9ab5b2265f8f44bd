"""TPC-H completion: the 8 adaptations (Q7/Q8/Q9/Q11/Q12/Q15/Q16/Q20)
that finish the full 22-query suite over the driver's TPC-H-ish
testdata.

The testdata has no partsupp table and lineitem lacks
shipmode/commitdate/receiptdate, so — like the existing
q2_cheapest_per_brand — the partsupp-centric queries (Q9/Q11/Q16/Q20)
and Q12 are ADAPTED: each keeps its defining relational shape (the
thing that stresses the optimizer) and swaps the absent column for an
available analog, documented per-query.

Scale posture matches operators/relational.py: nation/region broadcast
(fixed 25/5 rows at any SF), fact joins shuffle on their keys under
AQE, every scalar subquery is a broadcast single-row cross join (never
a driver-side collect), and all float aggregates go through
dsum/sql_dsum decimal accumulation (CLAUDE.md rule 1).

Reference parity: the reference has no joins at all (SURVEY.md §2.9);
this is the §2.9 extension surface the north star requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import (
    dsum,
    query,
    sql_dsum,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev():
    # Built lazily: constructing a Column requires an active SparkContext,
    # and this module must import cleanly before any session exists (the
    # driver may enumerate queries() first).
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


SQL_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum(SQL_REV, 6)} AS revenue
    FROM lineitem
    JOIN orders    ON l_orderkey = o_orderkey
    JOIN customer  ON o_custkey = c_custkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_1', 'NATION_2')
      AND sn.n_name <> cn.n_name
    GROUP BY sn.n_name, cn.n_name, EXTRACT(YEAR FROM l_shipdate)
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue flow between two nations by ship year. The
    nation pair predicate lands on two BROADCAST copies of the 25-row
    nation table, so the heavy lineitem⋈orders⋈customer⋈supplier chain
    is pre-filtered by the broadcast joins before the fact shuffle."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(sn), su.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), cu.c_nationkey == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(_rev(), 6, alias="revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle=f"""
    WITH all_sales AS (
        SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
               {SQL_REV} AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN part      ON l_partkey = p_partkey
        JOIN orders    ON l_orderkey = o_orderkey
        JOIN customer  ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier  ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        WHERE r_name = 'ASIA'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           ROUND(
             {sql_dsum("CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END", 6)}
             / {sql_dsum('volume', 6)}, 6) AS mkt_share
    FROM all_sales
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_5's share of the ASIA PROMO-part market by
    order year. The share is a ratio of two decimal-exact sums with a
    single double division (deterministic cross-engine). 8-way star:
    region/nation broadcast; part is filtered to 1/6 of rows before
    its join (pushdown visible in the scan)."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    od = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cu = _t(spark, sf_dir, "customer")
    su = _t(spark, sf_dir, "supplier")
    cn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    re = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    sales = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(cn), cu.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(re), F.col("cn_region") == re.r_regionkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(sn), su.s_nationkey == F.col("sn_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
        F.lit(0)
    )
    return (
        sales.groupBy("o_year")
        .agg(
            F.round(
                dsum(nation_vol, 6) / dsum(F.col("volume"), 6), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle=f"""
    SELECT sn.n_name AS nation,
           CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS o_year,
           {sql_dsum('l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity', 6)} AS sum_profit
    FROM lineitem
    JOIN part      ON l_partkey = p_partkey
    JOIN supplier  ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    WHERE p_name LIKE '%gear%'
    GROUP BY sn.n_name, EXTRACT(YEAR FROM l_shipdate)
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 adapted: profit by supplier nation and year for parts
    matching a name pattern. The testdata has no partsupp, so
    ps_supplycost is replaced by a 0.6·p_retailprice unit-cost proxy —
    same join tree (lineitem⋈part⋈supplier⋈nation) and the same
    LIKE-pattern part filter, which Spark pushes as a scan filter."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    su = _t(spark, sf_dir, "supplier")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("nation")
    )
    profit = _rev() - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(sn), su.s_nationkey == F.col("sn_key"))
        .withColumn("o_year", F.year("l_shipdate").cast("long"))
        .groupBy("nation", "o_year")
        .agg(dsum(profit, 6, alias="sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "q11_important_stock",
    oracle=f"""
    WITH nation_value AS (
        SELECT l_partkey AS p_key,
               {sql_dsum('p_retailprice * l_quantity', 6)} AS part_value
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_3', 'NATION_4', 'NATION_5')
        GROUP BY l_partkey
    ), total AS (
        -- re-accumulate the doubles in decimal: the mean must be
        -- order-independent or the threshold comparison can flip a
        -- borderline part between engines
        SELECT CAST(SUM(CAST(part_value AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*) AS mean_value
        FROM nation_value
    )
    SELECT p_key AS p_partkey, part_value
    FROM nation_value, total
    WHERE part_value > 2.0 * mean_value
    ORDER BY part_value DESC, p_partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted: 'important inventory' per part, where value
    flows from shipped quantity × retail price (no partsupp). Keeps
    Q11's defining shape — a grouped aggregate HAVING-compared against
    a GLOBAL scalar subquery — executed as a broadcast single-row
    cross join (no collect; the 1-row mean side is broadcast).
    Threshold 2× the MEAN part value: scale-invariant (an absolute
    share fraction empties out as part count grows — the max share is
    ~2.8/nparts in this data), selective (~5-10% qualify), and >0 rows
    at every SF (CLAUDE.md rule 9)."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_4", "NATION_5")
    )
    value = F.col("p_retailprice") * F.col("l_quantity")
    nation_value = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(su, li.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .groupBy(F.col("l_partkey").alias("p_key"))
        .agg(dsum(value, 6, alias="part_value"))
    )
    total = nation_value.agg(
        (
            F.sum(F.col("part_value").cast("decimal(27,6)")).cast("double") / F.count("*")
        ).alias("mean_value")
    )
    return (
        nation_value.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 2.0 * F.col("mean_value"))
        .select(F.col("p_key").alias("p_partkey"), "part_value")
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


@query(
    "q12_late_shipments",
    oracle="""
    SELECT l_linestatus AS ship_class,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
               THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= o_orderdate + INTERVAL 60 DAY
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
)
def q12_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted: the testdata has no
    shipmode/commitdate/receiptdate, so the 'late shipment' predicate
    becomes ship ≥ 60 days after order, classed by l_linestatus. Keeps
    Q12's shape: a non-equi date comparison INSIDE an equi-join plus
    the two-way conditional count pivot on order priority."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    od = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 60 DAYS"))
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum(SQL_REV, 6)} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with max quarterly revenue. The Q15
    view becomes a reused DataFrame subtree; the MAX scalar subquery is
    a broadcast 1-row cross join. Revenue equality is safe because both
    sides compute it with identical decimal accumulation (dsum ≙
    sql_dsum) — exact, order-independent values."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(), 6, alias="total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    su = _t(spark, sf_dir, "supplier")
    return (
        su.join(revenue, su.s_suppkey == F.col("supplier_no"))
        .crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q16_supplier_part_count",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#3'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7'
      )
    GROUP BY p_brand, p_type, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 adapted: distinct supplier counts per part
    (brand, type, size) — supply relationships read from lineitem
    instead of the absent partsupp; the 'customer complaints' NOT IN
    becomes a broadcast anti-join on a supplier-name pattern. The
    distinct-count shuffles (brand, type, size, suppkey) — constant
    width — then counts per group."""
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    bad_su = _t(spark, sf_dir, "supplier").filter(F.col("s_name").like("%7")).select(
        "s_suppkey"
    )
    return (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .join(
            F.broadcast(bad_su), li.l_suppkey == bad_su.s_suppkey, "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
    )


@query(
    "q20_promo_suppliers",
    oracle=f"""
    WITH shipped AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum('l_quantity', 4)} AS qty
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'ECONOMY'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey
    ), bar AS (
        SELECT 0.5 * CAST(SUM(CAST(qty AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*) AS threshold
        FROM shipped
    )
    SELECT s_suppkey, s_name, n_name, qty AS economy_qty
    FROM supplier
    JOIN shipped ON s_suppkey = supplier_no
    JOIN nation  ON s_nationkey = n_nationkey
    CROSS JOIN bar
    WHERE qty > threshold
    ORDER BY s_suppkey
    """,
)
def q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted: suppliers who shipped an above-threshold
    volume of ECONOMY parts in 1996 (no partsupp availqty, so the
    '> 0.5 × shipped' availability test becomes '> 0.5 × the mean
    shipped quantity'). Keeps Q20's nested-subquery shape: an inner
    part-filtered aggregate, a scalar threshold derived from it
    (broadcast 1-row cross join), and the final supplier⋈nation
    projection."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    pa = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    shipped = (
        li.join(pa, li.l_partkey == pa.p_partkey)
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_quantity"), 4, alias="qty"))
    )
    bar = shipped.agg(
        (
            0.5 * F.sum(F.col("qty").cast("decimal(27,4)")).cast("double") / F.count("*")
        ).alias("threshold")
    )
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    return (
        su.join(shipped, su.s_suppkey == F.col("supplier_no"))
        .join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .crossJoin(F.broadcast(bar))
        .filter(F.col("qty") > F.col("threshold"))
        .select("s_suppkey", "s_name", "n_name", F.col("qty").alias("economy_qty"))
        .orderBy("s_suppkey")
    )
