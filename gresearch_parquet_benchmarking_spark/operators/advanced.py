"""Advanced relational surface: SQL API (grouping sets), exact
percentiles, regexp functions, array higher-order ops, range window
frames, distinct-sum, date min/max, and the salted hot-key aggregation
pattern (the skew tool every 100 TB pipeline eventually needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import (
    dsum,
    iso_date,
    query,
    sql_dsum,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


@query(
    "sql_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS through the SQL API (Catalyst produces
    the same Expand+Aggregate plan as the DataFrame rollup/cube)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        f"""
        SELECT l_returnflag, l_linestatus,
               {sql_dsum('l_quantity')} AS sum_qty,
               COUNT(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE), 6) AS q25,
           ROUND(CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE), 6) AS median,
           ROUND(CAST(quantile_cont(l_quantity, 0.9) AS DOUBLE), 6) AS q90,
           ROUND(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 6) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≙ DuckDB
    quantile_cont, both linear interpolation). The approximate variant
    (approx_percentile / percentile_approx) exists for the 100 TB path
    but its sketch values are engine-specific → benchmarked, not
    oracle-gated."""
    li = _t = load_table(spark, sf_dir, "lineitem")
    return (
        _t.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.25)).cast("double"), 6).alias("q25"),
            F.round(F.percentile("l_quantity", F.lit(0.5)).cast("double"), 6).alias("median"),
            F.round(F.percentile("l_quantity", F.lit(0.9)).cast("double"), 6).alias("q90"),
            F.round(F.percentile("l_extendedprice", F.lit(0.5)).cast("double"), 6).alias(
                "median_price"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "regexp_funcs",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 1) AS first_word,
           regexp_replace(text, ' ', '_', 'g') LIKE '%query%' AS mentions_query,
           CAST(LENGTH(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS consonant_len,
           regexp_matches(text, 'spark') AS has_spark
    FROM documents
    ORDER BY doc_id
    """,
)
def regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar functions (patterns restricted to the POSIX-safe
    subset where Java and RE2 semantics agree)."""
    doc = load_table(spark, sf_dir, "documents")
    return (
        doc.select(
            "doc_id",
            F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 1).alias("first_word"),
            F.regexp_replace("text", " ", "_").like("%query%").alias("mentions_query"),
            F.length(F.regexp_replace("text", "[aeiou]", "")).cast("long").alias("consonant_len"),
            F.col("text").rlike("spark").alias("has_spark"),
        )
        .orderBy("doc_id")
    )


@query(
    "array_ops",
    oracle="""
    SELECT lang,
           array_to_string(list_sort(list_distinct(list(source))), ',') AS sources,
           CAST(LEN(list_distinct(list(source))) AS BIGINT) AS n_sources,
           array_to_string(
               list_filter(list_sort(list_distinct(list(source))), s -> s LIKE 'src1%'),
               ',') AS src1_family
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation + higher-order functions. collect_set order is
    nondeterministic → always array_sort before emitting (arrays are
    emitted as joined strings: engines print list literals
    differently, strings hash identically)."""
    doc = load_table(spark, sf_dir, "documents")
    sorted_sources = F.array_sort(F.collect_set("source"))
    return (
        doc.groupBy("lang")
        .agg(
            F.array_join(sorted_sources, ",").alias("sources"),
            F.size(sorted_sources).cast("long").alias("n_sources"),
            F.array_join(
                F.filter(sorted_sources, lambda s: s.like("src1%")), ","
            ).alias("src1_family"),
        )
        .orderBy("lang")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           COUNT(*) OVER (ORDER BY o_totalprice
                          RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS n_similar_cheaper,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4)))
                OVER (ORDER BY o_totalprice
                      RANGE BETWEEN 5000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS price_mass
    FROM orders
    ORDER BY o_orderkey
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): all orders within
    5000 of the current price. Frame membership depends only on the
    order value → deterministic under ties, unlike ROWS frames.

    Shape (r8, graduated off the global single-partition window): the
    frame width is a plan constant, so the window is value-binned —
    ``bin = floor(price / width)`` — and every row is additionally
    replicated as CONTEXT into bin+1. An owned row's frame
    [p − width, p] reaches at most one bin down (bin width == frame
    width by construction, independent of data distribution — no
    sampled range bounds to trust), so the bin-partitioned window over
    own+context rows computes the EXACT global-window answer:
    originals and their context copies live in different partitions
    (never double-counted), peers at equal price share a bin, and a
    boundary row's lower reach is covered by the previous bin's
    replicas. Context rows are dropped from the output. Cost: 2× rows
    through one hash exchange on `bin` — vs the whole fact table
    through ONE task. Skew: a price hot-spot concentrates one bin;
    the remedy is width tuning (documented), since salting would
    split frame peers."""
    width = 5000
    od = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = F.floor(F.col("o_totalprice") / F.lit(float(width))).cast("long")
    own = od.select(
        "o_orderkey", "o_totalprice", b.alias("bin"), F.lit(False).alias("ctx")
    )
    ctx = od.select(
        "o_orderkey", "o_totalprice", (b + 1).alias("bin"), F.lit(True).alias("ctx")
    )
    w = (
        W.partitionBy("bin")
        .orderBy("o_totalprice")
        .rangeBetween(-width, W.currentRow)
    )
    return (
        own.unionByName(ctx)
        .select(
            "o_orderkey",
            "o_totalprice",
            "ctx",
            F.count(F.lit(1)).over(w).alias("n_similar_cheaper"),
            F.sum(F.col("o_totalprice").cast("decimal(27,4)")).over(w).cast("double").alias(
                "price_mass"
            ),
        )
        .filter(~F.col("ctx"))
        .select("o_orderkey", "o_totalprice", "n_similar_cheaper", "price_mass")
        .orderBy("o_orderkey")
    )


@query(
    "agg_sum_distinct",
    oracle=f"""
    SELECT l_returnflag,
           CAST(SUM(DISTINCT CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_distinct_qty,
           COUNT(DISTINCT l_quantity) AS n_distinct_qty
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_sum_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum_distinct(F.col("l_quantity").cast("decimal(27,4)"))
            .cast("double")
            .alias("sum_distinct_qty"),
            F.countDistinct("l_quantity").alias("n_distinct_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_min_max_dates",
    oracle="""
    SELECT o_custkey,
           CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR) AS first_order,
           CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR) AS last_order,
           DATEDIFF('day', MIN(o_orderdate), MAX(o_orderdate)) AS active_days,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    ORDER BY o_custkey
    """,
)
def agg_min_max_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = load_table(spark, sf_dir, "orders")
    return (
        od.groupBy("o_custkey")
        .agg(
            iso_date(F.min("o_orderdate"), alias="first_order"),
            iso_date(F.max("o_orderdate"), alias="last_order"),
            F.datediff(F.max("o_orderdate").cast("date"), F.min("o_orderdate").cast("date"))
            .cast("long")
            .alias("active_days"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_custkey")
    )


N_SALT = 16


@query(
    "salted_hot_key_agg",
    oracle=f"""
    SELECT user_id, COUNT(*) AS n_events, {sql_dsum('value')} AS total_value
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def salted_hot_key_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation — the manual skew breaker for when
    one key holds a disproportionate share of a 100 TB table:
    phase 1 groups on (key, salt) spreading a hot key over N_SALT
    reducers; phase 2 merges the partials on key alone. The result is
    provably identical to a direct groupBy (the oracle IS the direct
    groupBy); decimal partials keep the re-aggregation exact.

    (Spark's AQE skew handling covers skewed *joins*; aggregation skew
    still needs salting when partial aggregation doesn't collapse the
    hot key map-side.)"""
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    ev = load_events(spark, sf_dir)
    salted = ev.withColumn("_salt", (F.col("event_id") % N_SALT))
    partial = salted.groupBy("user_id", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("value").cast("decimal(27,4)")).alias("_v"),
    )
    return (
        partial.groupBy("user_id")
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_v").cast("double").alias("total_value"),
        )
        .orderBy("user_id")
    )


@query(
    "agg_approx_sketches",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS parts_within_15pct,
           TRUE AS orders_within_5pct,
           TRUE AS median_within_rank_1pct
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate aggregates for the 100 TB path: HyperLogLog++
    distinct counts and t-digest-style quantiles in one pass, no exact
    shuffle-wide distinct.

    Sketch VALUES are engine-implementation-specific, so the oracle
    checks the sketch CONTRACT instead: the engine emits the exact
    values plus booleans asserting each approximation sits within its
    published error bound (HLL rsd=0.05 → |err| ≤ 15% ≈ 3σ; rsd=0.01 →
    ≤ 5%; percentile_approx accuracy=10000 → rank error 1e-4 ≪ the
    checked 0.49–0.51 exact-quantile bracket). The DuckDB twin computes
    the same exact values with literal TRUEs — the value hash matches
    iff every bound holds, turning the former rows-only row into a hard
    driver-checkable contract."""
    li = load_table(spark, sf_dir, "lineitem")
    rel_ok = lambda approx, exact, tol: (  # noqa: E731
        F.abs(approx.cast("double") - exact.cast("double")) <= tol * exact.cast("double")
    )
    approx_parts = F.approx_count_distinct("l_partkey")
    approx_orders = F.approx_count_distinct("l_orderkey", rsd=0.01)
    approx_median = F.percentile_approx("l_extendedprice", 0.5, 10000)
    exact_parts = F.count_distinct(F.col("l_partkey")).cast("long")
    exact_orders = F.count_distinct(F.col("l_orderkey")).cast("long")
    return (
        li.groupBy("l_returnflag")
        .agg(
            exact_parts.alias("exact_parts"),
            exact_orders.alias("exact_orders"),
            rel_ok(approx_parts, exact_parts, 0.15).alias("parts_within_15pct"),
            rel_ok(approx_orders, exact_orders, 0.05).alias("orders_within_5pct"),
            approx_median.between(
                F.percentile("l_extendedprice", F.lit(0.49)),
                F.percentile("l_extendedprice", F.lit(0.51)),
            ).alias("median_within_rank_1pct"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "sample_hash_based",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n_sampled,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS qty_sampled
    FROM lineitem
    WHERE ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sample_hash_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via content hashing (md5(key) % 100 <
    10) — unlike rand()-based sampling this is stable across runs,
    engines, partitionings, and retries: the property a reproducible
    100 TB pipeline needs from its sampling stage."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "_", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    bucket = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % 100
    return (
        li.filter(bucket < 10)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.sum(F.col("l_quantity").cast("decimal(27,4)")).cast("double").alias("qty_sampled"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_regression",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(regr_slope(l_extendedprice, l_quantity) AS DOUBLE), 4) AS slope,
           ROUND(CAST(regr_intercept(l_extendedprice, l_quantity) AS DOUBLE), 4) AS intercept,
           ROUND(CAST(regr_r2(l_extendedprice, l_quantity) AS DOUBLE), 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (price vs quantity per flag) —
    normalized moments, stable to ≫ the rounding guard like corr."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.regr_slope("l_extendedprice", "l_quantity").cast("double"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity").cast("double"), 4).alias(
                "intercept"
            ),
            F.round(F.regr_r2("l_extendedprice", "l_quantity").cast("double"), 6).alias("r2"),
            F.regr_count("l_extendedprice", "l_quantity").cast("long").alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "window_first_last_nth",
    oracle="""
    SELECT o_custkey, o_orderkey,
           FIRST_VALUE(o_orderkey) OVER w AS first_ok,
           LAST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
           NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_ok
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with explicit full frames (last_value over
    the default frame is a classic trap — it sees only up to the
    current row; the unbounded-following frame makes it the true
    partition last on both engines)."""
    od = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            F.first("o_orderkey").over(w).alias("first_ok"),
            F.last("o_orderkey").over(wfull).alias("last_ok"),
            F.nth_value("o_orderkey", 2).over(wfull).alias("second_ok"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "scalar_null_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_returnflag, 'N') AS flag_or_null,
           COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_filled,
           (NULLIF(l_returnflag, 'N') IS NULL) AS was_n,
           IFNULL(NULLIF(CAST(l_quantity AS DOUBLE), 1.0), -1.0) AS qty_or_neg1
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_null_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalars (nullif/coalesce/ifnull/is-null) over
    derived nulls — the corpus itself is null-free, so nullif
    manufactures them deterministically."""
    li = load_table(spark, sf_dir, "lineitem")
    flag_null = F.nullif(F.col("l_returnflag"), F.lit("N"))
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            flag_null.alias("flag_or_null"),
            F.coalesce(flag_null, F.lit("none")).alias("flag_filled"),
            flag_null.isNull().alias("was_n"),
            F.ifnull(
                F.nullif(F.col("l_quantity").cast("double"), F.lit(1.0)), F.lit(-1.0)
            ).alias("qty_or_neg1"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )
