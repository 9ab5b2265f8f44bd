"""Column profiler: the data-quality triage pass every ingestion
pipeline runs before trusting a new drop of data.

One scan computes per-column row/null/distinct counts and min/max for
a declared column set, then unpivots to one row per column. All
aggregates are exact (the deterministic-sketch suite in
operators/sketches.py is the approximate path for when exact distinct
is too expensive at 100 TB — this operator is the ground truth it
calibrates against).

Scale shape: a single Aggregate over the scan — every metric is an
algebraic/partial-combinable function, so the shuffle carries ONE
partial state row per task (the multi-column distinct expands rows
map-side via Expand, still constant-width). The unpivot is a stack()
projection on the 1-row result; nothing touches the driver.

Reference parity: none (the reference profiles nothing; its only
statistics surface is Parquet footer stats, R5/§5 — this is §2.9
extension surface).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.registry import query
from gresearch_parquet_benchmarking_spark.sources.tables import load_table

NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
STR_COLS = ("l_returnflag", "l_linestatus")


def _sql_branch(c: str, numeric: bool) -> str:
    mn = f"CAST(MIN({c}) AS DOUBLE)" if numeric else "NULL"
    mx = f"CAST(MAX({c}) AS DOUBLE)" if numeric else "NULL"
    smn = "NULL" if numeric else f"MIN({c})"
    smx = "NULL" if numeric else f"MAX({c})"
    return f"""
        SELECT '{c}' AS column_name,
               COUNT(*)::BIGINT AS n_rows,
               (COUNT(*) - COUNT({c}))::BIGINT AS n_nulls,
               COUNT(DISTINCT {c})::BIGINT AS n_distinct,
               {mn} AS min_num, {mx} AS max_num,
               {smn} AS min_str, {smx} AS max_str
        FROM lineitem"""


@query(
    "profile_lineitem_columns",
    oracle=" UNION ALL ".join(
        [_sql_branch(c, True) for c in NUM_COLS]
        + [_sql_branch(c, False) for c in STR_COLS]
    )
    + " ORDER BY column_name",
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass profile of lineitem's measure and flag columns."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in (*NUM_COLS, *STR_COLS):
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).cast("long").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("long").alias(f"{c}__distinct"),
        ]
    for c in NUM_COLS:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    for c in STR_COLS:
        aggs += [F.min(c).alias(f"{c}__smin"), F.max(c).alias(f"{c}__smax")]
    wide = li.agg(*aggs)

    # Transpose the 1-row aggregate with explode(array(struct...)) —
    # the aggregate executes exactly ONCE and the per-column rows are a
    # pure projection. (A union of per-column selects re-runs the
    # multi-distinct scan per branch; stack() can't take branches whose
    # struct field names differ in Spark 4.)
    entries = []
    for c in NUM_COLS:
        entries.append(
            F.struct(
                F.lit(c).alias("column_name"), F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_num"),
                F.col(f"{c}__max").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in STR_COLS:
        entries.append(
            F.struct(
                F.lit(c).alias("column_name"), F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"{c}__smin").alias("min_str"),
                F.col(f"{c}__smax").alias("max_str"),
            )
        )
    return (
        wide.select(F.explode(F.array(*entries)).alias("e"))
        .select("e.*")
        .orderBy("column_name")
    )

