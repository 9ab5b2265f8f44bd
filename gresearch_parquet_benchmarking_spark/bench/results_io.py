"""Benchmark results sinks/sources — S5 + A3 (SURVEY.md §2.2/§2.4).

The reference writes each sweep's measurements as CSV
(/root/reference/src/metadata_benchmark.cc:81-104) and the report
layer glob-unions per-run files
(/root/reference/scripts/visualize_compression_benchmark.py:7-9).
Results are tiny → written driver-side through Spark's CSV sink with
coalesce(1) (a deliberate exception to the no-coalesce rule; at this
size the single file IS the right layout)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_results_csv(spark: SparkSession, rows: list[dict], path: str) -> None:
    """S5: one header + one row per measurement, single CSV file."""
    if not rows:
        raise ValueError("no result rows to write")
    df = spark.createDataFrame(rows)
    # stable column order for diffable outputs
    df = df.select(*sorted(df.columns))
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)


def read_results_glob(spark: SparkSession, glob: str) -> DataFrame:
    """A3: multi-file CSV scan ≙ the reference's pd.concat-over-glob.
    Spark's multi-file source unions partitions without a shuffle."""
    return spark.read.option("header", "true").option("inferSchema", "true").csv(glob)
