"""Events-table loader. The driver's events.parquet stores ``ts`` as
Parquet TIMESTAMP(NANOS), which Spark's vectorized reader rejects
(PARQUET_TYPE_ILLEGAL). The engine reads it via the public
``spark.sql.legacy.parquet.nanosAsLong`` conf → BIGINT nanoseconds,
then derives exact µs/timestamp columns with integer arithmetic
(``div`` — double division would corrupt ~12% of values at 1e18
magnitudes, so it is never used on raw nanos).

DuckDB (the oracle) reads the same column as a µs-truncated TIMESTAMP,
so both engines agree on epoch-µs derived values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.sources.tables import table_path


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with: ts (bigint ns), ts_us (bigint µs), ts_ts (timestamp µs)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(table_path(sf_dir, "events"))
    return ev.withColumn("ts_us", F.expr("ts div 1000")).withColumn(
        "ts_ts", F.timestamp_micros(F.col("ts_us"))
    )
