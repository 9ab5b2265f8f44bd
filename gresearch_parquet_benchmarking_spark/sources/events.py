"""Events-table loader, adaptive to the physical ``ts`` type.

The driver's events.parquet has shipped with two layouts across
testdata generations: Parquet TIMESTAMP(NANOS) (which Spark's
vectorized reader rejects — PARQUET_TYPE_ILLEGAL — so it is read via
the public ``spark.sql.legacy.parquet.nanosAsLong`` conf → BIGINT
nanoseconds) and plain TIMESTAMP(MICROS) (read natively as
timestamp/timestamp_ntz). This loader probes the read schema and
normalizes both to one contract:

  ts    BIGINT epoch-ns   (integer-exact; ``div``/``*`` only — double
                           division corrupts ~12% of values at 1e18)
  ts_us BIGINT epoch-µs
  ts_ts TIMESTAMP (µs)

DuckDB (the oracle) reads either layout as a TIMESTAMP, so
``epoch_us(ts)`` on the oracle side agrees with ``ts_us`` here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.sources.tables import table_path


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with: ts (bigint ns), ts_us (bigint µs), ts_ts (timestamp µs)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(table_path(sf_dir, "events"))
    ts_type = dict(ev.dtypes)["ts"]
    if ts_type == "bigint":
        # TIMESTAMP(NANOS) layout surfaced as epoch-ns longs
        ev = ev.withColumn("ts_us", F.expr("ts div 1000"))
    else:
        # timestamp / timestamp_ntz (µs) layout; session tz is pinned
        # UTC (session.py) so the ntz→timestamp cast is identity
        ev = ev.withColumn(
            "ts_us", F.unix_micros(F.col("ts").cast("timestamp"))
        ).withColumn("ts", F.col("ts_us") * F.lit(1000).cast("long"))
    return ev.withColumn("ts_ts", F.timestamp_micros(F.col("ts_us")))
