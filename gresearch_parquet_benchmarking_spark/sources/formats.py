"""Non-parquet sources/sinks. The reference's only formats are parquet
(data), CSV (results — S5), and google-benchmark JSON (§3.3 output);
the engine covers those plus ORC/JSON round-trips as native Spark
formats, and stubs lakehouse table formats whose jars are not in this
container (import-try per SURVEY §7.2 guidance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_read_roundtrip(
    df: DataFrame, path: str, fmt: str, schema: T.StructType | None = None
) -> DataFrame:
    """Write ``df`` as ``fmt`` and read it back (schema-explicit for
    text formats — never inferSchema in production paths)."""
    spark = df.sparkSession
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", "true").csv(path)
        reader = spark.read.option("header", "true")
        return reader.schema(schema or df.schema).csv(path)
    if fmt == "json":
        writer.json(path)
        return spark.read.schema(schema or df.schema).json(path)
    if fmt == "orc":
        writer.orc(path)
        return spark.read.orc(path)
    if fmt == "parquet":
        writer.parquet(path)
        return spark.read.parquet(path)
    raise ValueError(f"unsupported format {fmt!r}")


class LakehouseUnavailable(RuntimeError):
    pass


def delta_table(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake reader — requires delta-spark jars (not in this
    image). Gated, not silently broken."""
    try:
        return spark.read.format("delta").load(path)
    except Exception as ex:
        raise LakehouseUnavailable(
            "Delta Lake support requires the delta-spark package on the "
            "classpath (io.delta:delta-spark). Not available in this "
            "environment; parquet is the supported table format."
        ) from ex


def iceberg_table(spark: SparkSession, table: str) -> DataFrame:
    """Apache Iceberg reader — requires iceberg-spark-runtime jars."""
    try:
        return spark.read.format("iceberg").load(table)
    except Exception as ex:
        raise LakehouseUnavailable(
            "Iceberg support requires iceberg-spark-runtime on the "
            "classpath. Not available in this environment; parquet is "
            "the supported table format."
        ) from ex


def read_merged_schema(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: union the schemas of every parquet file
    under ``path`` (Spark's ``mergeSchema``), so batches written before
    a column was added coexist with batches written after — the
    standard append-only ingestion contract. Columns absent from a
    file surface as NULL for its rows.

    Scale note: mergeSchema makes PLANNING read every file's footer
    (that cost is exactly what the reference's §1 footer benchmarks
    measure, and why the session default is mergeSchema=false); the
    production pattern is to enable it per-read on evolving datasets
    or pin the merged schema in a catalog. Data-page reads are
    unaffected — missing columns are synthesized as NULL map-side."""
    return spark.read.option("mergeSchema", "true").parquet(path)
