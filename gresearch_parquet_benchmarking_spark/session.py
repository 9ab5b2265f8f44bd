"""SparkSession factory with the engine's knob map.

The reference tunes Parquet via C++ writer properties
(/root/reference/src/metadata_benchmark.cc:137-146,
 /root/reference/src/compression_benchmark.cc:52-64); Spark reaches the
same knobs through reader/writer options and SQL confs, set here once.

Scale posture: these defaults are written for a real cluster (AQE on,
skew-join handling on, pushdown on, vectorized reader on) and merely
*sized* for local[N] tests via ``shuffle_partitions``. On a
1000-executor cluster the same factory applies — only
``spark.sql.shuffle.partitions`` (or AQE's advisory partition size)
changes, which callers override per-deployment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that matter at 100 TB, defaulted explicitly so behavior does not
# silently change across Spark versions.
_ENGINE_CONFS: dict[str, str] = {
    # --- optimizer / runtime ---
    # initial shuffle parallelism; AQE coalesces down / splits skew from
    # here, so this is a ceiling for small data, not a hard setting.
    # Cluster deployments override via get_spark(shuffle_partitions=…).
    "spark.sql.shuffle.partitions": "64",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # --- parquet scan path (reference §4 table: pruning/pushdown/skipping) ---
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    "spark.sql.parquet.mergeSchema": "false",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # --- python/arrow boundary (pandas UDFs are Arrow-batched) ---
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # --- determinism for the DuckDB oracle ---
    "spark.sql.session.timeZone": "UTC",
    # ANSI pinned ON (the Spark 4.x default, made explicit so a runtime
    # with a different default can't silently flip cast/index semantics).
    # All maybe-out-of-bounds access uses F.get / element_at guards
    # (CLAUDE.md rule 7), which are correct under ANSI.
    "spark.sql.ansi.enabled": "true",
}


def get_spark(
    app_name: str = "gresearch-parquet-benchmarking-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, fallback 32)
    so tests and bench runs share sizing. ``shuffle_partitions`` defaults
    to the local core count — on a cluster, pass the real value or rely
    on AQE coalescing.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = SparkSession.builder.appName(app_name).master(master)
    # Engine defaults first; caller-specific settings after so they win
    # (shuffle_partitions is also in _ENGINE_CONFS as a generic default).
    for k, v in _ENGINE_CONFS.items():
        builder = builder.config(k, v)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    for k, v in (extra_confs or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def apply_engine_confs(spark: SparkSession) -> SparkSession:
    """Apply the engine's runtime-settable confs to an externally created
    session (the driver harness builds its own SparkSession and calls
    ``entry(spark)`` — we must not assume our factory ran)."""
    for k, v in _ENGINE_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # static confs (none in the map today) can't be set post-start
            pass
    return spark
