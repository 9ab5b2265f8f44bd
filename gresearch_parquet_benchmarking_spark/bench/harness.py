"""Benchmark harness (H1–H5, SURVEY.md §2.5) reproducing the
reference's sweeps (§3.2) with the engine's writers/readers.

Each sweep emits rows with the SAME columns as the reference's CSVs
(FIXTURES.md §F3) so the report operators consume them identically:

* metadata_sweep   → benchmark_chunks_and_pages.csv / benchmark_stats.csv shape
* data_read_sweep  → *_benchmark_results.csv shape (data_read_benchmark.cc:124-135)
* compression_sweep→ *_compression_benchmark.csv shape (compression_benchmark.cc:90-101)
* rowgroup_sweep   → benchmark_rowgroup.csv shape (metadata_benchmark.cc:213-230)

Protocol: ≥1 warmup + median of ``trials`` (BASELINE.md comparison
protocol; the reference times single runs, which is noisy — medians
compare shapes more fairly given JVM jitter, SURVEY §7.3).
"""

from __future__ import annotations

import os
import shutil
import statistics
import tempfile
import time
from collections.abc import Callable

from pyspark.sql import SparkSession

from gresearch_parquet_benchmarking_spark.sources.datagen import wide_table
from gresearch_parquet_benchmarking_spark.sources import io as eio


def timed_median(fn: Callable[[], float], trials: int = 3, warmups: int = 1) -> float:
    """H1/H3: warmups + median-of-trials for a fn returning seconds."""
    for _ in range(warmups):
        fn()
    return statistics.median(fn() for _ in range(trials))


class BenchWorkspace:
    """H4: temp-file lifecycle + H5: skip-if-exists generation cache."""

    def __init__(self, root: str | None = None):
        self.root = root or tempfile.mkdtemp(prefix="engine_bench_")
        self._generated: dict[tuple, str] = {}

    def table_path(self, n_cols: int, n_rows: int, tag: str = "") -> str:
        return os.path.join(self.root, f"wide_{n_cols}x{n_rows}{tag}")

    def ensure_wide(
        self, spark: SparkSession, n_cols: int, n_rows: int, codec: str = "snappy"
    ) -> str:
        key = (n_cols, n_rows, codec)
        if key not in self._generated:
            path = self.table_path(n_cols, n_rows, f"_{codec}")
            if not os.path.exists(path):
                df = wide_table(spark, n_cols, n_rows)
                eio.write_parquet(df, path, codec=codec)
            self._generated[key] = path
        return self._generated[key]

    def cleanup(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)


def metadata_sweep(
    spark: SparkSession,
    ws: BenchWorkspace,
    col_counts=(10, 100, 1000),
    n_rows: int = 10000,
    trials: int = 3,
) -> list[dict]:
    """Reference §3.2 first grid (metadata_benchmark.cc:232-266):
    footer decode + schema build + stats decode vs table width."""
    rows = []
    for n_cols in col_counts:
        path = ws.ensure_wide(spark, n_cols, n_rows)
        for _ in range(1):
            eio.read_metadata_timed(path)  # warmup
        timings = [eio.read_metadata_timed(path) for _ in range(trials)]
        med = sorted(timings, key=lambda t: t.total_s)[trials // 2]
        spark_s, n_fields = eio.spark_schema_timed(spark, path)
        rows.append(
            {
                "num_columns": n_cols,
                "num_rows": n_rows,
                "total_decode_time_us": med.total_s * 1e6,
                "thrift_decode_time_us": med.thrift_decode_s * 1e6,
                "schema_build_time_us": med.schema_build_s * 1e6,
                "stats_decode_time_us": med.stats_decode_s * 1e6,
                "spark_schema_time_us": spark_s * 1e6,
                "size_bytes": eio._dir_bytes(path),
                "num_row_groups": med.n_row_groups,
            }
        )
    return rows


def data_read_sweep(
    spark: SparkSession,
    ws: BenchWorkspace,
    col_counts=(10, 100, 1000),
    n_rows: int = 100000,
    trials: int = 3,
) -> list[dict]:
    """data_read_benchmark.cc:137-153: metadata / full / random-half /
    single-column reads vs width."""
    rows = []
    for n_cols in col_counts:
        path = ws.ensure_wide(spark, n_cols, n_rows)
        half = eio.random_half_columns(spark, path)
        one = spark.read.parquet(path).columns[0]
        rows.append(
            {
                "num_columns": n_cols,
                "num_rows": n_rows,
                "metadata_decode_time_ms": timed_median(
                    lambda: eio.read_metadata_timed(path).total_s, trials
                )
                * 1e3,
                "full_data_read_time_ms": timed_median(
                    lambda: eio.read_full_timed(spark, path), trials
                )
                * 1e3,
                "random_column_read_time_ms": timed_median(
                    lambda: eio.read_columns_timed(spark, path, half), trials
                )
                * 1e3,
                "page_read_time_ms": timed_median(
                    lambda: eio.read_single_column_timed(spark, path, one), trials
                )
                * 1e3,
            }
        )
    return rows


def compression_sweep(
    spark: SparkSession,
    ws: BenchWorkspace,
    col_counts=(10, 100),
    n_rows: int = 10000,
    codecs=None,
    trials: int = 3,
) -> list[dict]:
    """compression_benchmark.cc:103-118: encode/decode time + size per
    codec. Random floats ⇒ ratios ≈ 1 (BASELINE §7)."""
    codecs = codecs or list(eio.CODECS) + (
        ["brotli"] if eio.brotli_available(spark) else []
    )
    rows = []
    for n_cols in col_counts:
        df = wide_table(spark, n_cols, n_rows)
        df = df.persist()
        df.count()
        for codec in codecs:
            path = ws.table_path(n_cols, n_rows, f"_codec_{codec}")

            def encode() -> float:
                return eio.write_parquet(df, path, codec=codec).write_time_s

            enc = timed_median(encode, trials)
            dec = timed_median(lambda: eio.read_full_timed(spark, path), trials)
            rows.append(
                {
                    "algorithm": codec,
                    "num_columns": n_cols,
                    "num_rows": n_rows,
                    "encoding_time_ms": enc * 1e3,
                    "decoding_time_ms": dec * 1e3,
                    "compressed_size_mb": eio._dir_bytes(path) / 1e6,
                }
            )
        df.unpersist()
    return rows


def rowgroup_sweep(
    spark: SparkSession,
    ws: BenchWorkspace,
    col_counts=(10, 100),
    row_group_rows=eio.ROW_GROUP_ROWS,
    page_sizes=eio.PAGE_SIZES,
    n_rows: int = 10000,
    trials: int = 3,
) -> list[dict]:
    """metadata_benchmark.cc:269-281: write time + decode time across
    row-group-size × page-size grid (H2 parameter sweep)."""
    rows = []
    for n_cols in col_counts:
        df = wide_table(spark, n_cols, n_rows).persist()
        df.count()
        probe = ws.table_path(n_cols, n_rows, "_probe")
        bpr = eio.estimate_bytes_per_row(df, probe)
        for rg_rows in row_group_rows:
            for page in page_sizes:
                path = ws.table_path(n_cols, n_rows, f"_rg{rg_rows}_p{page}")
                res = eio.write_parquet(
                    df, path, codec="snappy",
                    row_group_rows=rg_rows, bytes_per_row=bpr, page_size=page,
                )
                md = timed_median(lambda: eio.read_metadata_timed(path).total_s, trials)
                layout = eio.rowgroup_layout(path)
                rows.append(
                    {
                        "num_columns": n_cols,
                        "num_rows": n_rows,
                        "row_group_size": rg_rows,
                        "page_size": page,
                        "write_time_ms": res.write_time_s * 1e3,
                        "total_decode_time_ms": md * 1e3,
                        "file_size_mb": res.file_bytes / 1e6,
                        "actual_row_groups": len(layout),
                        "actual_rg_rows_max": max(g["num_rows"] for g in layout),
                    }
                )
        df.unpersist()
    return rows
