"""Benchmark fixture files, generated driver-side with pyarrow.

The reference generates its benchmark inputs with Arrow C++
(/root/reference/src/data_generator.cc, test_data_generator.cc); this
module is the same generation path through pyarrow (same library
family), giving exact control of row-group size / page size /
statistics so fixture layout matches the reference's files
(e.g. one row group for the 10k-column footer benchmark —
/root/reference/src/data_generator.cc:35 chunk_size=10000).

These fixtures feed the READ-path benchmarks (what Spark does with a
given file). WRITE-path benchmarks use the engine's Spark writers
(sources/io.py) — writing is the behavior under test there.

Fixtures are content-addressed under a persistent cache dir so
repeated bench rounds skip regeneration (H5 skip-if-exists,
/root/reference/src/pq_fb_ns_data_generator.cc:238-241).
"""

from __future__ import annotations

import os

DEFAULT_CACHE = os.environ.get("ENGINE_BENCH_CACHE", "/tmp/engine_bench_cache")


def fixture_path(
    n_cols: int,
    n_rows: int,
    codec: str = "snappy",
    row_group_rows: int | None = None,
    page_size: int | None = None,
    stats: bool = True,
    cache_dir: str = DEFAULT_CACHE,
) -> str:
    rg = row_group_rows or n_rows
    tag = f"wide_{n_cols}c_{n_rows}r_{codec}_rg{rg}_p{page_size or 'def'}_s{int(stats)}"
    return os.path.join(cache_dir, tag + ".parquet")


def ensure_wide_fixture(
    n_cols: int,
    n_rows: int,
    codec: str = "snappy",
    row_group_rows: int | None = None,
    page_size: int | None = None,
    stats: bool = True,
    seed: int = 42,
    cache_dir: str = DEFAULT_CACHE,
) -> str:
    """Generate (once) a wide float32 uniform(-1000,1000) fixture —
    the reference's F1 shape (FIXTURES.md) — returning its path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = fixture_path(n_cols, n_rows, codec, row_group_rows, page_size, stats, cache_dir)
    if os.path.exists(path):
        return path
    os.makedirs(cache_dir, exist_ok=True)

    rng = np.random.RandomState(seed)
    names = [f"col_{i}" for i in range(n_cols)]
    # column-by-column like the reference's FloatBuilder loop, bounded memory
    arrays = [
        pa.array(rng.uniform(-1000, 1000, size=n_rows).astype(np.float32))
        for _ in range(n_cols)
    ]
    table = pa.table(dict(zip(names, arrays)))
    kwargs: dict = {
        "compression": "NONE" if codec == "none" else codec.upper(),
        "row_group_size": row_group_rows or n_rows,
        "write_statistics": stats,
    }
    if page_size is not None:
        kwargs["data_page_size"] = page_size
    tmp = path + ".tmp"
    pq.write_table(table, tmp, **kwargs)
    os.replace(tmp, path)
    return path


def ensure_evolving_fixture(n_files: int = 200, rows_per_file: int = 100) -> str:
    """A directory of ``n_files`` small parquet files with an EVOLVED
    schema: the first half carry (id, v), the second half add a
    ``score`` column — the append-only ingestion shape that forces
    ``mergeSchema`` to read every footer at planning time. Used to
    measure what schema evolution costs at plan time vs a pinned
    schema (sources/formats.py read_merged_schema rationale); the
    file COUNT, not the row count, is the variable under test."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(DEFAULT_CACHE, f"evolving_{n_files}f_{rows_per_file}r")
    marker = os.path.join(d, "_COMPLETE")
    if os.path.exists(marker):
        return d
    os.makedirs(d, exist_ok=True)
    for i in range(n_files):
        ids = pa.array(range(i * rows_per_file, (i + 1) * rows_per_file), pa.int64())
        cols = {"id": ids, "v": pa.array([f"v{j}" for j in range(rows_per_file)])}
        if i >= n_files // 2:
            cols["score"] = pa.array(
                [float(j % 7) for j in range(rows_per_file)], pa.float64()
            )
        pq.write_table(pa.table(cols), os.path.join(d, f"part-{i:05d}.parquet"))
    with open(marker, "w") as f:
        f.write("ok")
    return d


BLOOM_FIXTURE_ROWS = 2_000_000


def ensure_bloom_fixture(spark, n_rows: int = BLOOM_FIXTURE_ROWS) -> str:
    """A (k BIGINT, v BIGINT) file with a split-block bloom filter on
    the md5-derived key ``k`` and ~24 row groups. High-cardinality
    UNSORTED keys make min/max stats unusable for point lookups — the
    layout where blooms are the only row-group-skipping signal
    (sources/io.py bloom rationale). Spark-written: pyarrow 16 cannot
    write bloom filters, parquet-mr can."""
    from pyspark.sql import functions as F

    from gresearch_parquet_benchmarking_spark.sources import io as eio

    d = os.path.join(DEFAULT_CACHE, f"bloom_keyed_{n_rows}r")
    marker = os.path.join(d, "_COMPLETE")
    path = os.path.join(d, "keyed.parquet")
    if os.path.exists(marker):
        return path
    os.makedirs(d, exist_ok=True)
    df = spark.range(n_rows).select(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 14), 16, 10)
        .cast("bigint")
        .alias("k"),
        F.col("id").alias("v"),
    )
    eio.write_parquet_bloom(
        df, path, bloom_ndv={"k": n_rows}, row_group_rows=84_000, bytes_per_row=16.0
    )
    with open(marker, "w") as f:
        f.write("ok")
    return path
