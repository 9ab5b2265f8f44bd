"""Parquet writers (S1–S4) and readers (R1–R7) — SURVEY.md §2.2/§2.3.

Writers map the reference's C++ writer properties
(/root/reference/src/metadata_benchmark.cc:137-146,
 /root/reference/src/compression_benchmark.cc:52-64) onto Spark writer
options / Hadoop confs. Readers map the read benchmarks
(/root/reference/src/data_read_benchmark.cc:43-97,
 /root/reference/src/metadata_benchmark.cc:13-79) onto DataFrame scans,
with a driver-side pyarrow shim for the metadata-microscopy timings
(thrift-decode vs schema-build split) that Spark's public API
intentionally hides — same library family as the reference, so the
numbers are comparable (SURVEY §7.3).

Known gaps vs the reference, documented not papered over:
* StatsLevel::NONE — parquet-mr always writes chunk statistics; the
  engine benchmarks CHUNK vs PAGE dimensions only (SURVEY §2.2 S1).
* Row-group size in ROWS — parquet-mr's knob is bytes
  (`parquet.block.size`); `write_parquet` accepts row_group_rows and
  converts via a measured bytes/row estimate, then
  `rowgroup_layout()` reports what actually landed.
* Page-granular reads (R4) — not addressable from Spark; the nearest
  public behavior (single-column scan) is what `read_single_column`
  measures.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CODECS = ("none", "snappy", "gzip", "zstd")  # brotli needs an extra jar; gated below
PAGE_SIZES = (8192, 65536, 1048576, 8388608)  # metadata_benchmark.cc:270
ROW_GROUP_ROWS = (1000, 2000, 5000, 10000)    # metadata_benchmark.cc:269


def brotli_available(spark: SparkSession) -> bool:
    try:
        spark.sparkContext._jvm.Class.forName(  # type: ignore[union-attr]
            "org.apache.hadoop.io.compress.BrotliCodec"
        )
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Writers
# ---------------------------------------------------------------------------

@dataclass
class WriteResult:
    path: str
    write_time_s: float
    file_bytes: int
    options: dict = field(default_factory=dict)


def _dir_bytes(path: str) -> int:
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def estimate_bytes_per_row(df: DataFrame, probe_path: str, probe_rows: int = 2000) -> float:
    """Probe write to convert row-group-rows → parquet.block.size bytes
    (SURVEY §7.3 'row-group size in rows')."""
    probe = df.limit(probe_rows)
    probe.coalesce(1).write.mode("overwrite").parquet(probe_path)
    n = probe.count()
    return _dir_bytes(probe_path) / max(n, 1)


def write_parquet(
    df: DataFrame,
    path: str,
    codec: str = "snappy",
    row_group_rows: int | None = None,
    bytes_per_row: float | None = None,
    page_size: int | None = None,
    dictionary: bool = True,
    single_file: bool = True,
) -> WriteResult:
    """S1–S4: timed parquet write with codec / row-group / page knobs.

    ``single_file`` coalesces to one output file to mirror the
    reference's single-file benchmarks; large-scale callers pass False
    and keep one file per task.
    """
    writer = df.coalesce(1).write if single_file else df.write
    writer = writer.mode("overwrite").option("compression", codec)
    opts: dict = {"compression": codec}
    if row_group_rows is not None:
        if bytes_per_row is None:
            raise ValueError("row_group_rows needs bytes_per_row (use estimate_bytes_per_row)")
        block = max(int(row_group_rows * bytes_per_row), 64 * 1024)
        writer = writer.option("parquet.block.size", str(block))
        opts["parquet.block.size"] = block
        opts["target_row_group_rows"] = row_group_rows
    if page_size is not None:
        writer = writer.option("parquet.page.size", str(page_size))
        # page-size checks work against the row-count limit too
        writer = writer.option("parquet.page.row.count.limit", str(1 << 30))
        opts["parquet.page.size"] = page_size
    writer = writer.option("parquet.enable.dictionary", str(dictionary).lower())
    opts["parquet.enable.dictionary"] = dictionary

    t0 = time.perf_counter()
    writer.parquet(path)
    dt = time.perf_counter() - t0
    return WriteResult(path=path, write_time_s=dt, file_bytes=_dir_bytes(path), options=opts)


def write_parquet_arrow_codec(
    df: DataFrame, path: str, codec: str = "brotli"
) -> WriteResult:
    """S2 DISTRIBUTED write path for codecs parquet-mr has no codec
    class for in this environment (brotli — reference
    compression_benchmark.h:7-13, benched at
    compression_benchmark.cc:52-64): each Spark task streams its
    partition's Arrow batches into a pyarrow ParquetWriter inside
    ``mapInArrow`` — one output file per task, encoding runs on the
    EXECUTORS and scales horizontally exactly like
    ``df.write.parquet``. The Arrow C++ writer is the same family the
    reference uses, so BASELINE §7 comparison stays direct; the only
    non-Spark piece is the per-file encoder, swapped in at the point
    parquet-mr would sit. (On a real cluster the same code targets
    object stores via pyarrow's fs URIs.)"""
    import os
    import shutil

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)

    def _encode(batches):
        import os
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else os.getpid()
        fname = os.path.join(path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.parquet")
        writer = None
        n = 0
        for b in batches:
            if writer is None:
                writer = pq.ParquetWriter(fname, b.schema, compression=codec)
            writer.write_batch(b)
            n += b.num_rows
        if writer is not None:
            writer.close()
            size = os.path.getsize(fname)
        else:  # empty partition: no file
            fname, size = "", 0
        yield pa.RecordBatch.from_pydict(
            {"file": [fname], "n_rows": [n], "n_bytes": [size]}
        )

    t0 = time.perf_counter()
    parts = df.mapInArrow(_encode, "file string, n_rows long, n_bytes long").collect()
    dt = time.perf_counter() - t0
    return WriteResult(
        path=path,
        write_time_s=dt,
        file_bytes=sum(p.n_bytes for p in parts),
        options={"compression": codec, "n_files": sum(1 for p in parts if p.file)},
    )


def read_parquet_arrow_codec(spark: SparkSession, path: str) -> DataFrame:
    """Distributed READ path for codecs parquet-mr cannot decode
    (brotli): parquet files are listed driver-side (metadata only),
    parallelized one-file-per-row, and each task streams its file
    through pyarrow back into Arrow batches via ``mapInArrow`` — the
    decode runs on the executors, one task per file, the same scaling
    shape as Spark's native parquet source. Schema comes from the first
    footer (driver-side, no data read)."""
    import os

    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import from_arrow_schema

    files = []
    if os.path.isfile(path):
        files = [path]
    else:
        for root, _dirs, fs in os.walk(path):
            files += [os.path.join(root, f) for f in sorted(fs) if f.endswith(".parquet")]
    if not files:
        raise FileNotFoundError(f"no parquet files under {path}")
    arrow_schema = pq.read_schema(files[0])
    spark_schema = from_arrow_schema(arrow_schema)

    def _decode(batches):
        import pyarrow.parquet as pq

        for b in batches:
            for fname in b.column("file").to_pylist():
                pf = pq.ParquetFile(fname)
                yield from pf.iter_batches()

    file_df = spark.createDataFrame([(f,) for f in files], "file string").repartition(
        len(files)
    )
    return file_df.mapInArrow(_decode, spark_schema)


def read_arrow_codec_timed(spark: SparkSession, path: str) -> float:
    """§7 decode timing through the distributed Arrow-codec source
    (noop sink, same contract as read_full_timed)."""
    t0 = time.perf_counter()
    read_parquet_arrow_codec(spark, path).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def arrow_write_timed(table, path: str, codec: str, row_group_rows: int | None = None) -> float:
    """S2 encode through pyarrow for codecs parquet-mr lacks a jar for
    in this environment (brotli — reference compression_benchmark.h:7-13,
    benched at compression_benchmark.cc:52-64). Same Arrow C++ writer
    family as the reference, so BASELINE §7 comparison is direct."""
    import pyarrow.parquet as pq

    t0 = time.perf_counter()
    pq.write_table(
        table,
        path,
        compression="NONE" if codec == "none" else codec.upper(),
        row_group_size=row_group_rows or table.num_rows,
    )
    return time.perf_counter() - t0


# ---------------------------------------------------------------------------
# Readers  (R1–R7)
# ---------------------------------------------------------------------------

@dataclass
class MetadataTiming:
    """R1/R5 splits via pyarrow (driver-side shim)."""
    total_s: float
    thrift_decode_s: float
    schema_build_s: float
    stats_decode_s: float
    n_row_groups: int
    n_columns: int
    footer_bytes: int | None


def _first_parquet_file(path: str) -> str:
    import os

    if os.path.isfile(path):
        return path
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if f.endswith(".parquet"):
                return os.path.join(root, f)
    raise FileNotFoundError(f"no parquet file under {path}")


def read_metadata_timed(path: str) -> MetadataTiming:
    """R1 (metadata_benchmark.cc:13-42) + R5 (:44-79): footer thrift
    decode, Arrow schema build, and statistics decode, timed
    separately with pyarrow."""
    import pyarrow.parquet as pq

    f = _first_parquet_file(path)
    t0 = time.perf_counter()
    md = pq.read_metadata(f)
    t1 = time.perf_counter()
    schema = md.schema.to_arrow_schema()
    t2 = time.perf_counter()
    stats_seen = 0
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for c in range(row_group.num_columns):
            st = row_group.column(c).statistics
            if st is not None and st.has_min_max:
                stats_seen += 1
    t3 = time.perf_counter()
    import os

    return MetadataTiming(
        total_s=t2 - t0,
        thrift_decode_s=t1 - t0,
        schema_build_s=t2 - t1,
        stats_decode_s=t3 - t2,
        n_row_groups=md.num_row_groups,
        n_columns=len(schema),
        footer_bytes=os.path.getsize(f) if os.path.exists(f) else None,
    )


def read_stats_timed(path: str) -> float:
    """R5 timing aligned with the reference's BenchmarkStats
    (metadata_benchmark.cc:44-79): the reference re-opens the file per
    iteration, so the footer thrift decode happens INSIDE its stats
    window. Re-open here too — `read_metadata_timed.stats_decode_s`
    (stats access only, on already-decoded metadata) would flatter the
    engine vs BASELINE §5."""
    import pyarrow.parquet as pq

    f = _first_parquet_file(path)
    t0 = time.perf_counter()
    md = pq.read_metadata(f)
    stats_seen = 0
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for c in range(row_group.num_columns):
            st = row_group.column(c).statistics
            if st is not None and st.has_min_max:
                stats_seen += 1
    return time.perf_counter() - t0


def spark_schema_timed(spark: SparkSession, path: str) -> tuple[float, int]:
    """R1 Spark-level: footer→schema on the driver."""
    t0 = time.perf_counter()
    schema = spark.read.parquet(path).schema
    return time.perf_counter() - t0, len(schema.fields)


def read_full_timed(spark: SparkSession, path: str) -> float:
    """R2 (data_read_benchmark.cc:56-64): full scan touching every
    value — noop sink, NOT count() (count is answered from row-group
    metadata without reading data)."""
    t0 = time.perf_counter()
    spark.read.parquet(path).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def read_columns_timed(spark: SparkSession, path: str, columns: list[str]) -> float:
    """R3 (data_read_benchmark.cc:66-79): projection scan.

    The projection is pushed into the reader schema — the Spark
    equivalent of handing the Arrow reader a column list, and the same
    physical scan a ``.select(*columns)`` produces (ReadSchema pruned to
    the columns; pinned by tests/test_plans.py). ``.select()`` on a
    500-name list additionally pays ~0.5 s of driver-side Catalyst
    analysis per run (O(width²) attribute resolution) that is plan
    compilation, not scan work — on a cluster it amortizes over the
    whole job, but in a timed single-scan benchmark it doubles the
    number, so the bench path resolves the schema directly. The footer
    open + schema subset build stay inside the timed window, matching
    the reference's per-iteration file open."""
    t0 = time.perf_counter()
    want = set(columns)
    full = spark.read.parquet(path).schema
    sub = StructType([f for f in full.fields if f.name in want])
    spark.read.schema(sub).parquet(path).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def random_half_columns(spark: SparkSession, path: str, seed: int = 42) -> list[str]:
    import random

    cols = spark.read.parquet(path).columns
    rng = random.Random(seed)
    return rng.sample(cols, max(len(cols) // 2, 1))


def read_single_column_timed(spark: SparkSession, path: str, column: str) -> float:
    """R4 substitute (data_read_benchmark.cc:81-97 iterates column
    reads labeled 'page read'; page granularity is format-internal —
    SURVEY §7.3)."""
    return read_columns_timed(spark, path, [column])


def read_with_schema_subset_timed(
    spark: SparkSession, path: str, columns: list[str]
) -> float:
    """R6 (scripts/schema_full_partial_benchmark.py:25-57): scan with a
    user-supplied partial schema — skips inference and prunes."""
    full = spark.read.parquet(path).schema
    from pyspark.sql import types as T

    sub = T.StructType([f for f in full.fields if f.name in set(columns)])
    t0 = time.perf_counter()
    spark.read.schema(sub).parquet(path).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def _completed_stages(spark: SparkSession) -> dict[int, float]:
    """{stageId: executorRunTime_s} for completed stages, via the Spark
    UI REST API (public monitoring API). Empty when the UI is disabled."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {}
    try:
        with urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=5) as r:
            apps = _json.load(r)
        app_id = apps[0]["id"]
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete", timeout=5
        ) as r:
            stages = _json.load(r)
    except Exception:
        return {}
    return {s["stageId"]: s["executorRunTime"] / 1e3 for s in stages}


def timed_with_task_time(spark: SparkSession, thunk) -> tuple[float, float | None]:
    """Run ``thunk``; return (wall_s, executor_task_s) where the second
    number sums executor task run time of the stages the thunk launched
    — i.e. the actual work, with Spark's fixed per-job driver cost
    (job submit, DAG build, task scheduling: ~130 ms on this host)
    excluded. This is the honest small-file read number: on tiny inputs
    wall time IS the scheduler floor, and at real scale that floor
    amortizes to zero (VERDICT r3 'R4 weak'). None when the UI REST API
    is unavailable (spark.ui.enabled=false)."""
    before = _completed_stages(spark)
    t0 = time.perf_counter()
    thunk()
    wall = time.perf_counter() - t0
    after = _completed_stages(spark)
    if not after:
        return wall, None
    new = {k: v for k, v in after.items() if k not in before}
    if not new:
        return wall, None
    return wall, sum(new.values())


def head_rows(spark: SparkSession, path: str, n: int = 20):
    """R7 table viewer (table_viewer.cc:6-48): first min(20, rows)."""
    return spark.read.parquet(path).limit(n).collect()


def rowgroup_layout(path: str) -> list[dict]:
    """Footer inspection: verify writer knobs actually landed
    (FIXTURES.md validation contract)."""
    import pyarrow.parquet as pq

    f = _first_parquet_file(path)
    md = pq.read_metadata(f)
    out = []
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        out.append(
            {
                "row_group": rg,
                "num_rows": g.num_rows,
                "total_byte_size": g.total_byte_size,
                "codec": g.column(0).compression if g.num_columns else None,
            }
        )
    return out


def checksum_all_columns(spark: SparkSession, path: str) -> float:
    """Content checksum forcing a genuine full read (R2 verification)."""
    df = spark.read.parquet(path)
    row = df.agg(
        *[F.sum(F.col(c).cast("double")).alias(c) for c in df.columns]
    ).collect()[0]
    return float(sum(v for v in row if v is not None))


def subset_schema_timed(path: str, subset_fraction: int = 10) -> dict:
    """R6/BASELINE §3 analog of the reference's
    scripts/schema_full_partial_benchmark.py:25-57: time the footer
    thrift decode and the Arrow-schema build for ALL columns vs a
    subset of max(10, N//fraction) columns (the reference's subset
    rule, :73-76). Same library family (pyarrow) as the reference's
    own §3 measurement."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    f = _first_parquet_file(path)
    t0 = time.perf_counter()
    md = pq.read_metadata(f)
    t1 = time.perf_counter()
    full = md.schema.to_arrow_schema()
    t2 = time.perf_counter()
    n = len(full)
    k = max(10, n // subset_fraction)
    t3 = time.perf_counter()
    sub = pa.schema([full.field(i) for i in range(k)])
    t4 = time.perf_counter()
    return {
        "n_columns": n,
        "subset_columns": len(sub),
        "thrift_s": t1 - t0,
        "full_build_s": t2 - t1,
        "subset_build_s": t4 - t3,
        "full_total_s": t2 - t0,
        "subset_total_s": (t1 - t0) + (t4 - t3),
    }


def row_groups_matching(path: str, column: str, lo, hi) -> tuple[int, int]:
    """(matching, total) row groups whose [min,max] stats overlap
    [lo,hi] — what parquet-mr's predicate pushdown would actually
    read. The measurable effect of clustering/sorting a layout
    (the reference's statistics story, metadata_benchmark.cc:44-79,
    turned into a skipping ratio)."""
    import pyarrow.parquet as pq
    import os

    files = []
    if os.path.isfile(path):
        files = [path]
    else:
        for root, _d, fs in os.walk(path):
            files += [os.path.join(root, f) for f in fs if f.endswith(".parquet")]
    matching = total = 0
    for f in files:
        md = pq.read_metadata(f)
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        ci = names[column]
        for rg in range(md.num_row_groups):
            total += 1
            st = md.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                matching += 1  # no stats → cannot skip
            elif not (st.max < lo or st.min > hi):
                matching += 1
    return matching, total


# ---------------------------------------------------------------------------
# Parquet bloom filters (write + footer probe + point-lookup timing).
#
# The row-group-skipping path for point lookups on HIGH-CARDINALITY
# UNSORTED keys, where min/max statistics are useless (every row group
# spans nearly the whole key range — the reference's statistics story,
# metadata_benchmark.cc:44-79, covers only the sorted/clustered case).
# At 100 TB a needle-in-haystack lookup on such a key either decodes
# every row group or asks a split-block bloom filter (parquet-mr
# format ≥ 2.9) "is this value possibly here?" and skips the group on
# "no" — turning a full-column decode into a footer+bitset read.
# ---------------------------------------------------------------------------


def write_parquet_bloom(
    df: DataFrame,
    path: str,
    bloom_ndv: dict[str, int],
    row_group_rows: int | None = None,
    bytes_per_row: float | None = None,
    single_file: bool = True,
) -> WriteResult:
    """Parquet write with split-block bloom filters on the given
    columns (``bloom_ndv``: column → expected NDV, which sizes the
    bitset for the target 1% FPP). Dictionary encoding is disabled so
    dictionary-page filtering cannot shadow the bloom effect in A/Bs
    (high-cardinality keys overflow the dictionary anyway)."""
    writer = df.coalesce(1).write if single_file else df.write
    writer = writer.mode("overwrite").option(
        "parquet.enable.dictionary", "false"
    )
    opts: dict = {"parquet.enable.dictionary": False}
    if row_group_rows is not None:
        if bytes_per_row is None:
            raise ValueError("row_group_rows needs bytes_per_row")
        block = max(int(row_group_rows * bytes_per_row), 64 * 1024)
        writer = writer.option("parquet.block.size", str(block))
        opts["parquet.block.size"] = block
    for col, ndv in bloom_ndv.items():
        writer = writer.option(f"parquet.bloom.filter.enabled#{col}", "true")
        writer = writer.option(
            f"parquet.bloom.filter.expected.ndv#{col}", str(int(ndv))
        )
        opts[f"parquet.bloom.filter.enabled#{col}"] = True

    t0 = time.perf_counter()
    writer.parquet(path)
    dt = time.perf_counter() - t0
    return WriteResult(
        path=path, write_time_s=dt, file_bytes=_dir_bytes(path), options=opts
    )


def bloom_filter_offsets(spark: SparkSession, path: str) -> dict[str, int]:
    """Per-column bloom-filter offset of the first row group of the
    first file (-1 = no bloom filter), read through parquet-mr's own
    footer model in the session JVM — neither pyarrow 16 nor DuckDB
    1.0 expose bloom metadata, the writer's library is the ground
    truth for what it wrote."""
    f = _first_parquet_file(path)
    jvm = spark.sparkContext._jvm  # type: ignore[union-attr]
    conf = spark.sparkContext._jsc.hadoopConfiguration()  # type: ignore[union-attr]
    inp = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        jvm.org.apache.hadoop.fs.Path(f), conf
    )
    reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inp)
    try:
        block = reader.getFooter().getBlocks().get(0)
        out: dict[str, int] = {}
        for i in range(block.getColumns().size()):
            c = block.getColumns().get(i)
            out[c.getPath().toDotString()] = c.getBloomFilterOffset()
        return out
    finally:
        reader.close()


def point_lookup_timed(
    spark: SparkSession, path: str, column: str, value, use_bloom: bool = True
) -> tuple[float, int]:
    """(elapsed_s, scan numOutputRows) for ``column == value``.

    The scan metric is the deterministic pruning evidence: a bloom hit
    on an ABSENT in-range key skips every row group (scan outputs 0
    rows); without bloom, min/max stats cannot prune an unsorted
    high-cardinality key and the whole column decodes."""
    df = (
        spark.read.option("parquet.filter.bloom.enabled", str(use_bloom).lower())
        .parquet(path)
        .filter(F.col(column) == value)
    )
    t0 = time.perf_counter()
    df.collect()
    dt = time.perf_counter() - t0
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    rows = 0
    for i in range(leaves.size()):
        it = leaves.apply(i).metrics().iterator()
        while it.hasNext():
            kv = it.next()
            if kv._1() == "numOutputRows":
                rows = int(kv._2().value())
    return dt, rows
