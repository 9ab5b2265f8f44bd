"""Wide-table data generators — Spark-first re-expression of the
reference's G1–G5 (SURVEY.md §2.1):

* G1/G2  WriteParquetFile: N float32 cols `col_i`, uniform(-1000,1000)
         (/root/reference/src/data_generator.cc:6-55,
          /root/reference/src/test_data_generator.cc:8-62)
* G3     uniform(0,100) variant (/root/reference/src/metadata_benchmark.cc:106-149)
* G4     float64 `column_i` variant (/root/reference/src/pq_fb_ns_data_generator.cc:63-98)
* G5     numpy variant uniform[0,1) (/root/reference/scripts/schema_full_partial_benchmark.py:8-11)

One parameterized generator covers all five. Differences from the
reference, by design:
* Deterministic: explicit seed, per-column `F.rand(seed+i)` (the
  reference seeds from std::random_device — not reproducible).
* Distributed: `spark.range(n_rows, numPartitions=…)` generates
  partitions in parallel on executors — a 10^9-row × 10^4-col table
  generates cluster-wide with zero driver involvement, where the
  reference builds one Arrow column at a time in a single process.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DIST_PRESETS = {
    "uniform_pm1000": (-1000.0, 1000.0),  # G1/G2 (data_generator.cc:18)
    "uniform_0_100": (0.0, 100.0),        # G3 (metadata_benchmark.cc:117)
    "uniform_0_1": (0.0, 1.0),            # G5 (numpy random.rand)
}


# Above this width, a select() of n_cols rand() expressions makes
# Catalyst analysis + codegen the bottleneck (10k exprs ≈ 2 min);
# the numpy path generates the same shape in seconds.
NUMPY_PATH_MIN_COLS = 1500


def wide_table(
    spark: SparkSession,
    n_cols: int,
    n_rows: int,
    dtype: str = "float",
    seed: int = 42,
    dist: str = "uniform_pm1000",
    col_prefix: str = "col_",
    n_partitions: int | None = None,
) -> DataFrame:
    """N-column wide random table. dtype='float' → G1-G3/G5 shape
    (`col_i` float32); dtype='double', col_prefix='column_' → G4.

    Expression path (moderate widths): pure Catalyst, fully
    deterministic per (seed, row). Numpy path (very wide): Arrow-
    batched mapInPandas, deterministic per (seed, partition layout) —
    matching the reference's G5 numpy generator
    (scripts/schema_full_partial_benchmark.py:8-11) but distributed.
    """
    lo, hi = DIST_PRESETS[dist]
    if n_partitions is None:
        n_partitions = max(1, min(spark.sparkContext.defaultParallelism, n_rows // 1000 or 1))
    if n_cols >= NUMPY_PATH_MIN_COLS:
        return _wide_table_numpy(
            spark, n_cols, n_rows, dtype, seed, lo, hi, col_prefix, n_partitions
        )
    base = spark.range(0, n_rows, numPartitions=n_partitions)
    cols = [
        (F.rand(seed + i) * (hi - lo) + lo).cast(dtype).alias(f"{col_prefix}{i}")
        for i in range(n_cols)
    ]
    return base.select(*cols)


def _wide_table_numpy(
    spark: SparkSession,
    n_cols: int,
    n_rows: int,
    dtype: str,
    seed: int,
    lo: float,
    hi: float,
    col_prefix: str,
    n_partitions: int,
) -> DataFrame:
    import numpy as np
    import pandas as pd

    np_dtype = {"float": np.float32, "double": np.float64}[dtype]
    names = [f"{col_prefix}{i}" for i in range(n_cols)]
    schema = ", ".join(f"`{n}` {dtype}" for n in names)

    def gen(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # seed from the first row id → reproducible given the same
            # partition layout (ids are contiguous per range-partition)
            rng = np.random.RandomState((seed + int(pdf["id"].iloc[0])) % (2**31))
            data = rng.uniform(lo, hi, size=(len(pdf), n_cols)).astype(np_dtype)
            yield pd.DataFrame(data, columns=names)

    base = spark.range(0, n_rows, numPartitions=n_partitions)
    return base.mapInPandas(gen, schema=schema)


def wide_table_g4(spark: SparkSession, n_cols: int, n_rows: int, seed: int = 42) -> DataFrame:
    """G4: `column_i` doubles (the reference declares float64 but builds
    float32 values — pq_fb_ns_data_generator.cc:67 vs :78; we generate
    true doubles, documenting the reference's inconsistency away)."""
    return wide_table(
        spark, n_cols, n_rows, dtype="double", seed=seed, col_prefix="column_"
    )


# ---------------------------------------------------------------------------
# Axis-separation fixtures for the scale-shape gate (round 8)
# ---------------------------------------------------------------------------
#
# The sf0.01→sf0.1 testdata pair grows DENSITY (same users/vocabulary,
# more rows per hour / more docs sharing the phrase pool), so it cannot
# distinguish "candidate work is quadratic in density" from "candidate
# work is quadratic, full stop". Production growth for the two
# density-quadratic ops is the OTHER axis — more timespan (events),
# more disjoint domains (corpora) — and along that axis the banded
# designs claim LINEAR candidate work. These builders synthesize that
# axis from the sf0.01 tables (never writing under /root/testdata):
#
# * timespan_extended_events: the events table replicated k× along the
#   time axis (each copy shifted past the previous copy's span, ids
#   offset) — per-hour session density identical, timespan k×.
# * vocab_sharded_documents: the documents table replicated k× with a
#   per-shard token prefix — per-shard phrase-sharing density
#   identical to sf0.01, vocabulary disjoint across shards (a new
#   domain shares no shingles with an old one), corpus k×.
#
# tests/test_scale_shapes.py asserts the candidate probes grow ~k×
# (linear) on these, against the ~k²× the same probes measure on the
# density pair.


def _synth_cache_dir() -> str:
    import os

    return os.environ.get("ENGINE_BENCH_CACHE", "/tmp/engine_bench_cache")


def _src_tag(src_file: str) -> str:
    """Source-file fingerprint (size + mtime) folded into the fixture
    dir name, so a testdata regeneration — which HAS changed physical
    layouts across rounds (events ts: TIMESTAMP(NANOS) → timestamp[us])
    — invalidates the cached synthetic fixture instead of silently
    serving one built from the old tables (ADVICE r8)."""
    import os

    st = os.stat(src_file)
    return f"{st.st_size}_{st.st_mtime_ns}"


def timespan_extended_events(src_sf_dir: str, copies: int = 10) -> str:
    """Write (once) and return a table dir whose events.parquet is the
    source replicated ``copies``× along the time axis. Handles both
    physical ts layouts (timestamp[us] and bigint ns — TESTDATA.md)."""
    import os

    import pyarrow.parquet as pq

    src = os.path.join(src_sf_dir, "events.parquet")
    out_dir = os.path.join(
        _synth_cache_dir(),
        f"synth_timespan_{copies}x_{os.path.basename(src_sf_dir.rstrip('/'))}"
        f"_{_src_tag(src)}",
    )
    out = os.path.join(out_dir, "events.parquet")
    if os.path.exists(out):
        return out_dir
    import pandas as pd

    df = pq.read_table(os.path.join(src_sf_dir, "events.parquet")).to_pandas()
    if pd.api.types.is_integer_dtype(df["ts"]):
        span = int(df["ts"].max() - df["ts"].min())
        day = 86_400 * 1_000_000_000  # bigint layout is epoch-ns
        shift_unit = ((span // day) + 2) * day
    else:
        span_days = (df["ts"].max() - df["ts"].min()).days
        shift_unit = pd.Timedelta(days=span_days + 2)
    id_off = int(df["event_id"].max()) + 1
    parts = []
    for k in range(copies):
        d = df.copy()
        d["ts"] = d["ts"] + k * shift_unit
        d["event_id"] = d["event_id"] + k * id_off
        parts.append(d)
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow as pa

    # write-then-rename: the exists() guard above must never trust a
    # partially-written file from a crashed builder
    tmp = out + ".tmp"
    pq.write_table(pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                        preserve_index=False), tmp)
    os.replace(tmp, out)
    return out_dir


def vocab_sharded_documents(src_sf_dir: str, shards: int = 10) -> str:
    """Write (once) and return a table dir whose documents.parquet is
    ``shards`` disjoint-vocabulary copies of the source corpus: shard s
    prefixes every token with ``s{s}_`` and offsets doc_id by s·10,000
    (a multiple of the dedup planting modulus, so the planted-excerpt
    pattern is preserved per shard)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(src_sf_dir, "documents.parquet")
    out_dir = os.path.join(
        _synth_cache_dir(),
        f"synth_vocabshard_{shards}x_{os.path.basename(src_sf_dir.rstrip('/'))}"
        f"_{_src_tag(src)}",
    )
    out = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(out):
        return out_dir
    import pandas as pd

    df = pq.read_table(os.path.join(src_sf_dir, "documents.parquet")).to_pandas()
    parts = []
    for s in range(shards):
        d = df.copy()
        d["doc_id"] = d["doc_id"] + s * 10_000
        pre = f"s{s}_"
        d["text"] = d["text"].map(
            lambda t, pre=pre: " ".join(pre + w for w in t.split(" "))
        )
        parts.append(d)
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + ".tmp"
    pq.write_table(pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                        preserve_index=False), tmp)
    os.replace(tmp, out)
    return out_dir


def vocab_sharded_parts(src_sf_dir: str, shards: int = 10) -> str:
    """Write (once) and return a table dir whose part.parquet is
    ``shards`` disjoint-vocabulary copies of the source part table:
    shard s prefixes every p_name word with ``s{s}_`` (the blocking
    noun — the LAST name word — becomes shard-local) and offsets
    p_partkey by s·1,000,000. The production axis for
    fuzzy_join_part_names: new part families share no name nouns."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(src_sf_dir, "part.parquet")
    out_dir = os.path.join(
        _synth_cache_dir(),
        f"synth_partshard_{shards}x_{os.path.basename(src_sf_dir.rstrip('/'))}"
        f"_{_src_tag(src)}",
    )
    out = os.path.join(out_dir, "part.parquet")
    if os.path.exists(out):
        return out_dir
    import pandas as pd

    df = pq.read_table(os.path.join(src_sf_dir, "part.parquet")).to_pandas()
    parts = []
    for s in range(shards):
        d = df.copy()
        d["p_partkey"] = d["p_partkey"] + s * 1_000_000
        pre = f"s{s}_"
        d["p_name"] = d["p_name"].map(
            lambda t, pre=pre: " ".join(pre + w for w in t.split(" "))
        )
        parts.append(d)
    os.makedirs(out_dir, exist_ok=True)
    tmp = out + ".tmp"
    pq.write_table(pa.Table.from_pandas(pd.concat(parts, ignore_index=True),
                                        preserve_index=False), tmp)
    os.replace(tmp, out)
    return out_dir
