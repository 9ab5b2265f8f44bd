"""Round-trip write/read tests (SURVEY §5 item 2): writer knobs land in
the footer, content survives every codec, generators are deterministic."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from gresearch_parquet_benchmarking_spark.sources import io as eio
from gresearch_parquet_benchmarking_spark.sources.datagen import wide_table, wide_table_g4


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="engine_io_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_wide_table_deterministic(spark):
    a = wide_table(spark, 5, 1000, seed=7).toPandas()
    b = wide_table(spark, 5, 1000, seed=7).toPandas()
    assert (a.values == b.values).all()
    c = wide_table(spark, 5, 1000, seed=8).toPandas()
    assert not (a.values == c.values).all()


def test_wide_table_shapes(spark):
    df = wide_table(spark, 12, 500)
    assert df.columns == [f"col_{i}" for i in range(12)]
    assert df.schema.fields[0].dataType.simpleString() == "float"
    assert df.count() == 500
    g4 = wide_table_g4(spark, 3, 100)
    assert g4.columns == ["column_0", "column_1", "column_2"]
    assert g4.schema.fields[0].dataType.simpleString() == "double"


def test_values_in_distribution(spark):
    import pyspark.sql.functions as F

    df = wide_table(spark, 2, 5000)
    row = df.agg(
        F.min("col_0").alias("lo"), F.max("col_0").alias("hi")
    ).collect()[0]
    assert -1000 <= row.lo < -800  # uniform(-1000,1000) should fill range
    assert 800 < row.hi <= 1000


def test_codec_lands_in_footer(spark, workdir):
    df = wide_table(spark, 8, 2000)
    for codec, expect in [("snappy", "SNAPPY"), ("zstd", "ZSTD"), ("none", "UNCOMPRESSED")]:
        res = eio.write_parquet(df, f"{workdir}/codec_{codec}", codec=codec)
        layout = eio.rowgroup_layout(res.path)
        assert layout[0]["codec"] == expect


def test_row_group_rows_targeting(spark, workdir):
    df = wide_table(spark, 20, 10000)
    bpr = eio.estimate_bytes_per_row(df, f"{workdir}/probe")
    res = eio.write_parquet(
        df, f"{workdir}/rg", codec="snappy", row_group_rows=2500, bytes_per_row=bpr
    )
    layout = eio.rowgroup_layout(res.path)
    assert len(layout) >= 3  # ~4 groups of ~2500 from 10k rows
    biggest = max(g["num_rows"] for g in layout)
    assert 1500 <= biggest <= 4000  # bytes→rows conversion is approximate


def test_content_identical_across_codecs(spark, workdir):
    df = wide_table(spark, 6, 3000)
    sums = []
    for codec in ("none", "snappy", "zstd", "gzip"):
        res = eio.write_parquet(df, f"{workdir}/content_{codec}", codec=codec)
        sums.append(eio.checksum_all_columns(spark, res.path))
    assert len(set(sums)) == 1, sums


def test_roundtrip_schema_equality(spark, workdir):
    df = wide_table(spark, 9, 100)
    res = eio.write_parquet(df, f"{workdir}/schema_rt")
    back = spark.read.parquet(res.path)
    # nullability widens on read-back (parquet marks optional); names
    # and types must round-trip exactly
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]


def test_metadata_timed_fields(spark, workdir):
    df = wide_table(spark, 30, 2000)
    res = eio.write_parquet(df, f"{workdir}/meta")
    md = eio.read_metadata_timed(res.path)
    assert md.n_columns == 30
    assert md.n_row_groups >= 1
    assert md.total_s > 0 and md.thrift_decode_s > 0
    assert md.total_s >= md.thrift_decode_s


def test_head_rows_viewer(spark, workdir):
    df = wide_table(spark, 4, 50)
    res = eio.write_parquet(df, f"{workdir}/viewer")
    rows = eio.head_rows(spark, res.path, 20)
    assert len(rows) == 20
