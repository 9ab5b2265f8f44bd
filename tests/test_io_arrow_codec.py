"""Distributed Arrow-codec sink/source (S2 brotli path): executor-side
pyarrow encode/decode through mapInArrow — one file per task on write,
one task per file on read — must round-trip exactly and actually land
the requested codec in the footer."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

from gresearch_parquet_benchmarking_spark.sources import io as eio
from gresearch_parquet_benchmarking_spark.sources.datagen import wide_table


def _checksum(df):
    row = df.agg(
        *[F.sum(F.col(c).cast("double")).alias(c) for c in df.columns]
    ).collect()[0]
    return [round(v, 6) if v is not None else None for v in row]


@pytest.mark.parametrize("codec", ["brotli", "zstd"])
def test_arrow_codec_sink_roundtrip(spark, tmp_path, codec):
    import pyarrow as pa

    if not pa.Codec.is_available(codec):
        pytest.skip(f"{codec} not in this pyarrow build")
    df = wide_table(spark, 20, 4000, n_partitions=4)
    path = str(tmp_path / f"arrow_{codec}")
    try:
        res = eio.write_parquet_arrow_codec(df, path, codec=codec)
        # one file per (non-empty) task, codec actually in the footer
        assert res.options["n_files"] == 4
        assert res.file_bytes > 0
        layout = eio.rowgroup_layout(path)
        assert layout and all(g["codec"].lower() == codec for g in layout)
        # distributed decode: values survive the round trip exactly
        back = eio.read_parquet_arrow_codec(spark, path)
        assert back.columns == df.columns
        assert back.count() == 4000
        assert _checksum(back) == _checksum(df)
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_arrow_codec_read_is_one_task_per_file(spark, tmp_path):
    df = wide_table(spark, 10, 1000, n_partitions=3)
    path = str(tmp_path / "arrow_snappy")
    try:
        eio.write_parquet_arrow_codec(df, path, codec="snappy")
        back = eio.read_parquet_arrow_codec(spark, path)
        assert back.rdd.getNumPartitions() == 3
    finally:
        shutil.rmtree(path, ignore_errors=True)


def test_task_time_probe_falls_back_without_ui(spark):
    # the shared test session runs spark.ui.enabled=false: the REST
    # probe must degrade to (wall, None) and _task_or_wall to wall
    import bench

    wall, task = eio.timed_with_task_time(spark, lambda: spark.range(10).count())
    assert wall > 0 and task is None
    assert bench._task_or_wall(spark, lambda: spark.range(10).count()) > 0
