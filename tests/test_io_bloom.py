"""Parquet bloom filters: footer presence + row-group skipping on a
point lookup that statistics cannot prune.

The fixture key is md5-derived (high-cardinality, unsorted), so every
row group's [min,max] spans essentially the whole 56-bit range —
stats-based pruning is provably useless — and dictionary encoding is
disabled at write, so dictionary-page filtering cannot shadow the
effect. The absent probe value is an EXISTING key + 1: in-range (no
stats skip) and absent with near-certainty in the sparse key space.
The deterministic evidence is the executed scan's numOutputRows
(df.inputFiles()/timing prove nothing — CLAUDE.md)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.sources import io as eio

N_ROWS = 200_000


@pytest.fixture(scope="module")
def bloom_path(spark):
    d = tempfile.mkdtemp(prefix="bloom_io_")
    path = f"{d}/keyed.parquet"
    df = spark.range(N_ROWS).select(
        F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 14), 16, 10)
        .cast("bigint")
        .alias("k"),
        F.col("id").alias("v"),
    )
    eio.write_parquet_bloom(
        df,
        path,
        bloom_ndv={"k": N_ROWS},
        row_group_rows=25_000,
        bytes_per_row=16.0,
    )
    yield path
    shutil.rmtree(d, ignore_errors=True)


def _absent_key(spark, path) -> int:
    some = spark.read.parquet(path).select("k").limit(1).collect()
    return some[0][0] + 1


def test_bloom_written_only_for_requested_column(spark, bloom_path):
    offsets = eio.bloom_filter_offsets(spark, bloom_path)
    assert offsets["k"] >= 0       # bloom filter present
    assert offsets["v"] == -1      # not requested → not written


def test_stats_cannot_prune_this_layout(bloom_path):
    # the premise of the A/B: an in-range probe overlaps EVERY group
    probe = 2**55  # mid-range of the 56-bit md5 key space
    matching, total = eio.row_groups_matching(bloom_path, "k", probe, probe)
    assert total > 1
    assert matching == total


def test_bloom_skips_all_row_groups_for_absent_key(spark, bloom_path):
    absent = _absent_key(spark, bloom_path)
    _dt, scanned = eio.point_lookup_timed(spark, bloom_path, "k", absent, use_bloom=True)
    assert scanned == 0  # every row group answered "definitely not here"


def test_without_bloom_full_column_decodes(spark, bloom_path):
    absent = _absent_key(spark, bloom_path)
    _dt, scanned = eio.point_lookup_timed(
        spark, bloom_path, "k", absent, use_bloom=False
    )
    assert scanned == N_ROWS  # no pruning signal → whole column decoded


def test_lookup_result_correct_both_ways(spark, bloom_path):
    present = spark.read.parquet(bloom_path).select("k").limit(1).collect()[0][0]
    for use_bloom in (True, False):
        n = (
            spark.read.option(
                "parquet.filter.bloom.enabled", str(use_bloom).lower()
            )
            .parquet(bloom_path)
            .filter(F.col("k") == present)
            .count()
        )
        assert n >= 1
