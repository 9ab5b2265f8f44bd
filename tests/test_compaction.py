"""Small-file compaction (sources/compaction.py): a fragmented dataset
rewrites into the planned number of target-sized files with no row
loss, and the sort_by variant buys disjoint min/max ranges."""

from __future__ import annotations

import shutil
import tempfile

import pyarrow.parquet as pq
import pytest

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.sources.compaction import (
    compact,
    plan_compaction,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def fragmented(spark):
    """lineitem sprayed into 64 tiny files — the streaming-sink debris
    compaction exists to clean up."""
    d = tempfile.mkdtemp(prefix="compact_in_")
    out = tempfile.mkdtemp(prefix="compact_out_")
    load_table(spark, SF_SMOKE, "lineitem").repartition(64).write.mode(
        "overwrite"
    ).parquet(d)
    yield d, out
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)


def test_plan_sizes_from_bytes(fragmented):
    d, _ = fragmented
    plan = plan_compaction(d, target_bytes=64 << 10)
    assert plan.n_files == 64
    assert plan.n_output_files == -(-plan.total_bytes // (64 << 10))
    assert plan.worthwhile


def test_compact_reduces_files_and_keeps_rows(spark, fragmented):
    d, out = fragmented
    n_rows = spark.read.parquet(d).count()
    before, after = compact(spark, d, out, target_bytes=256 << 10)
    assert after.n_files == before.n_output_files < before.n_files
    assert spark.read.parquet(out).count() == n_rows
    # 64 tiny files carry so much per-file overhead (footer, dict pages)
    # that the rewrite itself shrinks total bytes — so one more pass may
    # legitimately be planned; compaction must CONVERGE, not oscillate
    replan = plan_compaction(out, target_bytes=256 << 10)
    if replan.worthwhile:
        out2 = out + "_pass2"
        try:
            _, after2 = compact(spark, out, out2, target_bytes=256 << 10)
            assert spark.read.parquet(out2).count() == n_rows
            assert not plan_compaction(out2, target_bytes=256 << 10).worthwhile
        finally:
            shutil.rmtree(out2, ignore_errors=True)


def test_compact_sorted_gives_disjoint_ranges(spark, fragmented):
    d, out = fragmented
    compact(spark, d, out, target_bytes=256 << 10, sort_by=["l_orderkey"])
    ranges = []
    for f, _sz in sorted(
        __import__(
            "gresearch_parquet_benchmarking_spark.sources.compaction",
            fromlist=["_data_files"],
        )._data_files(out)
    ):
        md = pq.read_metadata(f)
        idx = md.schema.names.index("l_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    # range-partitioned files never interleave key ranges
    for (lo_a, hi_a), (lo_b, _hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b
