"""S5 CSV sink + A3 glob-union round trip."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from gresearch_parquet_benchmarking_spark.bench.results_io import (
    read_results_glob,
    write_results_csv,
)


@pytest.fixture()
def outdir():
    d = tempfile.mkdtemp(prefix="results_io_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_roundtrip_and_glob_union(spark, outdir):
    run1 = [
        {"num_columns": 10, "decode_time_ms": 0.3, "size_mb": 0.55},
        {"num_columns": 100, "decode_time_ms": 0.7, "size_mb": 5.5},
    ]
    run2 = [{"num_columns": 1000, "decode_time_ms": 6.5, "size_mb": 55.1}]
    write_results_csv(spark, run1, f"{outdir}/run1_results.csv")
    write_results_csv(spark, run2, f"{outdir}/run2_results.csv")
    merged = read_results_glob(spark, f"{outdir}/run*_results.csv")
    assert merged.count() == 3
    assert set(merged.columns) == {"num_columns", "decode_time_ms", "size_mb"}
    assert merged.agg({"num_columns": "max"}).collect()[0][0] == 1000


def test_empty_rows_rejected(spark):
    with pytest.raises(ValueError):
        write_results_csv(spark, [], "/tmp/never")
