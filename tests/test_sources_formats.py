"""Partition pruning, format round-trips, lakehouse gating, gbench JSON."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.bench.gbench import parse_gbench, write_gbench_json
from gresearch_parquet_benchmarking_spark.plans.explain import formatted_plan
from gresearch_parquet_benchmarking_spark.sources.formats import (
    LakehouseUnavailable,
    delta_table,
    iceberg_table,
    write_read_roundtrip,
)
from gresearch_parquet_benchmarking_spark.sources.partitioned import (
    lineitem_partitioned_by_shipyear,
)
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="engine_fmt_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_and_pruning(spark, workdir):
    res = lineitem_partitioned_by_shipyear(spark, SF_SMOKE, f"{workdir}/li_part")
    assert res.n_partitions >= 5  # shipdates span 1995-2001

    df = spark.read.parquet(res.path).filter(F.col("ship_year") == 1997)
    plan = formatted_plan(df)
    # the year predicate must become a PartitionFilter (directory
    # pruning), not a data filter
    assert "PartitionFilters: [isnotnull(ship_year" in plan or "PartitionFilters: [" in plan
    assert "ship_year" in plan.split("PartitionFilters:")[1].split("]")[0]

    years = [r.ship_year for r in df.select("ship_year").distinct().collect()]
    assert years == [1997]


def test_partition_pruning_reads_less(spark, workdir):
    path = f"{workdir}/li_part"
    full = spark.read.parquet(path)
    one = full.filter(F.col("ship_year") == 1997)
    # pruned scan lists fewer files than the full scan
    assert one.rdd.getNumPartitions() <= full.rdd.getNumPartitions()


def test_dynamic_partition_pruning(spark, workdir):
    """Join-driven pruning: when the partition key is only constrained
    THROUGH a join (no literal predicate on the fact), Spark must inject
    a dynamicpruning subquery into the fact scan's PartitionFilters so
    excluded years are never read — the mechanism that keeps a
    time-partitioned 100 TB fact table cheap to join against a filtered
    dim."""
    path = f"{workdir}/li_part"  # written by test_partitioned_write_and_pruning
    fact = spark.read.parquet(path)
    # The dim filter must be a RANGE: an equality like year(d)=1997 gets
    # constant-folded through the join into a static PartitionFilter
    # (no subquery needed). A range keeps the surviving year set
    # runtime-only, forcing the dynamicpruning mechanism itself.
    dim = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderdate").between("1997-02-01", "1997-10-31"))
        .select(F.year("o_orderdate").alias("yr"))
        .distinct()
    )
    joined = fact.join(dim, fact.ship_year == dim.yr).select("l_orderkey", "ship_year")
    plan = formatted_plan(joined)
    scan_filters = plan.split("PartitionFilters:")[1].split("]]")[0]
    assert "dynamicpruning" in scan_filters
    # and the pruned join returns exactly the 1997 slice
    assert (
        joined.count()
        == fact.filter(F.col("ship_year") == 1997).count()
    )


@pytest.mark.parametrize("fmt", ["csv", "json", "orc", "parquet"])
def test_format_roundtrip(spark, workdir, fmt):
    src = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
        .limit(100)
    )
    back = write_read_roundtrip(src, f"{workdir}/rt_{fmt}", fmt)
    a = sorted(map(tuple, src.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_lakehouse_stubs_raise_cleanly(spark):
    with pytest.raises(LakehouseUnavailable, match="delta-spark"):
        delta_table(spark, "/tmp/nonexistent_delta")
    with pytest.raises(LakehouseUnavailable, match="iceberg-spark-runtime"):
        iceberg_table(spark, "nonexistent.iceberg_table")


def test_gbench_json_roundtrip(spark, workdir):
    rows = [
        {"name": "BM_ParseThrift/2000", "real_time_ns": 15.19e6, "iterations": 46},
        {"name": "BM_ParseThrift/3000", "real_time_ns": 20.73e6, "iterations": 34},
        {"name": "BM_ReadPartialData/3000/3000/0", "real_time_ns": 16.12e6, "iterations": 43},
    ]
    path = write_gbench_json(rows, f"{workdir}/gbench.json")
    parsed = parse_gbench(spark, path).orderBy("name").collect()
    assert [r.benchmark for r in parsed] == [
        "BM_ParseThrift", "BM_ParseThrift", "BM_ReadPartialData"
    ]
    assert parsed[0].arg0 == 2000 and parsed[0].arg1 is None
    assert parsed[2].arg0 == 3000 and parsed[2].arg1 == 3000
    assert abs(parsed[0].real_time_ms - 15.19) < 1e-9


def test_schema_evolution_merged_read(spark, tmp_path):
    """Two append batches with evolving schema: the merged read sees
    the union schema, old rows NULL-fill the new column, and a
    non-merged read of the union still serves the ORIGINAL columns
    (additive evolution never breaks existing readers)."""
    from gresearch_parquet_benchmarking_spark.sources.formats import (
        read_merged_schema,
    )

    d = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string").write.parquet(d)
    spark.createDataFrame(
        [(3, "c", 30.0), (4, "d", 40.0)], "id long, v string, score double"
    ).write.mode("append").parquet(d)

    merged = read_merged_schema(spark, d)
    assert set(merged.columns) == {"id", "v", "score"}
    rows = {r.id: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score is None
    assert rows[3].score == 30.0 and rows[4].score == 40.0
    assert len(rows) == 4
