"""Storage-layout effects the reference measures via stats decode,
driven to their purpose: row-group skipping and dictionary encoding."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from conftest import SF_CORRECT

from gresearch_parquet_benchmarking_spark.sources import io as eio
from gresearch_parquet_benchmarking_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def workdir():
    d = tempfile.mkdtemp(prefix="layout_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_clustered_layout_skips_row_groups(spark, workdir):
    """Sorting by the filter column before writing narrows per-row-group
    min/max ranges → stats-based skipping actually skips. Unsorted
    layout: every row group spans the full date range (zero skipping).
    This is the 100 TB reason to cluster fact tables by query keys."""
    li = load_table(spark, SF_CORRECT, "lineitem")
    bpr = eio.estimate_bytes_per_row(li, f"{workdir}/probe")

    unsorted = f"{workdir}/li_unsorted"
    eio.write_parquet(li, unsorted, row_group_rows=5000, bytes_per_row=bpr)
    clustered = f"{workdir}/li_clustered"
    eio.write_parquet(
        li.sort("l_shipdate"), clustered, row_group_rows=5000, bytes_per_row=bpr
    )

    import datetime

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 12, 31)
    m_un, t_un = eio.row_groups_matching(unsorted, "l_shipdate", lo, hi)
    m_cl, t_cl = eio.row_groups_matching(clustered, "l_shipdate", lo, hi)
    # unsorted: (nearly) every group overlaps one year of seven
    assert m_un >= 0.9 * t_un
    # clustered: only ~1/7 of groups overlap; allow generous slack
    assert m_cl <= 0.45 * t_cl, (m_cl, t_cl)
    # correctness unchanged by layout
    a = spark.read.parquet(unsorted).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    ).count()
    b = spark.read.parquet(clustered).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    ).count()
    assert a == b > 0


def test_dictionary_encoding_shrinks_low_cardinality(spark, workdir):
    """parquet.enable.dictionary (the reference's encoding knob,
    flatbuff_ns.fbs:129-140 models these encodings): low-cardinality
    strings shrink with dictionaries; random floats don't care."""
    li = load_table(spark, SF_CORRECT, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_shipdate"
    )
    with_dict = eio.write_parquet(li, f"{workdir}/dict_on", dictionary=True)
    without = eio.write_parquet(li, f"{workdir}/dict_off", dictionary=False)
    assert with_dict.file_bytes < 0.8 * without.file_bytes, (
        with_dict.file_bytes, without.file_bytes,
    )


def test_rocksdb_state_store_backend(spark, workdir):
    """Streaming aggregation on the RocksDB state store (the
    spill-capable backend a 100 TB streaming dedup needs) — same
    results as the default in-memory provider."""
    src = f"{workdir}/rocks_src"
    spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(1000)], "id long, k long, v double"
    ).write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    ckpt = f"{workdir}/rocks_ckpt"
    try:
        stream = spark.readStream.schema("id long, k long, v double").parquet(src)
        agg = stream.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("rocks_out")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()
        rows = {r.k: r.n for r in spark.sql("SELECT * FROM rocks_out").collect()}
        assert sum(rows.values()) == 1000 and len(rows) == 7
    finally:
        if prev:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_zorder_layout_skips_on_both_dimensions(spark, workdir):
    """Z-order (Morton) clustering: a single-column sort gives perfect
    stats ranges on its own column and none on any other; interleaving
    two rank-normalized dimensions gives partial skipping on BOTH —
    the layout a 100 TB fact table wants when queries filter several
    columns. Measured at sf0.01 / 2000-row groups: datesort = 17% date
    / 100% partkey; zorder ≈ 40% / 41%."""
    import datetime

    from gresearch_parquet_benchmarking_spark.sources.layout import zorder_by

    li = load_table(spark, SF_CORRECT, "lineitem")
    bpr = eio.estimate_bytes_per_row(li, f"{workdir}/zprobe")
    paths = {}
    for name, df in {
        "datesort": li.sort("l_shipdate"),
        "zorder": zorder_by(li, ["l_shipdate", "l_partkey"]),
    }.items():
        paths[name] = f"{workdir}/z_{name}"
        eio.write_parquet(
            df, paths[name], row_group_rows=2000, bytes_per_row=bpr,
            single_file=(name == "datesort"),
        )

    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 12, 31)

    def frac(path, col, a, b):
        m, t = eio.row_groups_matching(path, col, a, b)
        return m / t

    # primary dimension: zorder trades some of the perfect-sort skipping…
    assert frac(paths["datesort"], "l_shipdate", lo, hi) <= 0.3
    assert frac(paths["zorder"], "l_shipdate", lo, hi) <= 0.6
    # …to buy skipping on the secondary dimension the sort can't touch
    assert frac(paths["datesort"], "l_partkey", 400, 800) >= 0.9
    assert frac(paths["zorder"], "l_partkey", 400, 800) <= 0.6
    # clustering is a pure reordering: content unchanged
    assert spark.read.parquet(paths["zorder"]).count() == li.count()
