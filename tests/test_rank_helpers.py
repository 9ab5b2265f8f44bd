"""Unit pins for the r9 two-pass ranking helpers (analytics.py):
_global_row_number must reproduce a single-window ROW_NUMBER exactly,
and _ntile_from_rank must reproduce Spark's own NTILE bucket spread —
including the n < tiles edge (every row its own bucket) and the
uneven-remainder spread (larger buckets first). The late-r9 grouped
variants (_grouped_row_number, _ntile_from_rank_col) are pinned the
same way against PARTITION BY group windows, including multi-column
groups and per-group n < tiles edges."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators.analytics import (
    _global_row_number,
    _grouped_row_number,
    _ntile_from_rank,
    _ntile_from_rank_col,
)
from gresearch_parquet_benchmarking_spark.operators.registry import (
    release_persists,
)


def _frame(spark, n):
    # keys with heavy ties (k) force the user-id tiebreak; id order is
    # deliberately not insertion order
    rows = [(i, (i * 7) % 5) for i in range(n)]
    return spark.createDataFrame(rows, "id long, k long")


@pytest.mark.parametrize("n,tiles", [(3, 4), (7, 4), (10, 4), (101, 4), (64, 7)])
def test_ntile_from_rank_matches_spark_ntile(spark, n, tiles):
    df = _frame(spark, n)
    try:
        ranked, total = _global_row_number(
            df, [F.asc("k"), F.asc("id")], alias="rn", ranges=8
        )
        assert total == n
        ours = (
            ranked.select(
                "id", _ntile_from_rank(F.col("rn"), total, tiles).alias("b")
            )
            .toPandas()
            .set_index("id")["b"]
        )
        ref = (
            df.select(
                "id",
                F.ntile(tiles)
                .over(W.orderBy(F.asc("k"), F.asc("id")))
                .cast("long")
                .alias("b"),
            )
            .toPandas()
            .set_index("id")["b"]
        )
        assert ours.sort_index().tolist() == ref.sort_index().tolist()
    finally:
        release_persists()


def test_global_row_number_matches_single_window(spark):
    df = _frame(spark, 57)
    try:
        ranked, total = _global_row_number(
            df, [F.desc("k"), F.asc("id")], alias="rn", ranges=8
        )
        assert total == 57
        ours = ranked.select("id", "rn").toPandas().set_index("id")["rn"]
        ref = (
            df.select(
                "id",
                F.row_number()
                .over(W.orderBy(F.desc("k"), F.asc("id")))
                .cast("long")
                .alias("rn"),
            )
            .toPandas()
            .set_index("id")["rn"]
        )
        assert ours.sort_index().tolist() == ref.sort_index().tolist()
    finally:
        release_persists()


def _grouped_frame(spark, n):
    # groups g (strings, uneven sizes incl. a 2-row group for the
    # per-group n < tiles edge), tie-heavy sort key k, unique id
    rows = [(i, ["en", "de", "fr", "xx"][min(3, i % 7)], (i * 7) % 5) for i in range(n)]
    return spark.createDataFrame(rows, "id long, g string, k long")


@pytest.mark.parametrize("n", [11, 57, 101])
def test_grouped_row_number_matches_group_window(spark, n):
    df = _grouped_frame(spark, n)
    try:
        ranked = _grouped_row_number(
            df, ["g"], [F.desc("k"), F.asc("id")], alias="rn", ranges=8
        )
        ours = ranked.select("id", "rn").toPandas().set_index("id")["rn"]
        ref = (
            df.select(
                "id",
                F.row_number()
                .over(W.partitionBy("g").orderBy(F.desc("k"), F.asc("id")))
                .cast("long")
                .alias("rn"),
            )
            .toPandas()
            .set_index("id")["rn"]
        )
        assert ours.sort_index().tolist() == ref.sort_index().tolist()
    finally:
        release_persists()


def test_grouped_row_number_multi_column_group(spark):
    rows = [(i, ["a", "b"][i % 2], ["x", "y", "z"][i % 3], (i * 3) % 4) for i in range(41)]
    df = spark.createDataFrame(rows, "id long, g1 string, g2 string, k long")
    try:
        ranked = _grouped_row_number(
            df, ["g1", "g2"], [F.asc("k"), F.asc("id")], alias="rn", ranges=8
        )
        ours = ranked.select("id", "rn").toPandas().set_index("id")["rn"]
        ref = (
            df.select(
                "id",
                F.row_number()
                .over(W.partitionBy("g1", "g2").orderBy(F.asc("k"), F.asc("id")))
                .cast("long")
                .alias("rn"),
            )
            .toPandas()
            .set_index("id")["rn"]
        )
        assert ours.sort_index().tolist() == ref.sort_index().tolist()
    finally:
        release_persists()


def test_grouped_row_number_boolean_group(spark):
    """r9 ADVICE hardening: map keys come from the Spark-side string
    cast taken off the probe rows, so a boolean group column (whose
    Python str() — 'True' — diverges from Spark's cast — 'true') must
    rank correctly, not silently yield NULL ranks."""
    rows = [(i, i % 2 == 0, (i * 7) % 5) for i in range(37)]
    df = spark.createDataFrame(rows, "id long, g boolean, k long")
    try:
        ranked = _grouped_row_number(
            df, ["g"], [F.asc("k"), F.asc("id")], alias="rn", ranges=8
        )
        ours = ranked.select("id", "rn").toPandas().set_index("id")["rn"]
        assert not ours.isna().any()
        ref = (
            df.select(
                "id",
                F.row_number()
                .over(W.partitionBy("g").orderBy(F.asc("k"), F.asc("id")))
                .cast("long")
                .alias("rn"),
            )
            .toPandas()
            .set_index("id")["rn"]
        )
        assert ours.sort_index().tolist() == ref.sort_index().tolist()
    finally:
        release_persists()


def test_grouped_row_number_rejects_null_group(spark):
    rows = [(0, "en", 1), (1, None, 2), (2, "de", 3)]
    df = spark.createDataFrame(rows, "id long, g string, k long")
    try:
        with pytest.raises(ValueError, match="NULL group value"):
            _grouped_row_number(df, ["g"], [F.asc("k"), F.asc("id")], ranges=4)
    finally:
        release_persists()


def test_grouped_row_number_rejects_separator_in_group_value(spark):
    rows = [(0, "en", 1), (1, "a\x1fb", 2), (2, "de", 3)]
    df = spark.createDataFrame(rows, "id long, g string, k long")
    try:
        with pytest.raises(ValueError, match="separator"):
            _grouped_row_number(df, ["g"], [F.asc("k"), F.asc("id")], ranges=4)
    finally:
        release_persists()


@pytest.mark.parametrize("n,tiles", [(23, 10), (101, 10), (64, 7)])
def test_ntile_from_rank_col_matches_spark_ntile(spark, n, tiles):
    # groups of uneven size: the 'xx' group has < tiles rows at n=23,
    # exercising the q == 0 branch per group
    df = _grouped_frame(spark, n)
    try:
        ranked = _grouped_row_number(
            df, ["g"], [F.asc("k"), F.asc("id")], alias="rn", n_alias="ng", ranges=8
        )
        ours = (
            ranked.select(
                "id", _ntile_from_rank_col(F.col("rn"), F.col("ng"), tiles).alias("b")
            )
            .toPandas()
            .set_index("id")["b"]
        )
        ref = (
            df.select(
                "id",
                F.ntile(tiles)
                .over(W.partitionBy("g").orderBy(F.asc("k"), F.asc("id")))
                .cast("long")
                .alias("b"),
            )
            .toPandas()
            .set_index("id")["b"]
        )
        assert ours.sort_index().tolist() == ref.sort_index().tolist()
    finally:
        release_persists()
