"""Focused pins for the r12 optimization-round rewrites — properties
the oracle gate can't see (it only proves Spark == DuckDB on the
shipped constants, not that the rewrites' internal invariants hold).

* lineitem_weighted_median_price: the two-pass prefix sum must be
  RANGE-COUNT-INVARIANT — decimal offsets + local prefixes compose to
  the identical cumulative sum for ANY WMEDIAN_RANGES ≥ 1 (the
  associativity claim the graduation rests on).
* graph._copurchase_pairs: the in-row expansion must produce exactly
  the pair set of the lineitem⋈lineitem self-join it replaced.
* basket_part_affinity's pair expansion: per-order C(n,2) pair COUNTS
  (not just the set) must match the self-join, including multi-order
  multiplicity.
"""

from __future__ import annotations

from conftest import SF_SMOKE

from pyspark.sql import functions as F

from gresearch_parquet_benchmarking_spark.operators import analytics2
from gresearch_parquet_benchmarking_spark.operators.analytics import (
    basket_part_affinity,
)
from gresearch_parquet_benchmarking_spark.operators.graph import _copurchase_pairs
from gresearch_parquet_benchmarking_spark.operators.registry import release_persists


def test_weighted_median_range_count_invariant(spark, monkeypatch):
    """Output is identical at WMEDIAN_RANGES=1 (single range ≡ the old
    single-window prefix) and the shipped 32 — pins the decimal
    offset-composition equivalence on real data."""
    try:
        rows32 = analytics2.lineitem_weighted_median_price(
            spark, SF_SMOKE
        ).collect()
        release_persists()
        monkeypatch.setattr(analytics2, "WMEDIAN_RANGES", 1)
        rows1 = analytics2.lineitem_weighted_median_price(
            spark, SF_SMOKE
        ).collect()
    finally:
        release_persists()
    assert [r.asDict() for r in rows32] == [r.asDict() for r in rows1]
    assert len(rows32) > 0


def test_copurchase_pairs_match_self_join(spark):
    """In-row expansion ≡ the replaced self-join, on real data."""
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    got = {(r.u, r.v) for r in _copurchase_pairs(li).collect()}
    b = li.select(F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2"))
    want = {
        (r.u, r.v)
        for r in li.join(b, (li.l_orderkey == b.o2) & (li.l_partkey < b.p2))
        .select(F.col("l_partkey").alias("u"), F.col("p2").alias("v"))
        .distinct()
        .collect()
    }
    assert got == want and len(got) > 0
    assert all(u < v for u, v in got)


def test_basket_pair_counts_match_self_join(spark, tmp_path):
    """Planted baskets with shared pairs across orders: the in-row
    expansion must count multiplicity exactly like the old self-join
    (pair {1,2} in 3 orders → n_ab=3 survives MIN_SUPPORT=3; pair
    {1,3} in 2 orders is filtered; duplicate line items within an
    order must NOT inflate counts)."""
    rows = [
        # order 1: parts 1,2,3 (+ dup of part 1)
        (1, 1), (1, 1), (1, 2), (1, 3),
        # order 2: parts 1,2,3
        (2, 1), (2, 2), (2, 3),
        # order 3: parts 1,2
        (3, 1), (3, 2),
    ]
    d = tmp_path / "basket"
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(d / "lineitem.parquet")
    )
    try:
        out = {
            (r.part_a, r.part_b): r.n_ab
            for r in basket_part_affinity(spark, str(d)).collect()
        }
    finally:
        release_persists()
    assert out == {(1, 2): 3}  # {1,3},{2,3} appear twice -> filtered at 3
