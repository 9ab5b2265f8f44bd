"""Estimator-quality pins for the deterministic sketch suite.

The oracle gate proves Spark ≡ DuckDB bit-for-bit; these tests prove
the sketches are *good estimators* — a property the differential check
can't see (both engines could agree on garbage).
"""

from __future__ import annotations

import pytest

from gresearch_parquet_benchmarking_spark.operators.sketches import (
    sketch_bloom_membership,
    sketch_countmin_freq,
    sketch_hll_distinct,
    sketch_kmv_distinct,
)

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def kmv_rows(spark):
    return {r["o_orderpriority"]: r for r in sketch_kmv_distinct(spark, SF_DIR).collect()}


def test_kmv_estimate_quality(kmv_rows):
    assert len(kmv_rows) == 5
    for grp, r in kmv_rows.items():
        exact = r["exact_distinct"]
        assert exact > 0
        if r["k_seen"] < 64:
            # fewer than k distinct hashes seen → the sketch IS exact
            assert r["est_distinct"] == float(r["k_seen"]) == float(exact)
        else:
            # KMV std error ≈ 1/sqrt(k-2) ≈ 13% at k=64; allow 4σ
            assert abs(r["est_distinct"] / exact - 1) < 0.52, (grp, r)


def test_hll_estimate_quality(spark):
    rows = sketch_hll_distinct(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        exact = r["exact_distinct"]
        # raw HLL std error ≈ 1.04/sqrt(64) = 13%; allow 4σ (no
        # small-range correction by design, so the band is generous)
        assert abs(r["est_distinct"] / exact - 1) < 0.52, r
        assert 0 < r["m_used"] <= 64


def test_bloom_no_false_negatives_and_sane_fp(spark):
    rows = sketch_bloom_membership(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        # Bloom filters never miss a member: every present key must hit
        assert r["n_hits"] >= r["n_present"], r
        assert r["n_false_pos"] == r["n_hits"] - r["n_present"], r
        assert 0 < r["bits_set"] <= 248
        # with n≈exact_distinct inserts into 248 bits and 2 hashes the
        # filter saturates at sf0.01 group sizes — just pin that the
        # audit columns are consistent and probes were non-trivial
        assert r["n_probed"] > 0 and r["n_present"] > 0


def test_countmin_one_sided_and_tight(spark):
    rows = sketch_countmin_freq(spark, SF_DIR).collect()
    assert len(rows) == 25  # TPC-H brand domain
    overshoot = 0
    for r in rows:
        # min-over-rows can only overestimate
        assert r["est_freq"] >= r["exact_freq"], r
        overshoot += r["est_freq"] - r["exact_freq"]
    # 25 keys in 3×256 cells: expected collision mass is tiny
    total = sum(r["exact_freq"] for r in rows)
    assert overshoot <= 0.2 * total


def test_rolling_hll_merge_equals_direct_window_sketch(spark):
    """Mergeability invariant: register-wise MAX of per-day registers
    over [d-2, d] must equal registers computed directly over the
    window's raw rows — so the estimate from merged sketches is THE
    sketch estimate, not an approximation of one."""
    import pyspark.sql.functions as F

    from conftest import SF_SMOKE
    from gresearch_parquet_benchmarking_spark.operators import sketches as sk
    from gresearch_parquet_benchmarking_spark.sources.events import load_events

    e = load_events(spark, SF_SMOKE).select(
        F.expr(f"ts_us div {sk._US_PER_DAY}").alias("day"),
        sk._h60(F.col("user_id")).alias("h"),
    )
    max_day = e.agg(F.max("day")).collect()[0][0]
    target = max_day  # the last full window
    rho = F.when(F.shiftright("h", 6) == 0, sk.HLL_RHO_MAX).otherwise(
        sk.HLL_RHO_MAX - F.length(F.bin(F.shiftright("h", 6)))
    )
    direct = (
        e.filter((F.col("day") >= target - sk.ROLL_DAYS + 1) & (F.col("day") <= target))
        .select((F.col("h") % sk.HLL_M).alias("reg"), rho.alias("rho"))
        .groupBy("reg").agg(F.max("rho").alias("rho"))
    )
    merged_row = (
        sk.sketch_hll_rolling_users(spark, SF_SMOKE)
        .filter(F.col("day") == target)
        .collect()[0]
    )
    s_direct = direct.agg(
        F.sum(F.expr(f"shiftleft(1L, {sk.HLL_RHO_MAX} - rho)")).cast("long")
    ).collect()[0][0]
    m_used = direct.count()
    assert merged_row.m_used == m_used
    assert merged_row.s_scaled == s_direct + (sk.HLL_M - m_used) * sk.HLL_POW_SCALE
