"""Semantics tests for the round-6 data-quality suite, hard-negative
mining, and streaming trending top-k."""

from __future__ import annotations

import shutil

from conftest import SF_SMOKE

from gresearch_parquet_benchmarking_spark.operators.dataquality import (
    dq_constraint_suite,
)
from gresearch_parquet_benchmarking_spark.operators.registry import (
    release_persists,
)
from gresearch_parquet_benchmarking_spark.operators.similarity import (
    HARDNEG_K,
    N_QUERIES,
    ann_hard_negative_mining,
    ann_topk_bruteforce,
)
from gresearch_parquet_benchmarking_spark.streaming.trending import (
    TREND_TOP,
    stream_topk_trending,
)

EXPECTED_CHECKS = {
    "pk_unique",
    "status_domain",
    "price_positive",
    "qty_complete",
    "discount_range",
    "orderkey_ri",
    "props_format",
    "nchars_consistent",
}


def test_dq_suite_clean_data_all_pass(spark):
    out = dq_constraint_suite(spark, SF_SMOKE).toPandas()
    assert set(out.check_name) == EXPECTED_CHECKS
    assert bool(out.passed.all())
    assert (out.n_violations == 0).all()
    assert (out.n_rows > 0).all()


def test_dq_suite_catches_planted_violations(spark, tmp_path):
    """Corrupt a copy of the smoke data: an orphan lineitem, a bad
    status, a negative price, a wrong n_chars, a bad props payload —
    each constraint must count exactly the planted violations."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    d = tmp_path / "corrupt"
    d.mkdir()
    for t in ("orders", "lineitem", "events", "documents"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")

    # orders: duplicate a PK, break one status, one non-positive price
    o = pq.read_table(d / "orders.parquet").to_pandas()
    o.loc[1, "o_orderkey"] = o.loc[0, "o_orderkey"]  # dup PK
    o.loc[2, "o_orderstatus"] = "X"
    o.loc[3, "o_totalprice"] = -5.0
    pq.write_table(pa.Table.from_pandas(o, preserve_index=False), d / "orders.parquet")

    # lineitem: one orphan key, one out-of-range discount, one null qty
    l = pq.read_table(d / "lineitem.parquet").to_pandas()
    l.loc[0, "l_orderkey"] = 10**12  # orphan
    l.loc[1, "l_discount"] = 1.5
    l.loc[2, "l_quantity"] = None
    pq.write_table(pa.Table.from_pandas(l, preserve_index=False), d / "lineitem.parquet")

    # documents: one inconsistent n_chars
    doc = pq.read_table(d / "documents.parquet").to_pandas()
    doc.loc[0, "n_chars"] = doc.loc[0, "n_chars"] + 7
    pq.write_table(pa.Table.from_pandas(doc, preserve_index=False), d / "documents.parquet")

    # events: one malformed props
    e = pq.read_table(d / "events.parquet")
    ep = e.to_pandas()
    ep.loc[0, "props"] = "not json"
    pq.write_table(
        pa.Table.from_pandas(ep, preserve_index=False).cast(e.schema),
        d / "events.parquet",
    )

    got = {
        r.check_name: r
        for r in dq_constraint_suite(spark, str(d)).collect()
    }
    assert got["pk_unique"].n_violations == 1 and not got["pk_unique"].passed
    assert got["status_domain"].n_violations == 1
    assert got["price_positive"].n_violations == 1
    # 1 planted orphan + the lineitems of the order whose key the
    # duplicated PK overwrote (they lost their parent)
    assert got["orderkey_ri"].n_violations >= 1 and not got["orderkey_ri"].passed
    assert got["discount_range"].n_violations == 1
    assert got["qty_complete"].n_violations == 1
    assert got["nchars_consistent"].n_violations == 1
    assert got["props_format"].n_violations == 1


def test_hard_negatives_exclude_query_label(spark):
    out = ann_hard_negative_mining(spark, SF_SMOKE).toPandas()
    release_persists()
    assert (out.query_label != out.neighbor_label).all()
    assert out.query_id.nunique() == N_QUERIES
    for _, grp in out.groupby("query_id"):
        assert list(grp["rank"]) == list(range(1, HARDNEG_K + 1))
    # a hard negative can never beat the unrestricted top-1
    bf = ann_topk_bruteforce(spark, SF_SMOKE).toPandas()
    release_persists()
    top1 = bf[bf["rank"] == 1].set_index("query_id").cos
    hn1 = out[out["rank"] == 1].set_index("query_id").cos
    assert (hn1 <= top1 + 1e-9).all()


def test_trending_topk_shares_and_ranks(spark):
    out = stream_topk_trending(spark, SF_SMOKE).toPandas()
    assert len(out) > 0
    assert (out.share > 0).all() and (out.share <= 1.0).all()
    for _, grp in out.groupby("window_start_us"):
        assert len(grp) <= TREND_TOP
        assert list(grp.rnk) == list(range(1, len(grp) + 1))
        # counts non-increasing with rank; top-3 shares sum <= 1
        assert all(a >= b for a, b in zip(grp.n, grp.n[1:]))
        assert grp.share.sum() <= 1.0 + 1e-9
    # windows are 6h-aligned
    assert (out.window_start_us % (6 * 3600 * 1_000_000) == 0).all()
