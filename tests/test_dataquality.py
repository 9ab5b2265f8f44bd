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


def test_mad_anomaly_flags_planted_spike(spark, tmp_path):
    """A 14-day constant series plus one 20x spike day: the spike gets
    |modified z| > 3.5 and the flag; constant days score ~0. A fully
    constant series (second type) has MAD=0 -> NULL score, FALSE flag."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gresearch_parquet_benchmarking_spark.operators.pipeline2 import (
        events_daily_anomaly_mad,
    )

    rows = []
    eid = 0
    for day in range(14):
        # varied baseline (10..14): a constant one would make MAD
        # itself 0 (>50% identical residuals) and NULL the spike score
        n = 200 if day == 7 else 10 + day % 5
        for i in range(n):
            rows.append((eid, pd.Timestamp(2024, 1, 1 + day, 12, 0, i % 60),
                         eid % 5, "view", 1.0, '{"k": 1}'))
            eid += 1
        # constant control series: 3 events every day
        for i in range(3):
            rows.append((eid, pd.Timestamp(2024, 1, 1 + day, 13, 0, i),
                         eid % 5, "click", 1.0, '{"k": 1}'))
            eid += 1
    df = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = tmp_path / "madspike"
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d / "events.parquet")

    out = events_daily_anomaly_mad(spark, str(d)).toPandas()
    release_persists()
    views = out[out.event_type == "view"].set_index("day")
    assert bool(views.loc["2024-01-08", "is_outlier"])
    assert abs(views.loc["2024-01-08", "robust_z"]) > 3.5
    normal = views.drop(index="2024-01-08")
    assert (~normal.is_outlier).all()
    clicks = out[out.event_type == "click"]
    assert clicks.robust_z.isna().all()      # MAD = 0 -> NULL score
    assert (~clicks.is_outlier).all()        # and never flagged


def _write_docs(tmp_path, name, lengths_a, lengths_b):
    """documents.parquet with n_chars = lengths_a on even doc_ids,
    lengths_b on odd (the drift pair's two halves)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = []
    for i, n in enumerate(lengths_a):
        rows.append((2 * i, "x" * int(n), "en", "src0", int(n)))
    for i, n in enumerate(lengths_b):
        rows.append((2 * i + 1, "x" * int(n), "en", "src0", int(n)))
    df = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = tmp_path / name
    d.mkdir()
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), d / "documents.parquet")
    return str(d)


def test_drift_null_calibration_same_distribution(spark, tmp_path):
    from gresearch_parquet_benchmarking_spark.operators.drift import (
        drift_ks_doc_length,
        drift_psi_doc_length,
    )

    lengths = [50 + (i * 37) % 400 for i in range(300)]
    d = _write_docs(tmp_path, "same", lengths, lengths)
    ks = drift_ks_doc_length(spark, d).collect()[0]
    assert ks.ks_stat == 0.0 and not ks.drift_detected
    psi = drift_psi_doc_length(spark, d).collect()[0]
    assert psi.psi == 0.0 and not psi.drift_detected


def test_drift_detects_planted_shift(spark, tmp_path):
    from gresearch_parquet_benchmarking_spark.operators.drift import (
        drift_ks_doc_length,
        drift_psi_doc_length,
    )

    base = [50 + (i * 37) % 400 for i in range(300)]
    shifted = [n + 500 for n in base]  # wholesale location shift
    d = _write_docs(tmp_path, "shifted", base, shifted)
    ks = drift_ks_doc_length(spark, d).collect()[0]
    assert ks.drift_detected and ks.ks_stat == 1.0  # disjoint supports
    psi = drift_psi_doc_length(spark, d).collect()[0]
    assert psi.drift_detected and psi.psi > 0.2


def test_drift_real_corpus_halves_do_not_drift(spark):
    from gresearch_parquet_benchmarking_spark.operators.drift import (
        drift_ks_doc_length,
    )

    row = drift_ks_doc_length(spark, SF_SMOKE).collect()[0]
    # even/odd halves of one generator are exchangeable
    assert not row.drift_detected
    assert row.n_a + row.n_b > 0


def test_stream_psi_null_calibration(spark):
    """Event values are time-stationary in the generator, so no window
    should PSI-drift against the full-history reference; PSI itself is
    non-negative by construction ((q-p)ln(q/p) >= 0 per term)."""
    from gresearch_parquet_benchmarking_spark.streaming.trending import (
        stream_psi_value_drift,
    )

    out = stream_psi_value_drift(spark, SF_SMOKE).toPandas()
    release_persists()
    assert len(out) > 0
    assert (out.psi >= 0).all()
    # sf0.001 windows hold a handful of events each: every one must be
    # caught by the minimum-sample guard, and a gated window can never
    # flag drift regardless of its (floor-inflated) PSI
    assert (~out.drift_detected[out.low_sample]).all()
    assert (~out.drift_detected).all()
    assert (out.n_events > 0).all()
    assert (out.window_start_us % (6 * 3600 * 1_000_000) == 0).all()
