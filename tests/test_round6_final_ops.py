"""Semantic property pins for the final round-6 operator batch.

The oracle gate proves Spark ≡ DuckDB; these tests pin the properties
the operators CLAIM about themselves, which an oracle that merely
agrees with an identically-wrong twin could not catch:

* the histogram sketch's one-bin error bound actually holds,
* the perceptual hash actually CATCHES the planted case/whitespace
  variants (both engines finding zero dups would hash-match too),
* RA link prediction emits a correctly-ordered non-edge ranking,
* the concurrency sweep's boundaries balance (+1/−1 pairs),
* int8 quantization at 255 levels retains cosine ≈ 1,
* Benford shares form a probability distribution.
"""

from __future__ import annotations

import pytest

from gresearch_parquet_benchmarking_spark.operators.registry import (
    all_queries,
    release_persists,
)

from conftest import SF_SMOKE


@pytest.fixture(autouse=True)
def _release():
    yield
    release_persists()


def _rows(spark, name):
    return all_queries()[name](spark, SF_SMOKE).collect()


def test_quantile_histogram_bound_holds(spark):
    rows = _rows(spark, "sketch_quantile_histogram")
    assert [r.q_pct for r in rows] == [50, 90, 99]
    for r in rows:
        # the one-bin-width guarantee the sketch is built on
        assert r.within_bound, r
        assert abs(r.est_cents - r.exact_cents) <= r.bin_width_cents
        assert r.n_rows > 0


def test_spark_built_wav_parses_with_stdlib_wave(spark):
    """Real-world container pin (r12): the audio payloads the Spark
    builder emits are genuine RIFF/WAVE PCM files — Python's stdlib
    ``wave`` reader (a THIRD-PARTY parser sharing no code with
    multimodal.parse_container) must open every one and agree on the
    PCM profile and sample count the header declares."""
    import io
    import wave

    from gresearch_parquet_benchmarking_spark.operators.multimodal import (
        KIND_AUDIO,
        attach_binary_payload,
    )
    from gresearch_parquet_benchmarking_spark.sources.tables import load_table

    doc = load_table(spark, SF_SMOKE, "documents")
    rows = (
        attach_binary_payload(doc)
        .filter("meta.kind = '%s'" % KIND_AUDIO)
        .select("doc_id", "payload")
        .limit(50)
        .collect()
    )
    assert rows, "no audio assets at the smoke SF"
    for r in rows:
        with wave.open(io.BytesIO(bytes(r.payload))) as w:
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 1  # 8-bit
            assert w.getcomptype() == "NONE"  # PCM
            n = len(bytes(r.payload)) - 44
            assert w.getnframes() == n
            assert w.getframerate() == 8000 + (n % 8) * 1000
            assert len(w.readframes(n)) == n


def test_multimodal_phash_catches_planted_variants(spark):
    rows = _rows(spark, "dedup_multimodal_phash")
    assert {r.kind for r in rows} == {"image/ppm", "audio/wav", "video/mvid"}
    # every 25th doc is planted as a case/whitespace variant — the
    # perceptual hash must see duplicates the exact byte hash misses
    assert sum(r.n_dup_groups for r in rows) > 0
    for r in rows:
        assert r.n_dup_assets == r.n_assets - r.n_distinct_phash


def test_link_prediction_ranking_properties(spark):
    rows = _rows(spark, "graph_link_prediction_ra")
    assert rows, "candidate non-edges must exist"
    scores = [r.ra_score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.n_common >= 1 and r.u < r.v


def test_peak_concurrency_boundaries_balance(spark):
    rows = _rows(spark, "events_peak_concurrency")
    assert rows
    for r in rows:
        assert r.peak_concurrency >= 1
        # each day's sweep sees its segments' paired +1/−1 boundaries
        assert r.n_boundaries == 2 * r.n_session_segments


def test_int8_quant_retains_cosine(spark):
    (row,) = _rows(spark, "embedding_int8_quant_error")
    assert row.n_vecs > 0
    assert row.mean_cos > 0.999  # 255 levels on 64-d: near-lossless
    assert row.worst_cos > 0.99
    assert row.mean_mse >= 0


def test_benford_shares_form_distribution(spark):
    rows = _rows(spark, "dq_benford_order_prices")
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-6
    # benford_p values are rounded to 9 dp in the result, so their sum
    # can miss 1.0 by up to 9 half-ulps of the rounding grid
    assert abs(sum(r.benford_p for r in rows) - 1.0) < 1e-8


def test_twap_weights_positive(spark):
    rows = _rows(spark, "events_value_twap_daily")
    assert rows
    for r in rows:
        assert r.covered_us > 0 and r.n_obs > 0


def test_bot_screen_catches_planted_scripted_user(spark):
    rows = {r.rule: r for r in _rows(spark, "events_bot_screen")}
    assert set(rows) == {
        "volume_gt_3.0x_mean",
        "single_event_type",
        "metronomic_cv_lt_0.5",
        "any_rule",
    }
    # the planted metronomic single-type click loop must trip every rule
    for r in rows.values():
        assert r.n_flagged >= 1, r
    assert rows["any_rule"].n_flagged <= sum(
        rows[k].n_flagged for k in rows if k != "any_rule"
    )


def test_stickiness_bounded_by_window(spark):
    rows = _rows(spark, "events_stickiness_dau_wau")
    assert rows
    for r in rows:
        assert r.wau >= r.dau >= 1
        assert 0 < r.stickiness <= 1.0


def test_binary_hamming_recall_table_shape(spark):
    rows = _rows(spark, "ann_binary_hamming_recall")
    assert len(rows) == 10  # one per query vector
    for r in rows:
        assert r.n_true == 5 and 0 <= r.n_hits <= 5
        assert 0.0 <= r.recall <= 1.0


def test_ab_ztest_null_experiment_calibrated(spark):
    (row,) = _rows(spark, "events_ab_uplift_ztest")
    assert row.n0 + row.n1 > 0 and row.c0 <= row.n0 and row.c1 <= row.n1
    # salted hash should split users roughly evenly
    assert abs(row.n0 - row.n1) < 0.5 * (row.n0 + row.n1)
    # organic data carries no treatment: |z| should be finite and the
    # uplift tiny relative to the rates (calibration, not significance)
    assert row.z_stat is None or abs(row.z_stat) < 10
