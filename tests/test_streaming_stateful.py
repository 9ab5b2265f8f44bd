"""Cross-micro-batch streaming dedup: duplicates arriving in LATER
batches must be dropped by state, not batch-local logic."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from gresearch_parquet_benchmarking_spark.streaming.stateful_dedup import streaming_dedup


@pytest.fixture()
def staged_batches(spark):
    """Three parquet files: batch0 originals, batch1 = dup of doc 0 +
    new doc, batch2 = dups of docs 0 and 1."""
    d = tempfile.mkdtemp(prefix="stream_dedup_")
    rows = {
        "b0": [(0, "alpha beta"), (1, "gamma delta")],
        "b1": [(2, "alpha beta"), (3, "epsilon zeta")],
        "b2": [(4, "alpha beta"), (5, "gamma delta")],
    }
    for name, data in rows.items():
        spark.createDataFrame(data, "doc_id long, text string").coalesce(1).write.parquet(
            f"{d}/{name}.parquet"
        )
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_dedup_across_batches(spark, staged_batches):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_batches + "/*")
    )
    out = streaming_dedup(stream)
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    rows = spark.sql("SELECT * FROM dedup_out").collect()
    # 3 distinct texts ever seen → exactly 3 emissions despite 6 inputs
    assert len(rows) == 3
    emitted_ids = sorted(r.doc_id for r in rows)
    # first occurrence wins: alpha(0 or later dup in same batch set),
    # gamma(1), epsilon(3). Multi-file trigger order follows file order.
    assert 3 in emitted_ids
    assert len(set(r.fingerprint for r in rows)) == 3


@pytest.fixture()
def staged_funnel_batches(spark):
    """Two time-ordered batches per user: batch0 views/clicks, batch1
    the purchases — stage state must carry across the batch boundary."""
    d = tempfile.mkdtemp(prefix="stream_funnel_")
    # (user_id, event_type, ts_us)
    rows = {
        "b0": [
            (1, "view", 100), (1, "click", 200),
            (2, "view", 150),
            (3, "click", 50),            # click with no view: never converts
        ],
        "b1": [
            (1, "purchase", 300),        # completes across the boundary
            (2, "click", 400),           # advances one stage
            (3, "purchase", 500),
        ],
    }
    for name, data in rows.items():
        spark.createDataFrame(
            data, "user_id long, event_type string, ts_us long"
        ).coalesce(1).write.parquet(f"{d}/{name}.parquet")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_funnel_state_across_batches(spark, staged_funnel_batches):
    from gresearch_parquet_benchmarking_spark.streaming.stateful_funnel import (
        streaming_funnel,
    )

    stream = (
        spark.readStream.schema("user_id long, event_type string, ts_us long")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged_funnel_batches + "/*")
    )
    out = streaming_funnel(stream)
    ckpt = tempfile.mkdtemp(prefix="ckpt_funnel_")
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("funnel_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    import pyspark.sql.functions as F

    final = (
        spark.table("funnel_out")
        .groupBy("user_id")
        .agg(F.max("v").alias("v"), F.max("c").alias("c"), F.max("p").alias("p"))
        .collect()
    )
    got = {r.user_id: (r.v, r.c, r.p) for r in final}
    # user 1: full funnel, purchase arrived one batch AFTER the click
    assert got[1] == (100, 200, 300)
    # user 2: view then click across batches, no purchase
    assert got[2] == (150, 400, None)
    # user 3: click before any view never counts
    assert got[3] == (None, None, None)
