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
