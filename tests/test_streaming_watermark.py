"""Watermark semantics in append mode, staged with ordered
micro-batches (maxFilesPerTrigger=1 preserves file order):

* a window emits exactly once, when the watermark passes its end;
* a late row arriving AFTER its window was finalized/evicted is
  dropped — no recount, no re-emission.

(Empirically pinned nuance: a late row landing in the SAME micro-batch
where the watermark first crosses its window end still merges into the
final emission — eviction happens at end-of-batch, after input merge.
The test stages the late row strictly after finalization.)
"""

from __future__ import annotations

import shutil
import tempfile
import time
from datetime import datetime

import pyspark.sql.functions as F
import pytest


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m)


@pytest.fixture()
def staged(spark):
    d = tempfile.mkdtemp(prefix="stream_wm_")
    batches = {
        "b0": [(1, _ts(10, 5), 1.0), (2, _ts(11, 5), 1.0)],  # hours 10, 11
        "b1": [(3, _ts(14, 5), 1.0)],   # event time jumps → wm will pass 11:00
        "b2": [(5, _ts(14, 10), 1.0)],  # extra batch: windows 10/11 emit+evict
        "b3": [(4, _ts(10, 30), 1.0)],  # LATE row, window already evicted
        "b4": [(6, _ts(14, 20), 1.0)],  # keeps the stream moving
    }
    for name, rows in batches.items():
        spark.createDataFrame(rows, "event_id long, ts timestamp, value double").coalesce(
            1
        ).write.parquet(f"{d}/{name}.parquet")
        time.sleep(1.1)  # distinct mtimes → deterministic batch order
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_append_mode_drops_late_rows(spark, staged):
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged + "/*")
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    ckpt = tempfile.mkdtemp(prefix="ckpt_wm_")
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    emitted = spark.sql("SELECT window.start AS start, n FROM wm_out").collect()
    by_hour: dict[int, list[int]] = {}
    for r in emitted:
        by_hour.setdefault(r.start.hour, []).append(r.n)
    # each closed window emitted exactly once, with only its on-time row;
    # the batch-b3 latecomer for hour 10 was dropped by the watermark
    assert by_hour[10] == [1], by_hour
    assert by_hour[11] == [1], by_hour


def test_late_filter_uses_previous_batch_watermark(spark):
    """CANARY for a Spark behavior stream_late_data_audit's replay
    choreography depends on (empirically pinned in round 6): the late
    filter applies the watermark COMMITTED ONE BATCH EARLIER than the
    progress line reports. A late row arriving in the very next batch
    after the bulk is NOT yet dropped; one arriving a batch later is.
    If a Spark upgrade changes this (e.g. same-batch watermark
    application), this test fails and the gap-batch staging in
    streaming/events_stream.py must be revisited."""
    import pyspark.sql.functions as F

    d = tempfile.mkdtemp(prefix="wm_lag_")
    S = 1_000_000
    H = 3600 * S
    try:
        # bulk at hours 10/20; two late files, both at hour ~0
        for name, rows in (
            ("a", [(1, 10 * H), (2, 20 * H)]),
            ("b1", [(3, 0)]),          # first post-bulk batch: NOT dropped
            ("b2", [(4, 1 * S)]),      # second: dropped
            ("c", [(-1, 4_102_444_800 * S)]),  # sentinel flushes windows
        ):
            spark.createDataFrame(
                rows, "user_id long, ts_us long"
            ).coalesce(1).write.parquet(f"{d}/{name}.parquet")
        stream = (
            spark.readStream.schema("user_id long, ts_us long")
            .option("maxFilesPerTrigger", "1")
            .parquet(d + "/*")
            .withColumn("ts_ts", F.timestamp_micros(F.col("ts_us")))
        )
        agg = (
            stream.withWatermark("ts_ts", "30 minutes")
            .groupBy(F.window("ts_ts", "1 hour"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        ckpt = tempfile.mkdtemp(prefix="ckpt_wmlag_")
        q = (
            agg.writeStream.outputMode("append")
            .format("memory")
            .queryName("wm_lag_out")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            q.stop()
            shutil.rmtree(ckpt, ignore_errors=True)
        hour0 = (
            spark.sql("SELECT n FROM wm_lag_out WHERE window.start = timestamp_micros(0)")
            .collect()
        )
        # b1's row survived (filter still armed with the pre-bulk
        # watermark); b2's row was dropped (filter armed with the
        # post-bulk watermark) — so hour 0 holds exactly ONE row
        assert [r.n for r in hour0] == [1]
    finally:
        shutil.rmtree(d, ignore_errors=True)
