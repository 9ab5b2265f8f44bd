"""Stream-stream interval join: clicks joined to purchases of the same
user within a bounded time window — both sides watermarked so join
state is evictable (the unbounded-source requirement). The hardest
streaming feature Spark offers; staged here with deterministic
micro-batches."""

from __future__ import annotations

import shutil
import tempfile
import time
from datetime import datetime

import pyspark.sql.functions as F
import pytest


def _ts(m: int) -> datetime:
    return datetime(2024, 1, 1, 10, m)


@pytest.fixture()
def staged(spark):
    d = tempfile.mkdtemp(prefix="ss_join_")
    clicks = {
        "c0": [(1, 1, _ts(0)), (2, 2, _ts(1))],
        "c1": [(3, 1, _ts(30))],
    }
    purchases = {
        "p0": [(100, 1, _ts(5)), (101, 2, _ts(50))],  # 101 is 49min after click 2
        "p1": [(102, 1, _ts(35))],                     # 5min after click 3
    }
    for name, rows in clicks.items():
        spark.createDataFrame(rows, "click_id long, user_id long, cts timestamp").coalesce(
            1
        ).write.parquet(f"{d}/clicks/{name}.parquet")
        time.sleep(1.1)
    for name, rows in purchases.items():
        spark.createDataFrame(rows, "purch_id long, user_id long, pts timestamp").coalesce(
            1
        ).write.parquet(f"{d}/purchases/{name}.parquet")
        time.sleep(1.1)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_stream_stream_interval_join(spark, staged):
    clicks = (
        spark.readStream.schema("click_id long, user_id long, cts timestamp")
        .parquet(staged + "/clicks/*")
        .withWatermark("cts", "2 hours")
    )
    purchases = (
        spark.readStream.schema("purch_id long, user_id long, pts timestamp")
        .parquet(staged + "/purchases/*")
        .withWatermark("pts", "2 hours")
        .withColumnRenamed("user_id", "p_user_id")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select("click_id", "purch_id", "user_id")

    ckpt = tempfile.mkdtemp(prefix="ss_ckpt_")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)

    pairs = sorted(
        (r.click_id, r.purch_id) for r in spark.sql("SELECT * FROM ss_out").collect()
    )
    # click1@10:00 + purchase100@10:05 (5min) ✓
    # click2@10:01 + purchase101@10:50 (49min) ✗ outside 30min bound
    # click3@10:30 + purchase102@10:35 (5min) ✓
    # purchase100 also within 30min of nothing else
    assert pairs == [(1, 100), (3, 102)], pairs
