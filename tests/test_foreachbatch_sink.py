"""foreachBatch exactly-once parquet sink: per-epoch idempotent writes
(the pattern for transactional sinks Spark lacks natively)."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest


@pytest.fixture()
def dirs():
    src = tempfile.mkdtemp(prefix="feb_src_")
    out = tempfile.mkdtemp(prefix="feb_out_")
    ckpt = tempfile.mkdtemp(prefix="feb_ckpt_")
    yield src, out, ckpt
    for d in (src, out, ckpt):
        shutil.rmtree(d, ignore_errors=True)


def test_foreachbatch_epoch_partitioned_sink(spark, dirs):
    src, out, ckpt = dirs
    for i in range(3):
        spark.createDataFrame(
            [(i * 10 + j, float(j)) for j in range(5)], "id long, v double"
        ).coalesce(1).write.parquet(f"{src}/b{i}.parquet")

    def write_epoch(df, epoch_id: int) -> None:
        # epoch-id-addressed output: reprocessing an epoch overwrites
        # its own directory instead of duplicating rows (exactly-once
        # on top of an at-least-once trigger)
        df.write.mode("overwrite").parquet(f"{out}/epoch={epoch_id}")

    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    q = (
        stream.writeStream.foreachBatch(write_epoch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()

    epochs = sorted(e for e in os.listdir(out) if e.startswith("epoch="))
    assert len(epochs) == 3, epochs
    total = spark.read.parquet(out).count()
    assert total == 15
    # partition pruning by epoch works on the sink layout
    one = spark.read.parquet(out).where("epoch = 1").count()
    assert one == 5
