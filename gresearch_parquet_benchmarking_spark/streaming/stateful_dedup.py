"""Custom stateful streaming operator: exact dedup across micro-batches.

The streaming face of operators/dedup.py — an unbounded corpus where
"have I seen this content?" must survive batch boundaries. Implemented
with applyInPandasWithState (Spark's arbitrary-stateful-processing
API): state is keyed by the content fingerprint; the first arrival
emits, every later arrival (same batch or any later batch) is dropped.

Scale: state is ONE boolean per distinct fingerprint, partitioned by
the fingerprint hash across executors — the same sharding a 100 TB
streaming dedup needs; RocksDB state store handles spill
(spark.sql.streaming.stateStore.providerClass) when the key space
outgrows memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "fingerprint string, doc_id long, first_seen_batch boolean"
STATE_SCHEMA = "seen boolean"


def _dedup_group(
    key: tuple,
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit the first row for an unseen fingerprint; drop the rest."""
    if state.exists:
        # fingerprint already emitted in an earlier batch
        for _ in batches:
            pass
        return
    # Scan EVERY chunk: a key's rows can span multiple Arrow chunks in
    # one micro-batch, and the min doc_id may arrive in a later chunk.
    # (plain column min, not nsmallest — this function runs once per
    # DISTINCT FINGERPRINT per batch, so per-call cost is the whole
    # operator's cost; guide §4.2)
    first_id = None
    for pdf in batches:
        if len(pdf):
            m = int(pdf["doc_id"].min())
            if first_id is None or m < first_id:
                first_id = m
    if first_id is not None:
        state.update((True,))
        yield pd.DataFrame(
            {
                "fingerprint": [key[0]],
                "doc_id": [first_id],
                "first_seen_batch": [True],
            }
        )


def streaming_dedup(stream: DataFrame) -> DataFrame:
    """stream must have (doc_id long, text string). Keyed by md5(text);
    appends one row per distinct content fingerprint, ever."""
    keyed = stream.select("doc_id", F.md5("text").alias("fingerprint"))
    return keyed.groupBy("fingerprint").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
